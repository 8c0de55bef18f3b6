package graft.sql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable fixed-bin histogram sketch with quantile estimation — the
  * quantile member of the engine's mergeable-register family (HLL
  * max-merge for distincts, CMS sum-merge for frequencies, MinHash
  * min-merge for resemblance, bottom-k rank-merge for samples): per-scope
  * value distributions as a fixed ARRAY&lt;LONG&gt; of bin counts that SUM
  * across scopes, so per-partition/day/source histograms roll up to any
  * coarser scope — and answer p50/p90/p99 there — without rescanning rows.
  *
  * This is the always-mergeable counterpoint to the exact/KLL percentile
  * policy ([[graft.feature.Percentiles]]): exact percentiles need the
  * values, `percentile_approx` sketches aren't exposed as mergeable
  * columns, but a histogram over FIXED bounds is linear — merged counts
  * are bit-identical to histogramming the union, so estimates replay
  * exactly wherever the merge happens. The price is resolution: estimates
  * interpolate uniformly inside a bin, so the error bound is binWidth
  * (choose bounds/bins for the column's scale; out-of-range values clamp
  * into the edge bins, a deliberate "the tails saturate" contract).
  *
  * Scale: build is one row-local bin assignment + a partial-aggregated
  * groupBy per (scope, bin) + a bounded per-scope array fold (≤ numBins
  * pairs); merge and estimate are row-local array arithmetic. Never a
  * sort, never a window, never per-value state.
  */
class HistogramSketch(lo: Double, hi: Double, numBins: Int) {
  require(hi > lo, s"need hi > lo, got [$lo, $hi]")
  require(numBins > 1 && numBins <= 4096, s"numBins ($numBins) must be in (1, 4096]")

  private val width = (hi - lo) / numBins

  /** Row-local bin index for a value: floor((v−lo)/width) clamped to
    * [0, numBins). */
  def bin(v: Column): Column =
    greatest(lit(0), least(lit(numBins - 1),
      floor((v.cast("double") - lit(lo)) / lit(width)).cast("int")))

  /** One histogram ARRAY&lt;LONG&gt;[numBins] per group. */
  def sketch(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.groupBy(col(groupCol), bin(col(valueCol)).as("__b"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(groupCol))
      .agg(HistogramSketch.fromPairs(
        collect_list(struct(col("__b"), col("__c"))), numBins).as("hist"))

  /** Merge aggregate over a group's histogram arrays: element-wise sum
    * (same linearity as [[functions.cmsMerge]]). */
  def merge(hist: Column): Column =
    aggregate(collect_list(hist),
      array_repeat(lit(0L), numBins),
      (acc, x) => zip_with(acc, x, (a, b) => a + b))

  /** Quantile estimate from a histogram array: find the bin where the
    * cumulative count crosses `p · total`, interpolate linearly inside it.
    * Pure fold over the array (codegen-friendly, no explode), replayable
    * closed-form by the SQL oracle. p=0 returns the lower edge of the
    * first occupied bin; an all-empty histogram returns NULL.
    */
  def quantile(hist: Column, p: Double): Column = {
    require(0.0 <= p && p <= 1.0, s"p ($p) must be in [0, 1]")
    val total = aggregate(hist, lit(0L), (a, c) => a + c).cast("double")
    val target = lit(p) * total
    val st0 = struct(lit(0).as("i"), lit(0.0d).as("cum"),
      lit(null).cast("double").as("est"))
    val folded = aggregate(hist, st0,
      (st, c) => {
        val cd = c.cast("double")
        val hit = st.getField("est").isNull && cd > 0 &&
          (st.getField("cum") + cd) >= target
        val frac = greatest(lit(0.0d), target - st.getField("cum")) / cd
        struct(
          (st.getField("i") + 1).as("i"),
          (st.getField("cum") + cd).as("cum"),
          when(hit, lit(lo) + (st.getField("i").cast("double") + frac) * lit(width))
            .otherwise(st.getField("est")).as("est"))
      },
      st => when(total > 0, st.getField("est")))
    folded
  }
}

object HistogramSketch {
  /** Fold (bin, cnt) pairs into a dense count array — row-local, bounded
    * by numBins entries per group. */
  private[sql] def fromPairs(pairs: Column, numBins: Int): Column =
    aggregate(pairs,
      array_repeat(lit(0L), numBins),
      (acc, pr) => zip_with(acc, sequence(lit(0), lit(numBins - 1)),
        (c, i) => when(i === pr.getField("__b"), c + pr.getField("__c")).otherwise(c)))
}
