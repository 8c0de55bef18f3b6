package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental per-scope statistics maintenance — the operational payoff
  * of the mergeable-register family in one frame: counts, sums, an HLL
  * distinct-entity sketch, and a fixed-bin value histogram per group, all
  * of which MERGE (add / add / register-max / bin-sum). Maintain
  * yesterday's sketch frame, sketch only today's DELTA, `merge` the two —
  * updated counts, distinct estimates, and quantiles for every scope
  * without rescanning history. At 100 TB "recompute from scratch nightly"
  * is the cost center this kills; the merged state is BIT-IDENTICAL to
  * sketching the union (each register family's linearity/idempotence),
  * so estimates replay exactly wherever the merge happens.
  *
  * State per group: 2 longs + 2^p ints + numBins longs — constant,
  * independent of group size. Build is one partial-aggregated groupBy
  * (plus the histogram's bounded per-(group, bin) prepass); merge is
  * a groupBy over sketch ROWS (≤ #groups × #deltas of them).
  */
class MergeableStats(
    valueCol: String,
    entityCol: String,
    p: Int = 10,
    hist: HistogramSketch) {

  /** (groupCol, n, sum_v, regs, hist): one mergeable state row per group. */
  def sketch(df: DataFrame, groupCol: String): DataFrame = {
    val h = hist.sketch(df, groupCol, valueCol)
      .withColumnRenamed(groupCol, "__hg")
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("double")).as("sum_v"),
        functions.hllSketch(col(entityCol).cast("string"), p).as("regs"))
      .join(h, col(groupCol) <=> col("__hg"))
      .drop("__hg")
  }

  /** Merge any number of [[sketch]] frames (unioned) back to one state
    * row per group: counts/sums add, HLL registers max, histogram bins
    * sum. */
  def merge(sketches: DataFrame, groupCol: String): DataFrame =
    sketches.groupBy(col(groupCol))
      .agg(sum(col("n")).as("n"),
        sum(col("sum_v")).as("sum_v"),
        functions.hllMerge(col("regs"), p).as("regs"),
        hist.merge(col("hist")).as("hist"))

  /** Human-readable report from a state frame: row count, value sum,
    * distinct-entity estimate, and interpolated quantiles. */
  def report(state: DataFrame, groupCol: String): DataFrame =
    state.select(col(groupCol), col("n"),
      round(col("sum_v"), 6).as("sum_v"),
      round(functions.hllEstimate(col("regs"), p), 6).as("est_entities"),
      round(hist.quantile(col("hist"), 0.5), 9).as("p50"),
      round(hist.quantile(col("hist"), 0.9), 9).as("p90"))
}
