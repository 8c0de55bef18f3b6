package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT type-1 quantiles (rank `ceil(q·n)`, the inverse-CDF element —
  * DuckDB's `quantile_disc`, Postgres' `percentile_disc`) of a numeric
  * column at any scale WITHOUT a global sort: iterative histogram
  * narrowing (distributed selection — the classic two-phase trick, e.g.
  * Munro-Paterson/BigQuery-style). Where the sketch family
  * ([[graft.sql.HistogramSketch]], `QuantileStream`) trades accuracy for
  * one pass, this trades a few passes for EXACTNESS: the answer is an
  * actual element of the column, so an oracle needs no estimator replay
  * at all — `quantile_disc` must return the identical value.
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * == How it narrows ==
  *
  * Pass 0 aggregates global (n, min, max). Each level then counts, in ONE
  * partial-aggregated scan shared by ALL still-active quantiles,
  * `numBuckets` conditional-count columns per quantile over that
  * quantile's current bracket [lo, hi]; the driver walks the (bounded:
  * qs × numBuckets longs) histogram row, finds the bucket containing the
  * remaining rank, and recurses into it. A quantile finishes when its
  * bracket collapses to one point (all-duplicate bucket) or its bucket
  * count ≤ `maxFinal`; ONE final pass then selects every open
  * quantile's k-th smallest at once via per-quantile conditional sorted
  * collects of ≤ `maxFinal` rows each (bounded qs × maxFinal driver
  * state — the same bound the previous per-quantile sort-limit jobs
  * carried, minus the one-scan-per-quantile job fan). Levels are
  * capped loudly.
  *
  * == Scale shape ==
  *
  * (2 + levels) full scans, each a map-side-combined aggregation with
  * qs × numBuckets longs of state — no shuffle wider than one row, no
  * global sort, nothing driver-side beyond the bounded histogram. Each
  * level divides the candidate bucket's population by ~numBuckets (64³ ≈
  * 260k-way reduction in three levels), so 100 TB reaches `maxFinal` in
  * 3-4 levels even before duplicates collapse brackets. Skew is
  * irrelevant: buckets partition the VALUE axis, not rows, and the
  * histogram state never grows with data.
  *
  * Nulls and NaN are not observations (the QuantileStream discipline;
  * `quantile_disc` likewise ignores NULLs).
  */
object ExactQuantile {

  /** One (q → exact value) per requested quantile; None for all qs when
    * the (non-null, non-NaN) column is empty.
    */
  def compute(
      df: DataFrame,
      valueCol: String,
      qs: Seq[Double],
      numBuckets: Int = 64,
      maxFinal: Long = 100000L,
      maxLevels: Int = 16): Map[Double, Option[Double]] = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles ($qs) must each lie in (0, 1]")
    require(qs.distinct.size == qs.size, s"duplicate quantiles in $qs")
    require(numBuckets >= 2, s"numBuckets ($numBuckets) must be >= 2")
    require(maxFinal >= 1L && maxFinal <= Int.MaxValue.toLong,
      s"maxFinal ($maxFinal) must be in [1, Int.MaxValue] — the final " +
        "selection is a sort-limit and limit() takes an Int")
    require(maxLevels >= 1, s"maxLevels ($maxLevels) must be >= 1")

    val v = col(valueCol).cast("double")
    val vals = df.select(v.as("__v")).where(col("__v").isNotNull && !isnan(col("__v")))
    val head = vals.agg(count(lit(1)).as("n"), min(col("__v")).as("lo"),
      max(col("__v")).as("hi")).head()
    val n = head.getLong(0)
    if (n == 0L) return qs.map(q => q -> None).toMap
    val gmin = head.getDouble(1)
    val gmax = head.getDouble(2)
    require(!gmin.isInfinite && !gmax.isInfinite,
      "infinite values break bucket arithmetic; filter them upstream")

    // per-quantile selection state. Brackets are HALF-OPEN [lo, hi) —
    // uniformly, so a level's chosen grid cell becomes the next bracket
    // with zero row leakage across the edge (an inclusive upper bound
    // would re-admit equal-valued rows from the next cell and shift the
    // remaining rank). The initial upper bound is nextUp(max) so the
    // maximum itself is inside.
    final case class Sel(q: Double, lo: Double, hi: Double, k: Long, rows: Long,
        done: Option[Double])
    var sels = qs.map { q =>
      val k = math.max(1L, math.ceil(q * n).toLong)
      Sel(q, gmin, Math.nextUp(gmax), k, n,
        if (gmin == gmax) Some(gmin) else None)
    }

    var level = 0
    while (sels.exists(s => s.done.isEmpty && s.rows > maxFinal)) {
      level += 1
      require(level <= maxLevels,
        s"exact-quantile narrowing exceeded maxLevels=$maxLevels " +
          "(pathological value structure? raise maxFinal or maxLevels)")
      val active = sels.zipWithIndex.filter { case (s, _) => s.done.isEmpty && s.rows > maxFinal }
      // one scan for ALL active quantiles: numBuckets conditional counts
      // plus the bracket's OBSERVED min/max, per quantile (bounded
      // aggregate state). The min/max pair is what makes duplicate-heavy
      // data terminate fast: a bracket whose rows all carry one value
      // collapses the moment that value is alone in it — without it a
      // million duplicates of 42.0 would narrow geometrically for ~15
      // levels before the bracket width underflows to zero.
      val aggCols: Seq[Column] = active.flatMap { case (s, si) =>
        val w = (s.hi - s.lo) / numBuckets
        val inBr = col("__v") >= s.lo && col("__v") < s.hi
        (0 until numBuckets).map { b =>
          val lower = s.lo + b * w
          val upper = if (b == numBuckets - 1) s.hi else s.lo + (b + 1) * w
          count(when(col("__v") >= lower && col("__v") < upper, 1)).as(s"__q${si}_b$b")
        } ++ Seq(
          min(when(inBr, col("__v"))).as(s"__q${si}_min"),
          max(when(inBr, col("__v"))).as(s"__q${si}_max"))
      }
      val row = vals.agg(aggCols.head, aggCols.tail: _*).head()
      sels = sels.zipWithIndex.map { case (s, si) =>
        if (s.done.nonEmpty || s.rows <= maxFinal) s
        else {
          val bmin = row.getDouble(row.fieldIndex(s"__q${si}_min"))
          val bmax = row.getDouble(row.fieldIndex(s"__q${si}_max"))
          if (bmin == bmax) Sel(s.q, bmin, bmax, s.k, s.rows, Some(bmin))
          else {
            val counts = (0 until numBuckets).map(b =>
              row.getLong(row.fieldIndex(s"__q${si}_b$b")))
            val w = (s.hi - s.lo) / numBuckets
            var cum = 0L
            var b = 0
            while (cum + counts(b) < s.k) { cum += counts(b); b += 1 }
            // tighten to the grid cell, clipped to observed value bounds
            // (bmin <= every bracket row; every row < nextUp(bmax)) —
            // both clips keep exactly the cell's rows
            val nlo = math.max(bmin, s.lo + b * w)
            val nhi = math.min(Math.nextUp(bmax),
              if (b == numBuckets - 1) s.hi else s.lo + (b + 1) * w)
            val nk = s.k - cum
            val nrows = counts(b)
            if (nlo <= s.lo && nhi >= s.hi)
              // the bracket failed to shrink: its span is within a few
              // ulps (subdivisions rounded back to the parent edges), so
              // it holds only a handful of DISTINCT doubles however many
              // rows — select the k-th from the bounded distinct-value
              // histogram instead of recursing forever
              Sel(s.q, nlo, nhi, nk, nrows,
                Some(kthOfDistinct(vals, nlo, nhi, nk)))
            else Sel(s.q, nlo, nhi, nk, nrows, None)
          }
        }
      }
    }

    // final bounded selection: k-th smallest inside each bracket. All
    // still-open quantiles resolve in ONE scan (r16, guide §1.2): each
    // contributes a conditional sorted collect of its <= maxFinal bracket
    // rows — bounded driver state — and the k-th element of the sorted
    // array is exactly what the previous per-quantile sort-limit computed
    // (duplicates included in both). The old shape ran one full
    // filter+sort+limit job PER quantile; four quantiles at sf0.1 cost 4
    // driver-sequential scans where this costs one.
    val open = sels.zipWithIndex.filter(_._1.done.isEmpty)
    val finals: Map[Int, Double] =
      if (open.isEmpty) Map.empty
      else {
        val aggCols = open.map { case (s, si) =>
          sort_array(collect_list(
            when(col("__v") >= s.lo && col("__v") < s.hi, col("__v"))))
            .as(s"__f$si")
        }
        val row = vals.agg(aggCols.head, aggCols.tail: _*).head()
        open.map { case (s, si) =>
          si -> row.getSeq[Double](row.fieldIndex(s"__f$si"))((s.k - 1).toInt)
        }.toMap
      }
    sels.zipWithIndex.map { case (s, si) =>
      s.q -> Some(s.done.getOrElse(finals(si)))
    }.toMap
  }

  /** k-th smallest inside [lo, hi] via the (value, count) histogram —
    * used only when a bracket's span is so narrow it cannot shrink
    * further in double arithmetic, which bounds its DISTINCT values by
    * ~the ulp count of the span however many rows sit on them.
    */
  private def kthOfDistinct(vals: DataFrame, lo: Double, hi: Double, k: Long): Double = {
    val hist = vals.where(col("__v") >= lo && col("__v") < hi)
      .groupBy(col("__v")).agg(count(lit(1)).as("c"))
      .orderBy(col("__v"))
      .collect()
    var cum = 0L
    var i = 0
    while (cum + hist(i).getLong(1) < k) { cum += hist(i).getLong(1); i += 1 }
    hist(i).getDouble(0)
  }
}
