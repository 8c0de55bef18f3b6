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
        "pass collects each still-open bracket (<= maxFinal doubles per " +
        "quantile) into ONE aggregation row, so qs.size * maxFinal " +
        "doubles must fit in the driver row / agg buffer; keep maxFinal " +
        "small (default 100k = ~800 KB per quantile), nowhere near the " +
        "Int.MaxValue bound this require permits")
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
      // one scan for ALL active quantiles, as an explode → groupBy(si,
      // cell) histogram (r17, guide §4.1 / VERDICT #4): the previous
      // shape aggregated numBuckets CONDITIONAL COUNTS per quantile in
      // one row — 264 aggregate expressions for 4 quantiles — which
      // blows past spark.sql.codegen.maxFields and drops the whole
      // scan+agg stage out of whole-stage codegen. Each row now emits
      // one (quantile, cell) entry per bracket it falls in (floor
      // arithmetic, clamped), and a ≤ active×numBuckets-group aggregate
      // counts them with per-CELL observed min/max — tiny shuffle,
      // codegen restored. Per-cell min/max subsumes the old per-bracket
      // min/max clipping (duplicate-heavy brackets still collapse the
      // moment one value is alone in a cell) and is what makes the
      // cell → next-bracket handoff exact: the cell assignment is
      // monotone in __v and equal values share a cell, so
      // [cellMin, nextUp(cellMax)) contains EXACTLY the cell's rows even
      // though floor((v-lo)/w) and the old lo+b*w boundary comparisons
      // round differently in the last ulp.
      val entries: Seq[Column] = active.map { case (s, si) =>
        val w = (s.hi - s.lo) / numBuckets
        val cell: Column =
          if (w > 0)
            least(lit(numBuckets - 1L), floor((col("__v") - s.lo) / w))
              .cast("long")
          else lit(0L) // ulp-narrow bracket: one cell; resolves via the
                       // failed-to-shrink escape below, as before
        when(col("__v") >= s.lo && col("__v") < s.hi,
          struct(lit(si).as("si"), cell.as("cell")))
      }
      val hist = vals.select(col("__v"), explode(array(entries: _*)).as("e"))
        .where(col("e").isNotNull)
        .groupBy(col("e.si").as("si"), col("e.cell").as("cell"))
        .agg(count(lit(1)).as("c"), min(col("__v")).as("mn"),
          max(col("__v")).as("mx"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (si, rows) =>
          si -> rows.map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
            r.getDouble(4))).sortBy(_._1)
        }
      sels = sels.zipWithIndex.map { case (s, si) =>
        if (s.done.nonEmpty || s.rows <= maxFinal) s
        else {
          // walk the (sparse) cells in value order to the one holding the
          // k-th row; earlier cells hold strictly smaller values
          val cells = hist(si)
          var cum = 0L
          var i = 0
          while (cum + cells(i)._2 < s.k) { cum += cells(i)._2; i += 1 }
          val (_, nrows, mn, mx) = cells(i)
          if (mn == mx) Sel(s.q, mn, mx, s.k, s.rows, Some(mn))
          else {
            val nlo = mn
            val nhi = Math.nextUp(mx)
            val nk = s.k - cum
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
