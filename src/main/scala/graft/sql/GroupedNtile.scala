package graft.sql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed per-group ranking WITHOUT a one-task-per-group sort.
  *
  * `row_number()/ntile(k) OVER (PARTITION BY g ORDER BY o)` sorts each
  * group's ENTIRE slice in a single task — for a low-cardinality group key
  * (languages, sources, a single boundary frequency) the dominant group
  * becomes a single-task sort of most of the corpus. These helpers compute
  * identical results two-phase (the PrefixSum / BinaryModelMetrics
  * pattern): coarse-bucket each row, rank inside (group, bucket) windows
  * in parallel, and add per-bucket offsets from a tiny triangle join.
  *
  * Group cardinality must be broadcast-small (the stats/offset frames
  * carry a few rows per group × bucket). Group keys and order values must
  * be NON-NULL: the internal equi-joins would drop null keys where a
  * window would have ranked them, so a violation raises a runtime error
  * (a row-local `raise_error` guard) instead of silently losing rows.
  */
object GroupedNtile {

  /** Adds `rankName` = `row_number() OVER (PARTITION BY groupCol ORDER BY
    * orderCols*)` as a LONG column, computed two-phase. `bucket` is a
    * caller-supplied coarse bucketing expression that must be
    * order-consistent with `orderCols` (x before y ⇒ bucket(x) <=
    * bucket(y)); ties on the full `orderCols` list must land in one bucket
    * for the result to be deterministic.
    */
  def rank(
      df: DataFrame,
      groupCol: String,
      orderCols: Seq[Column],
      bucket: Column,
      rankName: String): DataFrame = {
    val g = col(groupCol)
    // loud precondition: a null group key or null bucket (null order value)
    // would silently vanish in the equi-joins below — fail the job instead.
    // The group guard must live INSIDE the join key itself (the column is
    // REPLACED with the guarded expression): a guard on a side column gets
    // bypassed when Catalyst pushes the join's inferred IsNotNull(group)
    // filter below the guard projection, dropping the row before the
    // raise_error ever evaluates. Keyed on the guarded expression, that
    // same inferred filter EVALUATES the guard and raises.
    //
    // Cost, re-measured r13 (q56 shape, sf0.1, five variants interleaved
    // min-of-5 in one JVM: guarded / unguarded / bucket-staged-then-
    // guarded): the spread between ALL variants sits inside JIT/warm-up
    // noise (±0.05 s) — run ORDER moved times more than the guard did,
    // and the r12 diff's 0.41→0.60 attribution was dominated by window
    // context, not this expression. A pre-projected bucket buys nothing
    // measurable and would re-open the pushed-IsNotNull bypass for the
    // group key, so the robust form stays.
    val withB = df
      .withColumn("__bkt",
        when(bucket.isNull && g.isNotNull,
          raise_error(lit("GroupedNtile: null group key or order value")))
          .otherwise(bucket))
      .withColumn(groupCol,
        when(g.isNull,
          raise_error(lit("GroupedNtile: null group key or order value")))
          .otherwise(g))

    val wIn = Window.partitionBy(g, col("__bkt")).orderBy(orderCols: _*)
    val part = withB.withColumn("__rin", row_number().over(wIn).cast("long"))

    // per-(group, bucket) counts → ranks carried in from earlier buckets of
    // the same group (triangle join over a tiny frame, fully parallel).
    // Derived from `part` (the post-window frame), NOT from `withB`
    // (r16, guide §2.4): the window's exchange already clusters rows by
    // (group, bucket), so this aggregate adds NO exchange — and because
    // the offsets branch now contains the IDENTICAL exchange subtree as
    // the ranked branch, ReuseExchange collapses them to one physical
    // upstream execution. The old withB-keyed aggregate partial-agged
    // BELOW its own exchange, which shared nothing, so every rank() call
    // recomputed its entire input twice — and a caller chaining k ranks
    // (the RFM shape) paid ~2^k upstream instantiations.
    // __bn = max(row_number) == the bucket's row count — max over __rin
    // rather than count(1), because an aggregate that ignores the window
    // column lets the optimizer ELIMINATE the window node from this
    // branch and silently restore the unshared two-pass shape (observed:
    // identical plan hash with count(1))
    val bt = part.groupBy(g, col("__bkt")).agg(max(col("__rin")).as("__bn"))
    val offsets = bt.as("x")
      .join(bt.select(g.as("__yg"), col("__bkt").as("__yb"), col("__bn").as("__ybn")),
        col("__yg") === col(s"x.$groupCol") && col("__yb") < col("x.__bkt"), "left")
      .groupBy(col(s"x.$groupCol").as(groupCol), col("x.__bkt").as("__bkt"))
      .agg(coalesce(sum(col("__ybn")), lit(0L)).as("__r0"))

    part.join(broadcast(offsets), Seq(groupCol, "__bkt"))
      .withColumn(rankName, col("__r0") + col("__rin"))
      .drop("__bkt", "__rin", "__r0")
  }

  /** Adds `rankName` = `row_number() OVER (PARTITION BY groupCol ORDER BY
    * orderCol [DESC], tieCols*)` for a NUMERIC order column, deriving the
    * order-consistent bucket from per-group value-range stats (min/max
    * broadcast back, `numBuckets` equal-width slices, reversed when
    * `descending`). Ties on `orderCol` always share a bucket because the
    * bucket is a function of the value; `tieCols` only order within one.
    *
    * Degenerate case: a group whose order values are ALL equal lands
    * entirely in bucket 0 and ranks in a single task — unavoidable without
    * changing the (orderCol, tieCols) rank order, since any finer split
    * would have to bucket by tie columns the ordering has not yet sorted.
    * Constant-valued groups of unbounded size are the caller's smell; for
    * uniform-hash order keys (the [[graft.sampling.StratifiedSampler]]
    * case) the degenerate case cannot occur.
    */
  def rankByValue(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      descending: Boolean,
      tieCols: Seq[Column],
      rankName: String,
      numBuckets: Int = 64): DataFrame = {
    require(numBuckets > 0, s"numBuckets ($numBuckets) must be positive")
    val g = col(groupCol)
    val o = col(orderCol)
    // NULL-SAFE stats join: a USING join drops null-group rows HERE,
    // before rank()'s loud guard can ever see them — the exact silent
    // loss the contract promises to fail on. Null-group rows must reach
    // rank(), whose g.isNull guard raises. Likewise the bucket must stay
    // NULL for a null order value (least() skips nulls and would turn it
    // into a valid last bucket, bypassing the bucket.isNull guard).
    val stats = df.groupBy(g).agg(min(o).as("__omin"), max(o).as("__omax"))
      .withColumnRenamed(groupCol, "__st_g")
    val withStats = df.join(broadcast(stats), g <=> col("__st_g")).drop("__st_g")
    val span = col("__omax") - col("__omin")
    val frac =
      if (descending) (col("__omax") - o) / span else (o - col("__omin")) / span
    val bucket = when(o.isNull, lit(null).cast("long"))
      .when(col("__omax") === col("__omin"), lit(0L))
      .otherwise(least(lit(numBuckets - 1L), floor(frac * numBuckets)).cast("long"))
    val ord = (if (descending) o.desc else o.asc) +: tieCols
    rank(withStats, groupCol, ord, bucket, rankName).drop("__omin", "__omax")
  }

  /** Adds `tileName` = `ntile(k) OVER (PARTITION BY groupCol ORDER BY
    * orderCol, tieCols*)` as a LONG column, computed two-phase over
    * value-range buckets of the numeric `orderCol` (ties always share a
    * bucket because the bucket is a function of the value; `tieCols` only
    * ever order WITHIN a bucket).
    */
  def ntile(
      df: DataFrame,
      k: Int,
      groupCol: String,
      orderCol: String,
      tieCols: Seq[Column],
      tileName: String,
      numBuckets: Int = 64): DataFrame = {
    require(k > 0, s"k ($k) must be positive")
    require(numBuckets > 0, s"numBuckets ($numBuckets) must be positive")
    val g = col(groupCol)
    val o = col(orderCol)

    // null-safe join + null-propagating bucket: see rankByValue — rank()'s
    // loud guards only fire on rows that actually REACH it
    val stats = df.groupBy(g).agg(
      min(o).as("__omin"), max(o).as("__omax"), count(lit(1)).as("__n"))
      .withColumnRenamed(groupCol, "__st_g")
    val withStats = df.join(broadcast(stats), g <=> col("__st_g")).drop("__st_g")
    val bucket =
      when(o.isNull, lit(null).cast("long"))
        .when(col("__omax") === col("__omin"), lit(0L))
        .otherwise(least(lit(numBuckets - 1L),
          floor((o - col("__omin")) / (col("__omax") - col("__omin")) * numBuckets))
          .cast("long"))

    // NTile closed form over the two-phase rank: q = n div k, rem = n mod k;
    // the first rem tiles hold q+1 rows. thr = (q+1)*rem is the last rank
    // inside those tiles.
    val ranked = rank(withStats, groupCol, o +: tieCols, bucket, "__rank")
    val r = col("__rank")
    val q = floor(col("__n") / k).cast("long")
    val rem = col("__n") % k
    val thr = (q + lit(1L)) * rem
    ranked
      .withColumn(tileName,
        when(r <= thr, ceil(r / (q + lit(1L)).cast("double")))
          .otherwise(rem + ceil((r - thr) / q.cast("double")))
          .cast("long"))
      .drop("__omin", "__omax", "__n", "__rank")
  }
}
