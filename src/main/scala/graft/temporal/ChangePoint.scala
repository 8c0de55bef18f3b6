package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM change-point detection per key (Page 1954; the offline
  * max-|CUSUM| form): over an ordered series x_1..x_n, S_k = sum_{i<=k}
  * (x_i - mean), the statistic is max_k |S_k| and the change point is
  * the k attaining it — the point where the series' running mass
  * diverges most from "no shift". The pipeline-monitoring question
  * ("when did this source's daily volume change level?") answered
  * declaratively per key, the offline sibling of the online
  * [[graft.streaming.DriftStream]].
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * == Deterministic contract ==
  *
  * |S_k| is rounded to the 1e-6 grid BEFORE the argmax, so the ~1e-12
  * residue between this engine's two-phase summation tree and an
  * oracle's sequential fold can never flip which k wins; ties at the
  * grid break to the EARLIEST position. One row per (group, t) is the
  * caller's contract (pre-aggregated series); a null t fails loudly.
  *
  * == Scale shape ==
  *
  * No per-group single-task sort (a group key like a source name is
  * low-cardinality — one window per group would serialize the corpus):
  * the running sum and position are TWO-PHASE (the PrefixSum /
  * GroupedNtile discipline) — t-range buckets, parallel within-bucket
  * windows, and a broadcast triangle of strictly-earlier-bucket
  * offsets. Group totals ride the same tiny per-bucket frame. State per
  * key is O(1); the series length pays only bucketed sorts.
  */
object ChangePoint {

  /** (group..., t_star, cusum_max, n): the max-|CUSUM| statistic, the
    * earliest position attaining it, and the series length per group.
    * `t` must be numeric (a day number, an epoch) — it drives the
    * range bucketing.
    */
  def detect(
      df: DataFrame,
      groupCols: Seq[String],
      t: Column,
      x: Column,
      numBuckets: Int = 64): DataFrame = {
    require(numBuckets > 0, s"numBuckets ($numBuckets) must be positive")
    val g = groupCols.map(col)
    val base = df.select(g :+ t.as("__t") :+ x.cast("double").as("__x"): _*)
    val stats = base.groupBy(g: _*)
      .agg(min(col("__t")).as("__tmin"), max(col("__t")).as("__tmax"))
    val statsR = groupCols.foldLeft(stats)((d, c) => d.withColumnRenamed(c, s"__st_$c"))
    val joinCond = groupCols.map(c => col(c) <=> col(s"__st_$c")).reduce(_ && _)
    val withB = base.join(broadcast(statsR), joinCond)
      .withColumn("__bkt",
        // loud guard: a null position has no place in a running fold
        // (the PrefixSum discipline)
        when(col("__t").isNull,
          raise_error(lit("ChangePoint: null t value")))
          .when(col("__tmax") === col("__tmin"), lit(0L))
          .otherwise(least(lit(numBuckets - 1L),
            floor((col("__t") - col("__tmin"))
              / (col("__tmax") - col("__tmin")) * numBuckets)).cast("long")))
      .drop(groupCols.map(c => s"__st_$c"): _*)
      .drop("__tmin", "__tmax")
    val wl = Window.partitionBy(g :+ col("__bkt"): _*).orderBy(col("__t"))
    val local = withB
      .withColumn("__lp", sum(col("__x")).over(
        wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__lrn", row_number().over(wl).cast("long"))
    val bt = withB.groupBy(g :+ col("__bkt"): _*)
      .agg(sum(col("__x")).as("__bs"), count(lit(1)).as("__bn"))
    val btR = groupCols.foldLeft(
      bt.select(groupCols.map(col) :+ col("__bkt").as("__yb") :+
        col("__bs").as("__ybs") :+ col("__bn").as("__ybn"): _*))(
      (d, c) => d.withColumnRenamed(c, s"__y_$c"))
    val yCond = groupCols.map(c => col(s"x.$c") <=> col(s"__y_$c")).reduce(_ && _)
    val offsets = bt.as("x")
      .join(btR, yCond && col("__yb") < col("x.__bkt"), "left")
      .groupBy(groupCols.map(c => col(s"x.$c").as(c)) :+ col("x.__bkt").as("__bkt"): _*)
      .agg(coalesce(sum(col("__ybs")), lit(0.0)).as("__offs"),
        coalesce(sum(col("__ybn")), lit(0L)).as("__offn"))
    val totals = bt.groupBy(g: _*)
      .agg(sum(col("__bs")).as("__tot"), sum(col("__bn")).as("__n"))
    local
      .join(broadcast(offsets), groupCols :+ "__bkt")
      .join(broadcast(totals), groupCols)
      .withColumn("__pre", col("__offs") + col("__lp"))
      .withColumn("__rn", col("__offn") + col("__lrn"))
      .withColumn("__s", round(
        abs(col("__pre") - col("__rn") * (col("__tot") / col("__n"))), 6))
      .groupBy(g: _*)
      .agg(
        max(struct(col("__s"), (-col("__rn")).as("__neg"), col("__t"))).as("__m"),
        first(col("__n")).as("n"))
      .select(g ++ Seq(col("__m.__t").as("t_star"),
        col("__m.__s").as("cusum_max"), col("n")): _*)
  }
}
