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
  * Every sum is an ORDERED window fold (cumulative, and whole-partition
  * under an ORDER BY — both engines fold the sorted sequence left to
  * right, so identical inputs give bit-identical sums; the repo-wide
  * prefix-sum discipline). |S_k| is rounded to the 1e-6 grid BEFORE the
  * argmax so a ~1e-12 input-rounding residue can never flip which k
  * wins; ties at the grid break to the EARLIEST t.
  *
  * == Scale shape ==
  *
  * One keyed sort (the window shuffle), two window passes over it, one
  * map-side-combinable argmax aggregation. State per key is O(1); the
  * series length only pays the sort. Callers feed PRE-AGGREGATED series
  * (e.g. rounded daily sums), so n per key is days, not events.
  */
object ChangePoint {

  /** (group..., t_star, cusum_max, n): the max-|CUSUM| statistic, the
    * earliest position attaining it, and the series length per group.
    */
  def detect(
      df: DataFrame,
      groupCols: Seq[String],
      t: Column,
      x: Column): DataFrame = {
    val g = groupCols.map(col)
    val wo = Window.partitionBy(g: _*).orderBy(col("__t"))
    val whole = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(g :+ t.as("__t") :+ x.cast("double").as("__x"): _*)
      .withColumn("__tot", sum(col("__x")).over(whole))
      .withColumn("__n", count(lit(1)).over(whole))
      .withColumn("__pre", sum(col("__x")).over(cum))
      .withColumn("__rn", row_number().over(wo))
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
