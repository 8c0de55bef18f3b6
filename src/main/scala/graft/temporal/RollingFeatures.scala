package graft.temporal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time-correct rolling features per entity: for each row, trailing
  * statistics over the previous `n` observations of the same key —
  * STRICTLY BEFORE the current row (`ROWS BETWEEN n PRECEDING AND 1
  * PRECEDING`), so a model trained on the output never sees the label
  * row's own value (the classic feature-leakage guard in ML feature
  * pipelines).
  *
  * Beyond-reference operator (LLM-pipeline extension): the standard
  * "user history" featurization of an event log — trailing mean/extrema/
  * volume plus lag and delta — as one keyed window pass.
  *
  * Scale shape: ONE hash-partitioned shuffle on the key, one sort per
  * partition, all features computed in a single window frame traversal
  * (Spark evaluates same-frame window functions together). No self-join,
  * no per-feature passes. Keys are bounded by per-entity history length,
  * not corpus size; a pathological hot entity is a data-skew concern for
  * the caller's partitioning, not an algorithmic blowup.
  */
class RollingFeatures(
    val n: Int,
    val keyCol: String = "user_id",
    val orderCol: String = "ts_us",
    val valueCol: String = "value",
    val tieCol: String = "event_id") {

  require(n > 0, s"n ($n) must be positive")

  /** Input columns plus: lag1 (previous value), delta (value - lag1),
    * roll_n (observations in frame), roll_mean / roll_min / roll_max /
    * roll_sum over the trailing frame. All trailing columns are null for
    * a key's first row (no history), matching SQL window semantics.
    */
  def transform(ds: Dataset[_]): DataFrame = {
    val ordered = Window.partitionBy(col(keyCol)).orderBy(col(orderCol), col(tieCol))
    val trailing = ordered.rowsBetween(-n, -1)
    val v: Column = col(valueCol)
    ds.toDF()
      .withColumn("lag1", lag(v, 1).over(ordered))
      .withColumn("delta", round(v - col("lag1"), 6))
      .withColumn("roll_n", count(v).over(trailing))
      .withColumn("roll_mean", round(avg(v).over(trailing), 6))
      .withColumn("roll_min", round(min(v).over(trailing), 6))
      .withColumn("roll_max", round(max(v).over(trailing), 6))
      .withColumn("roll_sum", round(sum(v).over(trailing), 6))
      .withColumn("lag1", round(col("lag1"), 6))
  }
}
