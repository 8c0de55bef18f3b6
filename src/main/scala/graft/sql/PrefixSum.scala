package graft.sql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running totals WITHOUT a global single-partition window —
  * the declarative two-phase prefix sum used across the engine (curve
  * cumulatives in BinaryModelMetrics, token packing in TokenPacker):
  *
  *  1. bucket rows by the order column's value range (broadcast min/max);
  *  2. per-bucket partitioned window computes the within-bucket running
  *     sum — parallel across buckets;
  *  3. per-bucket totals (≤ numBuckets rows) triangle-join into strictly-
  *     earlier-bucket offsets, broadcast back.
  *
  * `Window.orderBy` with no partitioning ("WindowExec: No Partition
  * Defined") moves ALL data to one task — the canonical scale-killer this
  * replaces. Requires a numeric order column with distinct values (ties
  * within a bucket would make the running sum order-dependent).
  */
object PrefixSum {

  /** Adds `prefixName` = EXCLUSIVE running sum of `valueCol` in ascending
    * `orderCol` order (first row gets 0). Value column must be integral
    * (summed as LONG).
    */
  def exclusive(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      prefixName: String,
      numBuckets: Int = 64): DataFrame = {
    require(numBuckets > 0, s"numBuckets ($numBuckets) must be positive")
    val o: Column = col(orderCol)
    val stats = df.agg(
      min(o).as("__omin"), max(o).as("__omax"))

    val withB = df.crossJoin(broadcast(stats))
      .withColumn("__bkt",
        when(col("__omax") === col("__omin"), lit(0L))
          .otherwise(least(lit(numBuckets - 1L),
            floor((o - col("__omin")) / (col("__omax") - col("__omin")) * numBuckets))
            .cast("long")))

    val wIn = Window.partitionBy(col("__bkt")).orderBy(o)
      .rowsBetween(Window.unboundedPreceding, -1)
    val part = withB.withColumn("__pin",
      coalesce(sum(col(valueCol).cast("long")).over(wIn), lit(0L)))

    val bt = withB.groupBy(col("__bkt"))
      .agg(sum(col(valueCol).cast("long")).as("__bsum"))
    val offsets = bt.as("x")
      .join(bt.select(col("__bkt").as("__yb"), col("__bsum").as("__ybsum")),
        col("__yb") < col("x.__bkt"), "left")
      .groupBy(col("x.__bkt").as("__bkt"))
      .agg(coalesce(sum(col("__ybsum")), lit(0L)).as("__poff"))

    part.join(broadcast(offsets), "__bkt")
      .withColumn(prefixName, col("__pin") + col("__poff"))
      .drop("__bkt", "__omin", "__omax", "__pin", "__poff")
  }
}
