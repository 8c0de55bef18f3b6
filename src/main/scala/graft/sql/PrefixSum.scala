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
        // loud guard: floor(NULL) is NULL but least() SKIPS nulls, so a
        // NULL order value would silently land in the TOP bucket and
        // corrupt every last-bucket prefix — fail the job instead (the
        // GroupedNtile discipline; a running total has no defined
        // position for a missing order value)
        when(o.isNull,
          raise_error(lit(s"PrefixSum: null order value in '$orderCol'")))
          .when(col("__omax") === col("__omin"), lit(0L))
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

  /** Per-GROUP exclusive running sums in one scan: adds `prefixName` =
    * exclusive running sum of `valueCol` in ascending `orderCol` order
    * WITHIN each distinct `groupCols` key. The grouped complement of
    * [[exclusive]], replacing both of the prior patterns for per-group
    * cumulatives: a window partitioned by a low-cardinality group (one
    * task per group — the PlanGuard-banned shape) and a driver loop
    * unioning one plan per group (G rescans of the input — what q161
    * shipped in round 8).
    *
    * Same three-phase shape as [[exclusive]], with every phase keyed by
    * (group, bucket) instead of bucket:
    *  1. per-group min/max (one partial-aggregated groupBy, G rows)
    *     joined back to assign each row a within-group value-range bucket
    *     — parallelism G × numBuckets regardless of group skew;
    *  2. per-(group, bucket) partitioned window for the within-bucket
    *     running sum;
    *  3. per-(group, bucket) totals triangle-joined into strictly-earlier
    *     -bucket offsets WITHIN the group (G × numBuckets² work on a
    *     G × numBuckets-row frame — negligible), joined back.
    *
    * The stats/offsets joins carry no broadcast hint: they are G- and
    * G × numBuckets-row frames, broadcast by AQE while small, degrading
    * to a key-partitioned shuffle (never failing) for huge group counts —
    * the [[graft.feature.TargetEncoder]] discipline, and all group joins
    * are null-safe so a NULL group key is a real group (same convention
    * as TargetEncoder). Requires distinct `orderCol` values within each
    * group (ties within a bucket would make the running sum
    * order-dependent), numeric order values, and an integral value
    * column (summed as LONG).
    *
    * Call-site note: the three phases reference `df` from differently
    * column-pruned branches, which makes the copies non-canonical and
    * defeats exchange reuse — an EXPENSIVE input subtree (a scan + heavy
    * transform) would re-run per branch. When the rows-to-cumulate are
    * the output of an aggregation (the common case — q161 cumulates
    * per-(group, score) counts), `persist()` that small aggregate before
    * calling this; the source is then read once and the diamond fans out
    * over the cached rows (PlanAuditSpec pins q161's single-scan shape).
    */
  def exclusiveBy(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      valueCol: String,
      prefixName: String,
      numBuckets: Int = 64): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty (use exclusive)")
    require(numBuckets > 0, s"numBuckets ($numBuckets) must be positive")
    val o: Column = col(orderCol)
    val g = groupCols.map(col)
    val stats = df.groupBy(g: _*)
      .agg(min(o).as("__omin"), max(o).as("__omax"))
      .select(groupCols.map(c => col(c).as(s"__s_$c")) ++
        Seq(col("__omin"), col("__omax")): _*)

    val sMatch = groupCols.map(c => col(c) <=> col(s"__s_$c")).reduce(_ && _)
    val withB = df.join(stats, sMatch)
      .drop(groupCols.map(c => s"__s_$c"): _*)
      .withColumn("__bkt",
        // same loud null-order guard as [[exclusive]] (least() skips
        // nulls → silent top-bucket corruption otherwise)
        when(o.isNull,
          raise_error(lit(s"PrefixSum: null order value in '$orderCol'")))
          .when(col("__omax") === col("__omin"), lit(0L))
          .otherwise(least(lit(numBuckets - 1L),
            floor((o - col("__omin")) / (col("__omax") - col("__omin")) * numBuckets))
            .cast("long")))

    val wIn = Window.partitionBy(g :+ col("__bkt"): _*).orderBy(o)
      .rowsBetween(Window.unboundedPreceding, -1)
    val part = withB.withColumn("__pin",
      coalesce(sum(col(valueCol).cast("long")).over(wIn), lit(0L)))

    val bt = withB.groupBy(g :+ col("__bkt"): _*)
      .agg(sum(col(valueCol).cast("long")).as("__bsum"))
    val yCols = groupCols.map(c => col(c).as(s"__y_$c"))
    val yMatch = groupCols.map(c => col(s"__y_$c") <=> col(s"x.$c"))
      .reduce(_ && _)
    val offsets = bt.as("x")
      .join(bt.select(yCols :+ col("__bkt").as("__yb") :+ col("__bsum").as("__ybsum"): _*),
        yMatch && col("__yb") < col("x.__bkt"), "left")
      .groupBy(groupCols.map(c => col(s"x.$c").as(s"__o_$c")) :+
        col("x.__bkt").as("__obkt"): _*)
      .agg(coalesce(sum(col("__ybsum")), lit(0L)).as("__poff"))

    val oMatch = (groupCols.map(c => col(c) <=> col(s"__o_$c")) :+
      (col("__bkt") === col("__obkt"))).reduce(_ && _)
    part.join(offsets, oMatch)
      .withColumn(prefixName, col("__pin") + col("__poff"))
      .drop(groupCols.map(c => s"__o_$c") ++
        Seq("__obkt", "__bkt", "__omin", "__omax", "__pin", "__poff"): _*)
  }
}
