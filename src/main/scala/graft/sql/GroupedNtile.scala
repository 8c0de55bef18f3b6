package graft.sql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed per-group `ntile` WITHOUT a one-task-per-group sort.
  *
  * `ntile(k) OVER (PARTITION BY g ORDER BY o)` sorts each group's ENTIRE
  * slice in a single task — for a low-cardinality group key (languages,
  * sources) the dominant group becomes a single-task sort of most of the
  * corpus. This computes the identical tile assignment from a two-phase
  * rank (the PrefixSum / BinaryModelMetrics pattern):
  *
  *  1. broadcast per-group min/max/count of the order column;
  *  2. value-range-bucket each row → windows partition by (group, bucket),
  *     parallel across `groups × numBuckets` slices;
  *  3. per-(group, bucket) row counts triangle-join into strictly-earlier-
  *     bucket offsets (≤ groups × numBuckets rows), broadcast back;
  *  4. global in-group rank = offset + in-bucket row_number, and the tile
  *     is a row-local closed form of that rank (first `n mod k` tiles get
  *     `n div k + 1` rows — Spark's NTile contract).
  *
  * Ties on the order column always share a value bucket (the bucket is a
  * function of the value), so `tieCols` only ever order WITHIN a bucket
  * and the rank is exactly the single-window rank. Group cardinality must
  * be broadcast-small (the stats/offset frames carry a few rows per
  * group); the order column must be numeric.
  */
object GroupedNtile {

  /** Adds `tileName` = `ntile(k) OVER (PARTITION BY groupCol ORDER BY
    * orderCol, tieCols*)` as a LONG column, computed two-phase.
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

    val stats = df.groupBy(g).agg(
      min(o).as("__omin"), max(o).as("__omax"), count(lit(1)).as("__n"))

    val withB = df.join(broadcast(stats), Seq(groupCol))
      .withColumn("__bkt",
        when(col("__omax") === col("__omin"), lit(0L))
          .otherwise(least(lit(numBuckets - 1L),
            floor((o - col("__omin")) / (col("__omax") - col("__omin")) * numBuckets))
            .cast("long")))

    val wIn = Window.partitionBy(g, col("__bkt")).orderBy(o +: tieCols: _*)
    val part = withB.withColumn("__rin", row_number().over(wIn).cast("long"))

    // per-(group, bucket) counts → ranks carried in from earlier buckets of
    // the same group (triangle join over a tiny frame, fully parallel)
    val bt = withB.groupBy(g, col("__bkt")).agg(count(lit(1)).as("__bn"))
    val offsets = bt.as("x")
      .join(bt.select(g.as("__yg"), col("__bkt").as("__yb"), col("__bn").as("__ybn")),
        col("__yg") === col(s"x.$groupCol") && col("__yb") < col("x.__bkt"), "left")
      .groupBy(col(s"x.$groupCol").as(groupCol), col("x.__bkt").as("__bkt"))
      .agg(coalesce(sum(col("__ybn")), lit(0L)).as("__r0"))

    // NTile closed form: q = n div k, rem = n mod k; the first rem tiles
    // hold q+1 rows. thr = (q+1)*rem is the last rank inside those tiles.
    val rank = col("__r0") + col("__rin")
    val q = floor(col("__n") / k).cast("long")
    val rem = col("__n") % k
    val thr = (q + lit(1L)) * rem
    part.join(broadcast(offsets), Seq(groupCol, "__bkt"))
      .withColumn(tileName,
        when(rank <= thr, ceil(rank / (q + lit(1L)).cast("double")))
          .otherwise(rem + ceil((rank - thr) / q.cast("double")))
          .cast("long"))
      .drop("__bkt", "__omin", "__omax", "__n", "__rin", "__r0")
  }
}
