package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval join: match each left "point" row (key, t)
  * to every right "interval" row (key, start, end) with
  * `start <= t <= end` — attribution windows, validity intervals,
  * session membership.
  *
  * Beyond-reference operator (the build brief's other canonical
  * Spark-lacks example, next to [[AsOfJoin]]). A naive formulation is an
  * equi-join on key with a range residual; when a key has many intervals
  * the per-key fan-out is quadratic, and with NO key it degenerates to a
  * broadcast-nested-loop. The classic fix (Flink interval joins, warehouse
  * range-join optimizations) is time bucketing, done here declaratively:
  *
  *  1. points get bucket `floor(t / W)`;
  *  2. intervals EXPLODE to one row per covered bucket
  *     (`sequence(floor(start/W), floor(end/W))`) — bounded fan-out of
  *     `len/W + 1` rows per interval;
  *  3. hash equi-join on (key..., bucket) — never a nested loop;
  *  4. residual `t BETWEEN start AND end`. A point's single bucket meets
  *     each interval's bucket list at most once, so no dedup is needed.
  *
  * Pick `bucketWidth` near the typical interval length: each interval then
  * explodes to ~2 rows and each bucket-join group stays small. Scale:
  * shuffle on (key, bucket) — adding the bucket to the key spreads hot
  * keys across `span/W` partitions, the opposite of the all-in-one-task
  * key-only join.
  */
class RangeJoin(
    keyCols: Seq[String],
    timeCol: String,
    startCol: String,
    endCol: String,
    bucketWidth: Long) {

  require(bucketWidth > 0, s"bucketWidth ($bucketWidth) must be positive")

  /** Inner point-in-interval join; emits left columns + right columns.
    * Column names (other than the shared keys) must not clash — rename
    * upstream, same contract as [[AsOfJoin]].
    */
  def join(points: DataFrame, intervals: DataFrame): DataFrame = {
    val clash = intervals.columns.filterNot(keyCols.contains)
      .toSet.intersect(points.columns.filterNot(keyCols.contains).toSet)
    require(clash.isEmpty,
      s"interval columns clash with point columns: ${clash.mkString(", ")} — rename upstream")

    val pb = points.withColumn("__bucket",
      floor(col(timeCol).cast("long") / bucketWidth))
    // inverted intervals (end < start) can never match a point, but
    // sequence() DESCENDS for them — one dirty row like (start=10^9,
    // end=0) would explode into start/W garbage bucket rows before the
    // residual filters them. Drop them BEFORE the explode; the filter
    // also discards null-bounded intervals (null never matches BETWEEN).
    val ib = intervals
      .where(col(endCol).cast("long") >= col(startCol).cast("long"))
      .withColumn("__bucket",
        explode(sequence(
          floor(col(startCol).cast("long") / bucketWidth),
          floor(col(endCol).cast("long") / bucketWidth))))
    pb.join(ib, keyCols :+ "__bucket")
      .where(col(timeCol).cast("long").between(
        col(startCol).cast("long"), col(endCol).cast("long")))
      .drop("__bucket")
  }
}
