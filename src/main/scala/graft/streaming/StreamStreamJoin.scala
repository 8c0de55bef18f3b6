package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the streaming counterpart of
  * [[graft.temporal.RangeJoin]]'s attribution shape: each right-side event
  * (purchase) picks up the left-side events (clicks) of the same key whose
  * event time falls in the right event's trailing window.
  *
  * Both inputs carry a watermark and the join condition bounds left time
  * against right time from BOTH sides, so Structured Streaming derives a
  * state-eviction horizon for each input: buffered rows are dropped once
  * the other stream's watermark passes the last instant they could still
  * match. State is therefore O(rate × (watermark + window)) per key range
  * — never unbounded — and both streams shuffle once on the join key,
  * the same partitioning the batch plan uses.
  *
  * Works unchanged when `left` and `right` are filtered views of ONE
  * source stream (click/purchase from a unified event log) — Spark plans
  * the self-join with two stateful sides.
  */
object StreamStreamJoin {

  /** Inner interval join: rows (left ++ right) where
    * `right.ts - windowBefore <= left.ts <= right.ts` and the keys match.
    * Right-side key columns are dropped (they equal the left's).
    *
    * @param windowBefore SQL interval literal body, e.g. `"30 minutes"`.
    * @param watermark    max expected lateness, e.g. `"2 hours"`; applied
    *                     to both inputs.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      windowBefore: String,
      watermark: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one join key")
    require(leftTsCol != rightTsCol,
      "left/right time columns must be named differently (both survive the join)")
    val l = left.withWatermark(leftTsCol, watermark)
    val r = right.withWatermark(rightTsCol, watermark)
    val keyCond: Column = keyCols.map(k => l(k) === r(k)).reduce(_ && _)
    val window = expr(s"INTERVAL $windowBefore")
    val cond = keyCond &&
      l(leftTsCol) >= r(rightTsCol) - window &&
      l(leftTsCol) <= r(rightTsCol)
    keyCols.foldLeft(l.join(r, cond, "inner")) { (df, k) => df.drop(r(k)) }
  }
}
