package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

case class Click(click_ts: Timestamp, user_id: Long, click_id: Long)
case class Purchase(purchase_ts: Timestamp, user_id: Long, purchase_id: Long)

/** Stream-stream interval join: watermarked two-sided state, the streaming
  * counterpart of the q47 batch attribution join.
  */
class StreamStreamJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    new Timestamp(1700000000000L + minute * 60000L)

  private def joined(clicks: MemoryStream[Click], purchases: MemoryStream[Purchase]) =
    StreamStreamJoin.intervalJoin(
      clicks.toDF(), purchases.toDF(), Seq("user_id"),
      leftTsCol = "click_ts", rightTsCol = "purchase_ts",
      windowBefore = "30 minutes", watermark = "2 hours")
      .select(col("user_id"), col("click_id"), col("purchase_id"))

  test("attributes clicks inside the trailing window, same key only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val query = joined(clicks, purchases).writeStream
      .format("memory").queryName("ssj_out").outputMode("append").start()
    try {
      clicks.addData(
        Click(ts(0), 1L, 100L),   // 40 min before purchase: outside window
        Click(ts(15), 1L, 101L),  // inside
        Click(ts(40), 1L, 102L),  // equal to purchase time: inclusive edge
        Click(ts(20), 2L, 200L))  // right time, wrong user
      purchases.addData(Purchase(ts(40), 1L, 900L))
      query.processAllAvailable()
      val got = spark.table("ssj_out")
        .as[(Long, Long, Long)].collect().toSet
      assert(got === Set((1L, 101L, 900L), (1L, 102L, 900L)))
    } finally query.stop()
  }

  test("out-of-order arrival within the watermark still joins") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val query = joined(clicks, purchases).writeStream
      .format("memory").queryName("ssj_ooo").outputMode("append").start()
    try {
      // purchase arrives FIRST, the matching click a micro-batch later
      purchases.addData(Purchase(ts(40), 7L, 901L))
      query.processAllAvailable()
      clicks.addData(Click(ts(25), 7L, 700L))
      query.processAllAvailable()
      val got = spark.table("ssj_ooo")
        .as[(Long, Long, Long)].collect().toSet
      assert(got === Set((7L, 700L, 901L)))
    } finally query.stop()
  }

  test("batch parity: the same frames through the same operator match the interval predicate") {
    val clicks = Seq(
      Click(ts(0), 1L, 100L), Click(ts(15), 1L, 101L),
      Click(ts(40), 1L, 102L), Click(ts(20), 2L, 200L)).toDF()
    val purchases = Seq(
      Purchase(ts(40), 1L, 900L), Purchase(ts(45), 2L, 901L)).toDF()
    val got = StreamStreamJoin.intervalJoin(
      clicks, purchases, Seq("user_id"),
      "click_ts", "purchase_ts", "30 minutes", "2 hours")
      .select(col("user_id"), col("click_id"), col("purchase_id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 101L, 900L), (1L, 102L, 900L), (2L, 200L, 901L)))
  }
}
