package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

case class MonitorEv(ts: Timestamp, event_type: String, value: java.lang.Double)

/** Streaming/batch parity + null accounting for the windowed monitor. */
class StreamMonitorSpec extends SparkTestBase {
  import spark.implicits._

  private type Ev = MonitorEv
  private def Ev(ts: Timestamp, et: String, v: java.lang.Double) = MonitorEv(ts, et, v)

  private def ts(minute: Int): Timestamp =
    new Timestamp(1700000000000L + minute * 60000L)

  private val events = Seq(
    Ev(ts(0), "click", 1.0),
    Ev(ts(10), "click", 3.0),
    Ev(ts(20), "click", null), // null value -> counted, not averaged
    Ev(ts(5), "view", 10.0),
    Ev(ts(70), "click", 7.0)) // second hour window

  test("batch stats: counts, null counts, min/avg/max per window and type") {
    val got = StreamMonitor
      .stats(events.toDF(), windowLength = "1 hour", tsCol = "ts")
      .select(col("window_start"), col("event_type"), col("n_events"),
        col("n_nulls"), col("avg_value"), col("min_value"), col("max_value"))
      .as[(Timestamp, String, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => (r._1.getTime, r._2) -> r).toMap

    val h0 = 1700000000000L - (1700000000000L % 3600000L)
    val clickH0 = got((h0, "click"))
    assert(clickH0._3 === 3L && clickH0._4 === 1L) // 3 events, 1 null
    assert(clickH0._5 === Some(2.0)) // avg of {1, 3}, null excluded
    assert(clickH0._6 === Some(1.0) && clickH0._7 === Some(3.0))
    assert(got((h0, "view"))._3 === 1L)
    assert(got((h0 + 3600000L, "click"))._3 === 1L)
  }

  test("streaming run produces the batch result") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = StreamMonitor.stats(input.toDF(), windowLength = "1 hour", tsCol = "ts")
      .writeStream.format("memory").queryName("monitor_out")
      .outputMode("complete").start()
    try {
      input.addData(events: _*)
      query.processAllAvailable()
      val streamed = spark.table("monitor_out").collect().map(_.toString).sorted.toSeq
      val batch = StreamMonitor.stats(events.toDF(), windowLength = "1 hour", tsCol = "ts")
        .collect().map(_.toString).sorted.toSeq
      assert(streamed === batch)
    } finally query.stop()
  }

  test("streaming distinct-entity estimate matches the batch sketch exactly") {
    implicit val sqlCtx = spark.sqlContext
    // many entities across two windows; user u repeats within a window
    val ev = (0 until 120).map { i =>
      (ts(i % 90), if (i % 2 == 0) "click" else "view", i.toDouble, s"u${i % 37}")
    }
    val df = ev.toDF("ts", "event_type", "value", "user_id")
    val input = MemoryStream[(Timestamp, String, Double, String)]
    val query = StreamMonitor.statsWithDistinct(
      input.toDF().toDF("ts", "event_type", "value", "user_id"),
      windowLength = "1 hour", tsCol = "ts")
      .writeStream.format("memory").queryName("monitor_hll")
      .outputMode("complete").start()
    try {
      // two adds -> the sketch state must MERGE across micro-batches
      input.addData(ev.take(60): _*)
      query.processAllAvailable()
      input.addData(ev.drop(60): _*)
      query.processAllAvailable()
      val streamed = spark.table("monitor_hll").collect().map(_.toString).sorted.toSeq
      val batch = StreamMonitor.statsWithDistinct(df,
        windowLength = "1 hour", tsCol = "ts")
        .collect().map(_.toString).sorted.toSeq
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally query.stop()
  }
}
