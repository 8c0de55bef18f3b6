package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.Sessionize.{ClosedSession, Event}

class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int): Timestamp = new Timestamp(1700000000000L + minute * 60000L)

  lazy val events = Seq(
    // user 1: two sessions (gap 120 min > 60 min threshold)
    (1L, 1L, ts(0), 10.0), (2L, 1L, ts(10), 5.0), (3L, 1L, ts(130), 1.0),
    // user 2: one session
    (4L, 2L, ts(5), 2.0), (5L, 2L, ts(45), 3.0))
    .toDF("event_id", "user_id", "ts", "value")

  test("batch sessionization splits on gaps per user") {
    val out = Sessionize.batch(events, gap = 3600)
      .select("user_id", "event_id", "session_idx")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 2L),
      (2L, 4L, 1L), (2L, 5L, 1L)))
  }

  test("windowedEventCounts works on a batch frame") {
    val out = Sessionize.windowedEventCounts(
      events.withColumn("event_type", lit("click")), "1 hour", "2 hours")
    assert(out.agg(sum("n_events")).first().getLong(0) === 5L)
  }

  test("streaming sessions close via event-time watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionize.streamingSessions(
      input.toDS(), gapSeconds = 3600, watermark = "10 minutes")

    val query = sessions.writeStream
      .format("memory").queryName("sessions_out").outputMode("append").start()
    try {
      // session 1 for user 1: minutes 0 and 10
      input.addData(Event(1L, ts(0), 10.0), Event(1L, ts(10), 5.0))
      query.processAllAvailable()
      // advance watermark far past session-1's horizon (10m watermark delay,
      // 60m gap): an event at minute 300 moves the watermark to minute 290
      input.addData(Event(1L, ts(300), 1.0))
      query.processAllAvailable()
      input.addData(Event(2L, ts(600), 2.0)) // push watermark again
      query.processAllAvailable()

      val closed = spark.table("sessions_out").as[ClosedSession].collect()
      val s1 = closed.find(s => s.user_id == 1L && s.n_events == 2)
      assert(s1.isDefined, s"expected user-1 2-event session, got ${closed.toSeq}")
      assert(s1.get.total_value === 15.0)
      assert(s1.get.session_start === ts(0) && s1.get.session_end === ts(10))
    } finally query.stop()
  }

  test("windowed aggregation over a stream with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val counts = Sessionize.windowedEventCounts(
      input.toDS().withColumn("event_type", lit("click")),
      "30 minutes", "10 minutes")

    val query = counts.writeStream
      .format("memory").queryName("window_out").outputMode("append").start()
    try {
      input.addData(Event(1L, ts(0), 1.0), Event(1L, ts(10), 1.0), Event(2L, ts(35), 1.0))
      query.processAllAvailable()
      input.addData(Event(1L, ts(600), 1.0)) // advance watermark, close windows
      query.processAllAvailable()
      val rows = spark.table("window_out").collect()
      // first 30-min window has 2 events
      assert(rows.exists(r => r.getAs[Long]("n_events") == 2L))
    } finally query.stop()
  }
}
