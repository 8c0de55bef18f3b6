package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.Sessionize.{ClosedSession, Event}

/** Pins that the native `session_window` aggregation ([[Sessionize.sessionAgg]])
  * and the typed `flatMapGroupsWithState` path ([[Sessionize.streamingSessions]])
  * produce the SAME sessions — boundaries, counts, totals — in both
  * execution models, so the codegen-friendly declarative path can serve
  * plain closed-session stats without the typed-state machinery.
  */
class SessionParitySpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int): Timestamp = new Timestamp(1700000000000L + minute * 60000L)

  // user 1: sessions {0,10,40} and {130}; user 2: {5,45}; user 3 singleton
  private val fixture = Seq(
    Event(1L, ts(0), 10.0), Event(1L, ts(10), 5.0), Event(1L, ts(40), 2.5),
    Event(1L, ts(130), 1.0),
    Event(2L, ts(5), 2.0), Event(2L, ts(45), 3.0),
    Event(3L, ts(7), 4.0))

  private def asTuples(rows: Seq[ClosedSession]) =
    rows.map(s => (s.user_id, s.session_start, s.session_end, s.n_events, s.total_value)).toSet

  test("batch: sessionAgg matches the batch() session structure exactly") {
    val events = fixture.toDF()
    val agg = Sessionize.sessionAgg(events, gapSeconds = 3600)
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
    // derive the same aggregates from the lag-gap batch path
    val viaBatch = Sessionize.batch(
      events.withColumn("event_id", monotonically_increasing_id()), gap = 3600)
      .groupBy($"user_id", $"session_idx")
      .agg(min($"ts").as("session_start"), max($"ts").as("session_end"),
        count(lit(1)).as("n_events"), sum($"value").as("total_value"))
      .select($"user_id", $"session_start", $"session_end", $"n_events", $"total_value")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
    assert(agg === viaBatch)
    assert(agg.size === 4)
    assert(agg.contains((1L, ts(0), ts(40), 3L, 17.5)))
  }

  test("streaming: sessionAgg (append + watermark) matches flatMapGroupsWithState") {
    implicit val sqlCtx = spark.sqlContext

    def feed(addAll: MemoryStream[Event] => org.apache.spark.sql.streaming.StreamingQuery => Unit)(
        mk: MemoryStream[Event] => org.apache.spark.sql.DataFrame,
        name: String): Seq[org.apache.spark.sql.Row] = {
      val input = MemoryStream[Event]
      val q = mk(input).writeStream
        .format("memory").queryName(name).outputMode("append").start()
      try {
        addAll(input)(q)
        spark.table(name).collect().toSeq
      } finally q.stop()
    }

    val script: MemoryStream[Event] => org.apache.spark.sql.streaming.StreamingQuery => Unit =
      in => q => {
        in.addData(fixture.filter(_.ts.getTime <= ts(45).getTime): _*)
        q.processAllAvailable()
        in.addData(Event(1L, ts(130), 1.0))
        q.processAllAvailable()
        // watermark pusher: closes every open session (10m delay + 60m gap)
        in.addData(Event(9L, ts(600), 0.0))
        q.processAllAvailable()
        in.addData(Event(9L, ts(1200), 0.0))
        q.processAllAvailable()
      }

    val typed = feed(script)(
      in => Sessionize.streamingSessions(in.toDS(), 3600, "10 minutes").toDF(),
      "parity_typed")
    val native = feed(script)(
      in => Sessionize.sessionAgg(
        in.toDS().toDF().withWatermark("ts", "10 minutes"), 3600),
      "parity_native")

    def norm(rows: Seq[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4)))
      .filter(_._1 != 9L) // drop the watermark-pusher user
      .toSet

    val t = norm(typed)
    val n = norm(native)
    assert(t === n, s"typed=$t native=$n")
    // the fixture's first four sessions all closed
    assert(n.contains((1L, ts(0), ts(40), 3L, 17.5)))
    assert(n.contains((1L, ts(130), ts(130), 1L, 1.0)))
    assert(n.contains((2L, ts(5), ts(45), 2L, 5.0)))
    assert(n.contains((3L, ts(7), ts(7), 1L, 4.0)))
  }
}
