package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.streaming.AnomalyStream.AnomPoint
import graft.streaming.EwmaStream.EwmaEvent

/** The live anomaly monitor must agree with the batch
  * [[graft.temporal.AnomalyDetector]] on every mean/variance/z/flag — bit
  * for bit on a per-key-monotone stream, across micro-batch boundaries —
  * and must keep the base-mode frontier/eviction contracts.
  */
class AnomalyStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    new Timestamp(1700000000000L + minute * 60000L)

  private def runStream(batches: Seq[Seq[EwmaEvent]],
      minPrior: Int = 2): Map[Long, AnomPoint] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EwmaEvent]
    val q = AnomalyStream.detect(input.toDS(), alpha = 0.25,
      threshold = 3.0, minPrior = minPrior).writeStream
      .format("memory").queryName("anom_stream_out").outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table("anom_stream_out").as[AnomPoint].collect()
        .map(p => p.event_id -> p).toMap
    } finally q.stop()
  }

  private def batchDetect(events: Seq[EwmaEvent]): Map[Long, AnomPoint] =
    AnomalyStream.detect(events.toDS()).collect().map(p => p.event_id -> p).toMap

  test("monotone stream matches the batch detector bit-for-bit across micro-batches") {
    val b1 = Seq(
      EwmaEvent(1L, 10L, ts(0), Some(10.0)),
      EwmaEvent(1L, 11L, ts(10), Some(12.0)),
      EwmaEvent(2L, 20L, ts(5), Some(5.0)))
    val b2 = Seq(
      EwmaEvent(1L, 12L, ts(20), Some(10.0)),
      EwmaEvent(1L, 13L, ts(30), None), // null: passthrough, unscored
      EwmaEvent(1L, 14L, ts(40), Some(100.0)), // the jump
      EwmaEvent(2L, 21L, ts(25), Some(6.0)))
    val got = runStream(Seq(b1, b2))
    val want = batchDetect(b1 ++ b2)
    assert(got.keySet === want.keySet)
    want.foreach { case (id, w) =>
      assert(got(id) === w, s"event $id: stream ${got(id)} vs batch $w")
    }
    assert(got(14L).is_anomaly === 1)
    assert(got(12L).is_anomaly === 0)
    assert(got(13L).z.isEmpty && got(13L).mean === got(12L).mean)
  }

  test("an event behind the folded frontier is flagged late and unscored; state untouched") {
    val b1 = Seq(
      EwmaEvent(1L, 10L, ts(0), Some(10.0)),
      EwmaEvent(1L, 11L, ts(10), Some(12.0)))
    val late = Seq(EwmaEvent(1L, 9L, ts(5), Some(999.0)))
    val after = Seq(EwmaEvent(1L, 12L, ts(20), Some(11.0)))
    val got = runStream(Seq(b1, late, after))
    assert(got(9L).late && got(9L).z.isEmpty && got(9L).is_anomaly === 0)
    // the smoother continued as if the late event never happened
    val clean = batchDetect(b1 ++ after)
    assert(got(12L) === clean(12L))
  }

  test("cold start: no z before minPrior; constant history never flags") {
    val events = Seq(
      EwmaEvent(1L, 0L, ts(0), Some(7.0)),
      EwmaEvent(1L, 1L, ts(10), Some(7.0)),
      EwmaEvent(1L, 2L, ts(20), Some(7.0)),
      EwmaEvent(1L, 3L, ts(30), Some(70.0))) // jump after CONSTANT history
    val got = runStream(Seq(events))
    assert(got(1L).z.isEmpty) // 1 prior < minPrior
    assert(got(3L).z.isEmpty && got(3L).is_anomaly === 0) // prior variance 0
  }

  test("eviction restarts cold: a returning key re-seeds and is unscored") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EwmaEvent]
    val q = AnomalyStream.detect(input.toDS(), watermark = "0 seconds",
      idleGapSeconds = 60L).writeStream
      .format("memory").queryName("anom_evict_out").outputMode("append").start()
    try {
      input.addData(
        EwmaEvent(1L, 1L, ts(0), Some(4.0)),
        EwmaEvent(1L, 2L, ts(1), Some(8.0)),
        EwmaEvent(1L, 3L, ts(2), Some(5.0)))
      q.processAllAvailable()
      input.addData(EwmaEvent(2L, 4L, ts(100), Some(1.0))) // advance wm past idle
      q.processAllAvailable()
      input.addData(EwmaEvent(1L, 5L, ts(101), Some(999.0)))
      q.processAllAvailable()
      val got = spark.table("anom_evict_out").as[AnomPoint].collect()
        .map(p => p.event_id -> p).toMap
      // key 1 was evicted: 999 re-seeds (mean = value) and cannot flag
      assert(got(5L).mean === Some(999.0))
      assert(got(5L).z.isEmpty && got(5L).is_anomaly === 0)
    } finally q.stop()
  }

  // -------------------------------------------------------------------
  // ordered mode (detectOrdered): bounded-disorder arrivals scored exactly
  // -------------------------------------------------------------------

  test("ordered mode: bounded disorder scores exactly like the batch detector") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EwmaEvent]
    val q = AnomalyStream.detectOrdered(input.toDS(), alpha = 0.25,
      threshold = 3.0, minPrior = 2, lateness = "10 minutes").writeStream
      .format("memory").queryName("anom_ordered_out").outputMode("append").start()
    val events = Seq(
      EwmaEvent(1L, 10L, ts(0), Some(10.0)),
      EwmaEvent(1L, 11L, ts(10), Some(12.0)),
      EwmaEvent(1L, 12L, ts(5), Some(11.0)), // delivered late, within bound
      EwmaEvent(1L, 13L, ts(30), Some(10.0)),
      EwmaEvent(1L, 14L, ts(40), Some(100.0))) // the jump
    try {
      input.addData(events(0), events(1)); q.processAllAvailable()
      input.addData(events(2), events(3)); q.processAllAvailable()
      input.addData(events(4)); q.processAllAvailable()
      // flush the tail: advance the watermark far past every buffered event
      input.addData(EwmaEvent(2L, 99L, ts(500), Some(1.0)))
      q.processAllAvailable()
      val got = spark.table("anom_ordered_out").as[AnomPoint].collect()
        .filter(_.user_id == 1L).map(p => p.event_id -> p).toMap
      // ground truth: the IN-ORDER batch detector over the same events
      val want = batchDetect(events)
      assert(got.keySet === want.keySet)
      want.foreach { case (id, w) =>
        assert(got(id) === w, s"event $id: ordered stream ${got(id)} vs batch $w")
      }
      // the disorder was served exactly: event 12 folded between 10 and 11
      // by EVENT TIME (second in order — still warming up, so z is null
      // but never `late`), its mean shows the in-order fold, event 11
      // (third in order) is the first scored row, and the jump flags
      assert(!got(12L).late && got(12L).mean === Some(0.25 * 11.0 + 0.75 * 10.0))
      assert(got(11L).z.nonEmpty)
      assert(got(14L).is_anomaly === 1)
    } finally q.stop()
  }

  test("ordered mode: an arrival beyond the allowed lateness is flagged, buffer intact") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EwmaEvent]
    // lateness 5 min, watermark 30 min: the [lateness, watermark) band
    // surfaces flagged instead of being dropped or folded out of order
    val q = AnomalyStream.detectOrdered(input.toDS(), lateness = "5 minutes",
      watermark = "30 minutes").writeStream
      .format("memory").queryName("anom_ordered_late_out").outputMode("append").start()
    try {
      input.addData(
        EwmaEvent(1L, 10L, ts(0), Some(10.0)),
        EwmaEvent(1L, 11L, ts(20), Some(12.0)))
      q.processAllAvailable() // first batch: wm 0, nothing folds
      input.addData(EwmaEvent(1L, 12L, ts(60), Some(11.0)))
      q.processAllAvailable() // wm ts(-10): folds ts(0); then wm -> ts(30)
      input.addData(EwmaEvent(1L, 13L, ts(35), Some(10.5)))
      q.processAllAvailable() // horizon ts(55): folds ts(20), ts(35)
      // ts(33) is ABOVE the watermark (ts(30) — Spark lets it through)
      // but BEHIND the folded frontier (ts(35)): beyond allowed lateness
      input.addData(EwmaEvent(1L, 14L, ts(33), Some(999.0)))
      q.processAllAvailable()
      val got = spark.table("anom_ordered_late_out").as[AnomPoint].collect()
        .map(p => p.event_id -> p).toMap
      assert(got(14L).late && got(14L).z.isEmpty && got(14L).is_anomaly === 0)
      assert(got(10L).mean === Some(10.0)) // folded exactly, unpolluted
      assert(!got(13L).late && got(13L).mean.nonEmpty)
    } finally q.stop()
  }

  test("batch path flags ANY reused per-key tie instead of corrupting the join-back") {
    val events = Seq(
      EwmaEvent(1L, 10L, ts(0), Some(10.0)),
      EwmaEvent(1L, 10L, ts(0), Some(10.0)), // exact redelivery
      EwmaEvent(1L, 11L, ts(10), Some(12.0)),
      // a REUSED id at a different timestamp: not a redelivery — but the
      // detector joins back on (key, tie), so it must flag, not fan out
      EwmaEvent(1L, 11L, ts(20), Some(50.0)))
    val all = AnomalyStream.detect(events.toDS()).collect()
    assert(all.length === events.length) // one row per input, no fan-out
    val dups = all.filter(_.late)
    assert(dups.map(_.event_id).sorted.toSeq === Seq(10L, 11L))
    // winners are deterministic: earliest ts per tie — the kept stream is
    // (10@ts0, 11@ts10), matching the dedup'd run exactly
    val got = all.filterNot(_.late).map(p => p.event_id -> p).toMap
    val clean = batchDetect(Seq(events(0), events(2)))
    assert(got(10L) === clean(10L))
    assert(got(11L) === clean(11L))
  }
}
