package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.EwmaStream.{EwmaEvent, EwmaPoint}

/** The streaming smoother must compute the SAME recurrence as the batch
  * [[graft.temporal.EwmaFeatures]] on a per-key-monotone stream — bit for
  * bit, across micro-batch boundaries — and must flag (never silently
  * fold or drop) events behind the folded frontier.
  */
class EwmaStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    new Timestamp(1700000000000L + minute * 60000L)

  private val batch1 = Seq(
    EwmaEvent(1L, 10L, ts(0), Some(8.0)),
    EwmaEvent(1L, 11L, ts(10), Some(4.0)),
    EwmaEvent(2L, 20L, ts(5), None), // leading null: nothing seen yet
    EwmaEvent(2L, 21L, ts(15), Some(5.0)))
  private val batch2 = Seq(
    EwmaEvent(1L, 12L, ts(20), Some(12.0)), // state carries across batches
    EwmaEvent(1L, 13L, ts(30), None),       // null emits running value
    EwmaEvent(2L, 22L, ts(25), Some(9.0)))

  private def runStream(batches: Seq[Seq[EwmaEvent]]): Map[Long, (Option[Double], Boolean)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EwmaEvent]
    val q = EwmaStream.smooth(input.toDS(), alpha = 0.25).writeStream
      .format("memory").queryName("ewma_stream_out").outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table("ewma_stream_out").as[EwmaPoint].collect()
        .map(p => p.event_id -> (p.ewma, p.late)).toMap
    } finally q.stop()
  }

  test("per-key-monotone stream matches batch EwmaFeatures bit-for-bit across micro-batches") {
    val got = runStream(Seq(batch1, batch2))
    val batchDf = (batch1 ++ batch2)
      .map(e => (e.user_id, e.event_id, e.ts.getTime, e.value))
      .toDF("user_id", "event_id", "ts_us", "value")
    val want = new graft.temporal.EwmaFeatures(alpha = 0.25)
      .transform(batchDf)
      .select($"event_id", $"ewma").as[(Long, Option[Double])].collect().toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (id, w) =>
      assert(got(id) === ((w, false)), s"event $id: stream ${got(id)} vs batch $w")
    }
    // spot checks: the recurrence carried across the batch boundary
    assert(got(12L)._1 === Some(0.25 * 12.0 + 0.75 * (0.25 * 4.0 + 0.75 * 8.0)))
    assert(got(13L)._1 === got(12L)._1) // null emits running value
  }

  test("an event behind the folded frontier is FLAGGED late, state untouched") {
    val lateBatch = Seq(EwmaEvent(1L, 9L, ts(5), Some(100.0))) // behind ts(10)
    val after = Seq(EwmaEvent(1L, 14L, ts(40), Some(4.0)))
    val got = runStream(Seq(batch1, lateBatch, after))
    assert(got(9L) === ((None, true)))
    // the smoother continued from the pre-late state (ewma after event 11)
    val e11 = 0.25 * 4.0 + 0.75 * 8.0
    assert(got(14L) === ((Some(0.25 * 4.0 + 0.75 * e11), false)))
  }

  test("idle keys are evicted; a returning key re-seeds") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EwmaEvent]
    // tight idle gap (60 s) and no watermark delay so eviction is provable
    val q = EwmaStream.smooth(input.toDS(), alpha = 0.25,
      watermark = "0 seconds", idleGapSeconds = 60L).writeStream
      .format("memory").queryName("ewma_evict_out").outputMode("append").start()
    try {
      input.addData(EwmaEvent(1L, 1L, ts(0), Some(8.0)))
      q.processAllAvailable()
      // advance the watermark far past key 1's idle horizon via another key
      input.addData(EwmaEvent(2L, 2L, ts(100), Some(1.0)))
      q.processAllAvailable()
      // key 1 returns: state was evicted, so it RE-SEEDS at its value
      input.addData(EwmaEvent(1L, 3L, ts(101), Some(2.0)))
      q.processAllAvailable()
      val got = spark.table("ewma_evict_out").as[EwmaPoint].collect()
        .map(p => p.event_id -> p.ewma).toMap
      assert(got(1L) === Some(8.0))
      assert(got(3L) === Some(2.0), "expected a re-seed, not 0.25*2 + 0.75*8")
    } finally q.stop()
  }
}
