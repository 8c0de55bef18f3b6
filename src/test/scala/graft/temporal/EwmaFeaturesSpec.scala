package graft.temporal

import graft.SparkTestBase

class EwmaFeaturesSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long, Double)]): Map[(Long, Long), Double] =
    new EwmaFeatures(alpha = 0.25)
      .transform(rows.toDF("user_id", "event_id", "ts_us", "value"))
      .select("user_id", "event_id", "ewma")
      .as[(Long, Long, Double)].collect()
      .map { case (u, e, w) => (u, e) -> w }.toMap

  test("recurrence matches the hand-computed chain; seeds at the first value") {
    val got = run(Seq(
      (1L, 10L, 100L, 8.0),
      (1L, 11L, 200L, 4.0),
      (1L, 12L, 300L, 12.0),
      (2L, 20L, 100L, 5.0)))
    assert(got((1L, 10L)) === 8.0)
    assert(got((1L, 11L)) === 0.25 * 4.0 + 0.75 * 8.0) // 7.0
    assert(got((1L, 12L)) === 0.25 * 12.0 + 0.75 * 7.0) // 8.25
    assert(got((2L, 20L)) === 5.0) // single-event key
  }

  test("order is (ts, event_id): ties break deterministically, arrival order irrelevant") {
    val base = Seq(
      (1L, 11L, 100L, 2.0), // same ts as event 10 — event_id orders them
      (1L, 10L, 100L, 6.0),
      (1L, 12L, 200L, 10.0))
    val a = run(base)
    val b = run(base.reverse)
    assert(a === b)
    assert(a((1L, 10L)) === 6.0)
    assert(a((1L, 11L)) === 0.25 * 2.0 + 0.75 * 6.0) // 5.0
    assert(a((1L, 12L)) === 0.25 * 10.0 + 0.75 * 5.0) // 6.25
  }

  test("one output row per input event") {
    val rows = (1L to 100L).map(i => (i % 7, i, i * 10L, i.toDouble))
    assert(run(rows).size === 100)
  }

  test("a null observation emits the running ewma and does NOT poison later steps") {
    // the old fold carried a*NULL + b*prev = NULL as `prev` forever: one
    // missing reading blanked the key's entire remaining ewma series.
    // pandas ewm convention: null rows surface the running value; the
    // smoother resumes on the next real observation
    val rows = Seq(
      (1L, 10L, 100L, Some(8.0)),
      (1L, 11L, 200L, None),
      (1L, 12L, 300L, Some(4.0)),
      (2L, 20L, 100L, None), // leading null: no value seen yet
      (2L, 21L, 200L, Some(5.0)))
      .toDF("user_id", "event_id", "ts_us", "value")
    val got = new EwmaFeatures(alpha = 0.25).transform(rows)
      .select("user_id", "event_id", "ewma")
      .as[(Long, Long, Option[Double])].collect()
      .map { case (u, e, w) => (u, e) -> w }.toMap
    assert(got((1L, 10L)) === Some(8.0))
    assert(got((1L, 11L)) === Some(8.0)) // running value, unchanged
    assert(got((1L, 12L)) === Some(0.25 * 4.0 + 0.75 * 8.0)) // resumed
    assert(got((2L, 20L)) === None) // nothing observed yet
    assert(got((2L, 21L)) === Some(5.0)) // seeds at first real value
  }

  test("segmented scan tracks the exact sequential fold to fp-assoc tolerance") {
    // dense multi-element segments: 400 events on one key, values chosen
    // so the smoother keeps moving. numBuckets = 1 is the purely
    // sequential gather semantics; a small targetSegment forces real
    // multi-segment splitting (the adaptive default would keep 400
    // events in ONE segment), so the carry recomposes affinely at
    // segment boundaries — same recurrence, last-ulp differences only.
    val rows = (1L to 400L).map(i =>
      (1L, i, i * 1000L, math.sin(i.toDouble) * 10.0 + (i % 13).toDouble))
    def runB(b: Int, tgt: Long): Map[Long, Double] =
      new EwmaFeatures(alpha = 0.25, numBuckets = b, targetSegment = tgt)
        .transform(rows.toDF("user_id", "event_id", "ts_us", "value"))
        .select("event_id", "ewma").as[(Long, Double)].collect().toMap
    val seq = runB(1, 8192L)
    // adaptive default at 400 events -> ONE segment -> BIT-identical
    assert(runB(1024, 8192L) === seq)
    val seg = runB(64, 8L) // ~50 segments of ~8
    assert(seq.size === 400 && seg.size === 400)
    rows.foreach { case (_, id, _, _) =>
      val (a, b) = (seq(id), seg(id))
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(a)),
        s"event $id: sequential $a vs segmented $b")
    }
  }

  test("hot key: one key's history spans many segments, no whole-history row") {
    // 50k events on a single key — the shape whose gather formulation
    // put the full history in one row. ceil(50000/8192) = 7 segments
    // under the adaptive default; the plan must stay correct:
    // spot-check the recurrence at the head and that every event got
    // exactly one row.
    val n = 50000
    val rows = (1L to n.toLong).map(i => (7L, i, i * 10L, (i % 97).toDouble))
    val got = new EwmaFeatures(alpha = 0.25)
      .transform(rows.toDF("user_id", "event_id", "ts_us", "value"))
      .select("event_id", "ewma").as[(Long, Double)].collect().toMap
    assert(got.size === n)
    assert(got(1L) === 1.0)
    assert(got(2L) === 0.25 * 2.0 + 0.75 * 1.0)
    // full independent replay (exact sequential) within fp-assoc tolerance
    var prev = Option.empty[Double]
    rows.foreach { case (_, id, _, v) =>
      val e = prev match {
        case None => v
        case Some(p) => 0.25 * v + 0.75 * p
      }
      prev = Some(e)
      assert(math.abs(got(id) - e) <= 1e-9 * math.max(1.0, math.abs(e)),
        s"event $id: expected ~$e got ${got(id)}")
    }
  }

  test("numBuckets max setting: the carry window's O(B^2) worst case is honored end to end") {
    // r13 admitted numBuckets up to 2^20 while the phase-3 carry window
    // materializes O(B^2/2) summaries per maximal hot key — a setting
    // the plan could never honor. The bound is now 2^12, and this test
    // PINS the worst case the bound promises: one key driven to the
    // full 4096 segments (8192 rows, targetSegment=2 -> B_k = 4096,
    // ~8M window structs) completes and tracks the sequential fold.
    val n = 8192
    val rows = (1L to n.toLong).map(i => (3L, i, i * 10L, (i % 31).toDouble))
    val got = new EwmaFeatures(alpha = 0.25, numBuckets = 1 << 12, targetSegment = 2L)
      .transform(rows.toDF("user_id", "event_id", "ts_us", "value"))
      .select("event_id", "ewma").as[(Long, Double)].collect().toMap
    assert(got.size === n)
    var prev = Option.empty[Double]
    rows.foreach { case (_, id, _, v) =>
      val e = prev match {
        case None => v
        case Some(p) => 0.25 * v + 0.75 * p
      }
      prev = Some(e)
      assert(math.abs(got(id) - e) <= 1e-9 * math.max(1.0, math.abs(e)),
        s"event $id: expected ~$e got ${got(id)}")
    }
    // the old admission is refused with the domain message, not honored
    val err = intercept[IllegalArgumentException] {
      new EwmaFeatures(numBuckets = 1 << 13)
    }
    assert(err.getMessage.contains("carry window"))
  }

  test("DateType order column buckets via unix_date instead of dying on a DATE cast") {
    // the r13 guard accepted DateType, then the BIGINT bucketing cast
    // failed at analysis with a generic error (r13 ADVICE)
    val rows = Seq(
      (1L, 10L, java.sql.Date.valueOf("2024-01-01"), 8.0),
      (1L, 11L, java.sql.Date.valueOf("2024-01-03"), 4.0),
      (1L, 12L, java.sql.Date.valueOf("2024-02-01"), 6.0),
      (2L, 20L, java.sql.Date.valueOf("2024-01-15"), 5.0))
      .toDF("user_id", "event_id", "d", "value")
    // multi-segment on purpose: bucketing arithmetic runs on the date's
    // integer image (days since epoch)
    val got = new EwmaFeatures(alpha = 0.25, orderCol = "d",
      numBuckets = 4, targetSegment = 1L)
      .transform(rows)
      .select("event_id", "ewma").as[(Long, Double)].collect().toMap
    assert(got(10L) === 8.0)
    assert(got(11L) === 0.25 * 4.0 + 0.75 * 8.0)
    assert(math.abs(got(12L) - (0.25 * 6.0 + 0.75 * got(11L))) < 1e-12)
    assert(got(20L) === 5.0)
  }

  test("alpha = 1.0 degenerates to the identity smoother") {
    // b = 0: every non-null observation IS the ewma; nulls emit the
    // previous value — exercises the Bc=0 edge of the affine summary
    // (a hot-key segment's composed multiplier hits exactly 0.0)
    val rows = Seq(
      (1L, 10L, 100L, Some(8.0)),
      (1L, 11L, 200L, None),
      (1L, 12L, 300L, Some(4.0)))
      .toDF("user_id", "event_id", "ts_us", "value")
    val got = new EwmaFeatures(alpha = 1.0, numBuckets = 64, targetSegment = 1L)
      .transform(rows)
      .select("event_id", "ewma").as[(Long, Option[Double])].collect().toMap
    assert(got(10L) === Some(8.0))
    assert(got(11L) === Some(8.0))
    assert(got(12L) === Some(4.0))
  }

  test("negative (pre-epoch) order values bucket correctly") {
    val rows = Seq(
      (1L, 10L, -300L, 8.0),
      (1L, 11L, -200L, 4.0),
      (1L, 12L, -100L, 12.0))
      .toDF("user_id", "event_id", "ts_us", "value")
    val got = new EwmaFeatures(alpha = 0.25, targetSegment = 1L, numBuckets = 4)
      .transform(rows)
      .select("event_id", "ewma").as[(Long, Double)].collect().toMap
    assert(got(10L) === 8.0)
    assert(math.abs(got(11L) - 7.0) < 1e-12)
    assert(math.abs(got(12L) - 8.25) < 1e-12)
  }

  test("timestamp-typed order column is accepted; string rejected") {
    val ts = Seq(
      (1L, 10L, "2024-01-01 00:00:00", 8.0),
      (1L, 11L, "2024-01-02 00:00:00", 4.0))
      .toDF("user_id", "event_id", "tss", "value")
      .select($"user_id", $"event_id", $"tss".cast("timestamp").as("ts_us"), $"value")
    val got = new EwmaFeatures(alpha = 0.25).transform(ts)
      .select("event_id", "ewma").as[(Long, Double)].collect().toMap
    assert(got(10L) === 8.0 && got(11L) === 7.0)
    val bad = Seq((1L, 10L, "x", 8.0)).toDF("user_id", "event_id", "ts_us", "value")
    val ex = intercept[IllegalArgumentException] {
      new EwmaFeatures(alpha = 0.25).transform(bad)
    }
    assert(ex.getMessage.contains("numeric/timestamp"))
  }

  test("huge order spans bucket without overflow (divide-first formula)") {
    // the multiply form B_k * (o - min) wraps Long once span > Long.Max /
    // B_k — reachable with a raw-id order column. 2^62 span, forced
    // multi-segment: values must still be the exact recurrence.
    val rows = Seq(
      (1L, 10L, 0L, 8.0),
      (1L, 11L, 1L << 62, 4.0))
      .toDF("user_id", "event_id", "ts_us", "value")
    val got = new EwmaFeatures(alpha = 0.25, numBuckets = 4, targetSegment = 1L)
      .transform(rows)
      .select("event_id", "ewma").as[(Long, Double)].collect().toMap
    assert(got(10L) === 8.0)
    assert(got(11L) === 0.25 * 4.0 + 0.75 * 8.0)
  }

  test("an order span that itself overflows BIGINT fails loudly") {
    val rows = Seq(
      (1L, 10L, Long.MinValue + 1, 8.0),
      (1L, 11L, Long.MaxValue - 1, 4.0))
      .toDF("user_id", "event_id", "ts_us", "value")
    val ex = intercept[Exception] {
      new EwmaFeatures(alpha = 0.25).transform(rows).collect()
    }
    val msg = ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("overflows BIGINT"), msg)
  }

  test("null order value fails loudly") {
    val rows = Seq(
      (1L, 10L, Some(100L), 8.0),
      (1L, 11L, None, 4.0))
      .toDF("user_id", "event_id", "ts_us", "value")
    val ex = intercept[Exception] {
      new EwmaFeatures(alpha = 0.25).transform(rows).collect()
    }
    assert(ex.getMessage.contains("null order value") ||
      Option(ex.getCause).exists(_.getMessage.contains("null order value")))
  }
}
