package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

case class DriftEv(ts: Timestamp, event_type: String, value: java.lang.Double)

/** Hand-computed PSI, batch/stream parity, null accounting, and the
  * edge-bin clamp for the windowed drift monitor.
  */
class DriftStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    new Timestamp(1700000000000L + minute * 60000L)

  private val uniform4 = Seq(0.25, 0.25, 0.25, 0.25)

  /** The reference fold: Laplace-smoothed shares vs refProbs, fixed bin
    * order — exactly the operator's arithmetic.
    */
  private def refPsi(counts: Seq[Long], ref: Seq[Double]): Double = {
    val n = counts.sum.toDouble
    counts.indices.map { i =>
      val p = (counts(i) + 0.5) / (n + 0.5 * counts.size)
      (p - ref(i)) * math.log(p / ref(i))
    }.reduce(_ + _)
  }

  test("hand-computed PSI per (window, group); nulls are not observations") {
    // bins over [0, 40) width 10: values 5->b0, 15->b1, 25->b2, 35->b3
    val events = Seq(
      DriftEv(ts(0), "click", 5.0),
      DriftEv(ts(1), "click", 5.0),
      DriftEv(ts(2), "click", 15.0),
      DriftEv(ts(3), "click", null), // not an observation
      DriftEv(ts(70), "click", 35.0), // second hour
      DriftEv(ts(5), "view", 25.0))
    val got = DriftStream.psi(events.toDF(), uniform4, lo = 0.0, hi = 40.0)
      .as[(Timestamp, String, Long, Option[Double])]
      .collect().map(r => (r._1.getTime, r._2) -> (r._3, r._4)).toMap
    val h0 = 1700000000000L - (1700000000000L % 3600000L)
    val (nC, psiC) = got((h0, "click"))
    assert(nC === 3L) // the null excluded
    assert(psiC === Some(refPsi(Seq(2L, 1L, 0L, 0L), uniform4)))
    assert(got((h0, "view"))._1 === 1L)
    assert(got((h0 + 3600000L, "click"))._2 ===
      Some(refPsi(Seq(0L, 0L, 0L, 1L), uniform4)))
  }

  test("NaN is excluded with null — never a phantom bin-0 observation") {
    // pre-fix, floor((NaN-lo)/width) was NaN and the non-ANSI double->int
    // cast turned it into bin 0: a NaN counted as a real low-end sample
    // (r14 ADVICE). Same events as the hand-computed case plus one NaN:
    // counts, n_events and psi must be IDENTICAL to the NaN-free fold.
    val events = Seq(
      DriftEv(ts(0), "click", 5.0),
      DriftEv(ts(1), "click", 15.0),
      DriftEv(ts(2), "click", Double.NaN),
      DriftEv(ts(3), "click", null))
    val got = DriftStream.psi(events.toDF(), uniform4, lo = 0.0, hi = 40.0)
      .as[(Timestamp, String, Long, Option[Double])].collect()
    assert(got.length === 1)
    assert(got.head._3 === 2L) // NaN and null both excluded
    assert(got.head._4 === Some(refPsi(Seq(1L, 1L, 0L, 0L), uniform4)))
  }

  test("an all-null/NaN (window, group) bucket still surfaces: n_events=0, psi NULL") {
    val events = Seq(
      DriftEv(ts(0), "click", null),
      DriftEv(ts(1), "click", Double.NaN),
      DriftEv(ts(2), "view", 25.0))
    val got = DriftStream.psi(events.toDF(), uniform4, lo = 0.0, hi = 40.0)
      .as[(Timestamp, String, Long, Option[Double])]
      .collect().map(r => r._2 -> (r._3, r._4)).toMap
    assert(got("click") === ((0L, None))) // row surfaces, no distribution
    assert(got("view")._1 === 1L)
  }

  test("out-of-range values clamp into the edge bins (the HistogramSketch convention)") {
    val events = Seq(
      DriftEv(ts(0), "x", -99.0), // below lo -> bin 0
      DriftEv(ts(1), "x", 999.0)) // above hi -> last bin
    val got = DriftStream.psi(events.toDF(), uniform4, lo = 0.0, hi = 40.0)
      .as[(Timestamp, String, Long, Option[Double])].collect()
    assert(got.head._3 === 2L)
    assert(got.head._4 === Some(refPsi(Seq(1L, 0L, 0L, 1L), uniform4)))
  }

  test("a matching distribution reads near zero; a shifted one reads broken") {
    val matching = (0 until 400).map(i =>
      DriftEv(ts(i % 50), "m", (i % 40).toDouble))
    val shifted = (0 until 400).map(i =>
      DriftEv(ts(i % 50), "s", 30.0 + (i % 10))) // all mass in the last bin
    val got = DriftStream.psi((matching ++ shifted).toDF(), uniform4, 0.0, 40.0)
      .as[(Timestamp, String, Long, Option[Double])]
      .collect().map(r => r._2 -> r._4.get).toMap
    assert(got("m") < 0.01, s"matching distribution read ${got("m")}")
    assert(got("s") > 0.25, s"shifted distribution read ${got("s")}")
  }

  test("streaming run produces the batch result (one code path)") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      DriftEv(ts(0), "click", 5.0), DriftEv(ts(1), "click", 15.0),
      DriftEv(ts(2), "view", 38.0), DriftEv(ts(65), "click", 22.0))
    val input = MemoryStream[DriftEv]
    val query = DriftStream.psi(input.toDF(), uniform4, 0.0, 40.0)
      .writeStream.format("memory").queryName("drift_out")
      .outputMode("complete").start()
    try {
      input.addData(events: _*)
      query.processAllAvailable()
      val streamed = spark.table("drift_out").collect().map(_.toString).sorted.toSeq
      val batch = DriftStream.psi(events.toDF(), uniform4, 0.0, 40.0)
        .collect().map(_.toString).sorted.toSeq
      assert(streamed === batch)
    } finally query.stop()
  }

  test("bad references refuse at wiring time") {
    val df = Seq(DriftEv(ts(0), "x", 1.0)).toDF()
    assert(intercept[IllegalArgumentException] {
      DriftStream.psi(df, Seq(0.5, 0.5, 0.0), 0.0, 1.0) // a zero prob
    }.getMessage.contains("strictly positive"))
    assert(intercept[IllegalArgumentException] {
      DriftStream.psi(df, Seq(0.5, 0.4), 0.0, 1.0) // does not sum to 1
    }.getMessage.contains("sum to 1"))
    assert(intercept[IllegalArgumentException] {
      DriftStream.psi(df, Seq(0.5, 0.5), 1.0, 1.0) // empty range
    }.getMessage.contains("hi > lo"))
  }
}
