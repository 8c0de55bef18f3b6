package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

case class QuantEv(ts: Timestamp, event_type: String, value: java.lang.Double)

/** Hand-computed interpolated quantiles, null/NaN accounting, edge-bin
  * clamping, name mapping, and batch/stream parity for the windowed
  * quantile monitor.
  */
class QuantileStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    new Timestamp(1700000000000L + minute * 60000L)

  /** The estimator replayed by hand: bins of [lo, hi) in `numBins` equal
    * widths, t = ceil(q·n), least bin reaching t, linear interpolation.
    */
  private def refQuantile(values: Seq[Double], q: Double,
      lo: Double, hi: Double, numBins: Int): Double = {
    val width = (hi - lo) / numBins
    val bins = values.map(v =>
      math.max(0, math.min(numBins - 1, math.floor((v - lo) / width).toInt)))
    val counts = (0 until numBins).map(i => bins.count(_ == i).toLong)
    val t = math.ceil(q * values.size.toDouble)
    var cum = 0L
    var i = 0
    while (cum + counts(i) < t) { cum += counts(i); i += 1 }
    lo + width * (i + (t - cum) / counts(i).toDouble)
  }

  test("hand-computed p50/p90 per (window, group); null and NaN excluded") {
    // [0, 40) in 4 bins of width 10
    val vals = Seq(5.0, 6.0, 15.0, 25.0, 35.0)
    val events = vals.zipWithIndex.map { case (v, i) =>
      QuantEv(ts(i), "click", v)
    } ++ Seq(
      QuantEv(ts(5), "click", null),
      QuantEv(ts(6), "click", Double.NaN),
      QuantEv(ts(7), "view", 12.0))
    val got = QuantileStream.quantiles(events.toDF(), Seq(0.5, 0.9),
        lo = 0.0, hi = 40.0, numBins = 4)
      .as[(Timestamp, String, Long, Option[Double], Option[Double])]
      .collect().map(r => r._2 -> (r._3, r._4, r._5)).toMap
    val (n, p50, p90) = got("click")
    assert(n === 5L) // null and NaN are not observations
    assert(p50 === Some(refQuantile(vals, 0.5, 0.0, 40.0, 4)))
    assert(p90 === Some(refQuantile(vals, 0.9, 0.0, 40.0, 4)))
    // by hand: t50 = ceil(2.5) = 3 -> bin 1 (cum 2,3) -> 10 + 10*(3-2)/1 = 20
    assert(p50 === Some(20.0))
    assert(got("view")._2 === Some(refQuantile(Seq(12.0), 0.5, 0.0, 40.0, 4)))
  }

  test("an all-null/NaN (window, group) bucket surfaces with NULL quantiles") {
    val events = Seq(
      QuantEv(ts(0), "click", null),
      QuantEv(ts(1), "click", Double.NaN),
      QuantEv(ts(2), "view", 25.0))
    val got = QuantileStream.quantiles(events.toDF(), Seq(0.5),
        lo = 0.0, hi = 40.0, numBins = 4)
      .as[(Timestamp, String, Long, Option[Double])]
      .collect().map(r => r._2 -> (r._3, r._4)).toMap
    assert(got("click") === ((0L, None)))
    assert(got("view")._1 === 1L)
  }

  test("out-of-range values clamp into the edge bins") {
    val events = Seq(
      QuantEv(ts(0), "x", -99.0), // below lo -> bin 0
      QuantEv(ts(1), "x", 999.0)) // above hi -> last bin
    val got = QuantileStream.quantiles(events.toDF(), Seq(0.5),
        lo = 0.0, hi = 40.0, numBins = 4)
      .as[(Timestamp, String, Long, Option[Double])].collect()
    assert(got.head._3 === 2L)
    // t = ceil(0.5*2) = 1 -> bin 0, est = 0 + 10*(0 + 1/1) = 10 (the
    // clamped low outlier reads as "somewhere in the first bin")
    assert(got.head._4 === Some(10.0))
  }

  test("quantile names are injective percent renderings; bad fractions refuse") {
    assert(QuantileStream.qName(0.5) === "q_50")
    assert(QuantileStream.qName(0.9) === "q_90")
    assert(QuantileStream.qName(0.99) === "q_99")
    assert(QuantileStream.qName(0.999) === "q_99_9")
    assert(QuantileStream.qName(0.25) === "q_25")
    assert(QuantileStream.qName(0.05) === "q_5")
    assert(QuantileStream.qName(0.005) === "q_0_5") // no collision with 5%
    intercept[IllegalArgumentException](QuantileStream.qName(0.12345))
    intercept[IllegalArgumentException](
      QuantileStream.quantiles(Seq.empty[QuantEv].toDF(), Seq(0.5, 1.5),
        lo = 0.0, hi = 1.0))
  }

  test("streaming parity: MemoryStream emits the batch path's rows") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      QuantEv(ts(0), "click", 5.0), QuantEv(ts(1), "click", 15.0),
      QuantEv(ts(2), "click", 25.0), QuantEv(ts(3), "view", 35.0),
      QuantEv(ts(70), "click", 12.0)) // second hour
    val batch = QuantileStream.quantiles(events.toDF(), Seq(0.5, 0.99),
        lo = 0.0, hi = 40.0, numBins = 4)
      .as[(Timestamp, String, Long, Option[Double], Option[Double])]
      .collect().toSet

    val input = MemoryStream[QuantEv]
    val q = QuantileStream.quantiles(input.toDF(), Seq(0.5, 0.99),
        lo = 0.0, hi = 40.0, numBins = 4)
      .writeStream.format("memory").queryName("quant_out")
      .outputMode("append").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      // advance the watermark past both hours so windows close
      input.addData(QuantEv(ts(600), "wm", 1.0))
      q.processAllAvailable()
      val streamed = spark.table("quant_out")
        .as[(Timestamp, String, Long, Option[Double], Option[Double])]
        .collect().toSet
      assert(batch.subsetOf(streamed), s"batch $batch not in streamed $streamed")
    } finally q.stop()
  }

  test("log bins bound RELATIVE p999 error on a heavy tail; linear bins don't (bulk)") {
    // Pareto-ish fixture spanning six decades: v_i = (i/n)^-2, i=1..n —
    // p50=4, p99~9e3, p999~4.4e5. One 48-bin budget each way.
    val n = 2000
    val vals = (1 to n).map(i => math.pow(i.toDouble / n, -2.0))
    val exact = vals.sorted
    def exactQ(q: Double): Double = exact(math.ceil(q * n).toInt - 1)
    // ts(0) is 22:13:20 — minutes 0..39 stay inside the same hour window
    // (40+ would straddle 23:00 and split the fixture across two rows)
    val events = vals.zipWithIndex.map { case (v, i) =>
      QuantEv(ts(i % 40), "g", v)
    }
    val qs = Seq(0.5, 0.9, 0.99, 0.999)
    def estimates(df: org.apache.spark.sql.DataFrame): Map[Double, Double] = {
      val row = df.collect().head
      qs.zipWithIndex.map { case (q, i) => q -> row.getDouble(3 + i) }.toMap
    }
    val logEst = estimates(QuantileStream.logQuantiles(events.toDF(), qs,
      lo = 1.0, hi = 1e6, numBins = 48))
    val linEst = estimates(QuantileStream.quantiles(events.toDF(), qs,
      lo = 1.0, hi = 1e6, numBins = 48))
    // documented bound: relative error <= r - 1 at EVERY quantile depth
    val bound = math.pow(1e6, 1.0 / 48) - 1.0 // ~0.333
    qs.foreach { q =>
      val rel = math.abs(logEst(q) - exactQ(q)) / exactQ(q)
      assert(rel <= bound + 1e-9, f"log p$q rel error $rel%.3f > bound $bound%.3f")
    }
    // the linear grid under the same budget misreads the BULK by orders
    // of magnitude when data spans decades (one linear bin swallows the
    // first five decades) — the reason the log variant exists
    Seq(0.5, 0.9).foreach { q =>
      val relLin = math.abs(linEst(q) - exactQ(q)) / exactQ(q)
      val relLog = math.abs(logEst(q) - exactQ(q)) / exactQ(q)
      assert(relLin > 100 * math.max(relLog, 1e-6),
        f"expected linear ($relLin%.3f) >> log ($relLog%.3f) at q=$q")
    }
  }

  test("logQuantiles: clamping, null/NaN exclusion, and the lo>0 guard") {
    val events = Seq(
      QuantEv(ts(0), "g", 0.001), // below lo: clamps into bin 0
      QuantEv(ts(1), "g", 5.0),
      QuantEv(ts(2), "g", 2e7), // above hi: clamps into the last bin
      QuantEv(ts(3), "g", null),
      QuantEv(ts(4), "g", Double.NaN))
    val got = QuantileStream.logQuantiles(events.toDF(), Seq(0.5),
        lo = 1.0, hi = 1e6, numBins = 8)
      .as[(java.sql.Timestamp, String, Long, Option[Double])].collect()
    assert(got.length === 1)
    assert(got.head._3 === 3L) // null and NaN are not observations
    // t = ceil(0.5*3) = 2 -> the middle value's bin: 5.0 sits in bin
    // floor(log_? ...) — by construction bin 1 of 8 ([10^0.75, 10^1.5));
    // just pin that the estimate is finite and inside [lo edge of bin 0,
    // top edge], i.e. the clamp kept everything in-range
    got.head._4.foreach(e => assert(e >= 1.0 && e <= 1e6))
    intercept[IllegalArgumentException](
      QuantileStream.logQuantiles(events.toDF(), Seq(0.5), lo = 0.0, hi = 10.0))
  }

  test("logQuantiles streaming parity: MemoryStream emits the batch path's rows") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      QuantEv(ts(0), "click", 5.0), QuantEv(ts(1), "click", 50.0),
      QuantEv(ts(2), "click", 500.0), QuantEv(ts(3), "view", 3.5),
      QuantEv(ts(70), "click", 12.0))
    val batch = QuantileStream.logQuantiles(events.toDF(), Seq(0.5, 0.999),
        lo = 1.0, hi = 1000.0, numBins = 6)
      .as[(Timestamp, String, Long, Option[Double], Option[Double])]
      .collect().toSet
    val input = MemoryStream[QuantEv]
    val q = QuantileStream.logQuantiles(input.toDF(), Seq(0.5, 0.999),
        lo = 1.0, hi = 1000.0, numBins = 6)
      .writeStream.format("memory").queryName("logquant_out")
      .outputMode("append").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      input.addData(QuantEv(ts(600), "wm", 1.0))
      q.processAllAvailable()
      val streamed = spark.table("logquant_out")
        .as[(Timestamp, String, Long, Option[Double], Option[Double])]
        .collect().toSet
      assert(batch.subsetOf(streamed), s"batch $batch not in streamed $streamed")
    } finally q.stop()
  }
}
