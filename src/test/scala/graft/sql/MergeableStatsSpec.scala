package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MergeableStatsSpec extends SparkTestBase {
  import spark.implicits._

  lazy val rows = (0 until 300).map { i =>
    (s"t${i % 3}", (i % 50).toDouble, s"u${i % 40}", i % 4)
  }.toDF("etype", "value", "user", "slice")

  lazy val hs = new HistogramSketch(0.0, 50.0, 10)
  lazy val ms = new MergeableStats("value", "user", p = 6, hist = hs)

  test("merging per-slice sketches equals sketching everything at once") {
    val parts = (0 until 4).map(sl =>
      ms.sketch(rows.where($"slice" === sl), "etype"))
      .reduce(_ unionByName _)
    val merged = ms.report(ms.merge(parts, "etype"), "etype")
      .orderBy("etype").collect().toSeq
    val direct = ms.report(ms.sketch(rows, "etype"), "etype")
      .orderBy("etype").collect().toSeq
    assert(merged === direct)
  }

  test("report: exact count/sum, sane distinct estimate") {
    val rep = ms.report(ms.sketch(rows, "etype"), "etype")
      .as[(String, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(rep("t0")._2 === 100L)
    assert(rep("t0")._3 === rows.where($"etype" === "t0")
      .agg(round(sum($"value"), 6)).as[Double].head())
    // 40 distinct users touch every etype; p=6 (64 regs) is coarse but
    // must land within ±50%
    assert(rep("t0")._4 > 20.0 && rep("t0")._4 < 60.0)
  }
}
