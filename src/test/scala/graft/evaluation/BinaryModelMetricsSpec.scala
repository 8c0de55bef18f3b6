package graft.evaluation

import graft.SparkTestBase

/** Mirrors FIXTURES.md A8 (reference BinaryModelMetricsSpec.scala:13-50 and
  * BinaryModelMetricComputerSpec.scala:9-41).
  */
class BinaryModelMetricsSpec extends SparkTestBase {
  import spark.implicits._

  // 10 pairs, 7 distinct scores
  lazy val scoreAndLabels = Seq(
    (0.8, 0.0), (0.7, 1.0), (0.3, 0.0), (0.9, 1.0), (0.6, 0.0),
    (0.6, 1.0), (0.6, 0.0), (0.8, 1.0), (0.2, 0.0), (0.5, 1.0))
    .toDF("score", "label")

  test("gains curve: 9 points unbinned (7 distinct + 2 endpoints)") {
    val m = new BinaryModelMetrics(scoreAndLabels)
    assert(m.gains().count() === 9)
  }

  test("gains curve: numBins=3 gives 6 points (4 chunks + 2 endpoints)") {
    val m = new BinaryModelMetrics(scoreAndLabels, 3)
    assert(m.gains().count() === 6)
  }

  test("gains endpoints are (0,0) and (1,1)") {
    val pts = new BinaryModelMetrics(scoreAndLabels).gains()
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(pts.contains((0.0, 0.0)) && pts.contains((1.0, 1.0)))
  }

  test("confusion counts at each threshold are exact") {
    val m = new BinaryModelMetrics(scoreAndLabels)
    val c = m.confusions.collect()
      .map(r => r.getDouble(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    // sorted desc: 0.9(1,0) 0.8(1,1) 0.7(1,0) 0.6(1,2) 0.5(1,0) 0.3(0,1) 0.2(0,1)
    assert(c(0.9) === ((1.0, 0.0)))
    assert(c(0.8) === ((2.0, 1.0)))
    assert(c(0.7) === ((3.0, 1.0)))
    assert(c(0.6) === ((4.0, 3.0)))
    assert(c(0.5) === ((5.0, 3.0)))
    assert(c(0.2) === ((5.0, 5.0)))
  }

  test("reach/lift computers match hand-computed confusion matrices") {
    // counts (tp=1, fp=0) and (tp=5, fp=2) of totals (p=5, n=5)
    assert(metrics.reach(1, 0, 5, 5) === 0.1)
    assert(metrics.lift(1, 0, 5, 5) === 2.0) // recall 0.2 / reach 0.1
    assert(metrics.reach(5, 2, 5, 5) === 0.7)
    assert(math.abs(metrics.lift(5, 2, 5, 5) - 1.0 / 0.7) < 1e-12)
    assert(metrics.reach(0, 0, 0, 0) === 1.0) // empty population
  }

  test("areaUnderROC matches Spark's BinaryClassificationMetrics") {
    val m = new BinaryModelMetrics(scoreAndLabels)
    val rdd = scoreAndLabels.rdd.map(r => (r.getDouble(0), r.getDouble(1)))
    val expected = new org.apache.spark.mllib.evaluation.BinaryClassificationMetrics(rdd)
      .areaUnderROC()
    assert(math.abs(m.areaUnderROC() - expected) < 1e-9)
  }

  test("areaUnderPR matches Spark's BinaryClassificationMetrics") {
    val m = new BinaryModelMetrics(scoreAndLabels)
    val rdd = scoreAndLabels.rdd.map(r => (r.getDouble(0), r.getDouble(1)))
    val expected = new org.apache.spark.mllib.evaluation.BinaryClassificationMetrics(rdd)
      .areaUnderPR()
    assert(math.abs(m.areaUnderPR() - expected) < 1e-6)
  }

  test("lift curve: first threshold has highest lift for a good classifier") {
    val m = new BinaryModelMetrics(scoreAndLabels)
    val lifts = m.lift().orderBy("reach").collect().map(_.getDouble(1))
    assert(lifts.head >= lifts.last)
  }

  test("RDD constructor compatibility") {
    val rdd = sc.parallelize(Seq((0.9, 1.0), (0.1, 0.0)))
    val m = new BinaryModelMetrics(rdd)
    assert(m.areaUnderROC() === 1.0)
  }

  test("trapezoid AUC equals the rank-sum (Mann-Whitney) identity with ties") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // discrete scores force ties; the two formulations must agree anyway
    val df = (0 until 400).map { i =>
      ((i * 7 % 10) / 10.0, if ((i * 13 % 17) < 6 != (i % 10 < 3)) 1.0 else 0.0)
    }.toDF("score", "label")
    val trap = new BinaryModelMetrics(df).areaUnderROC()
    val rows = df.as[(Double, Double)].collect()
    val byScore = rows.groupBy(_._1).toSeq.sortBy(_._1)
    var cum = 0.0
    var rp = 0.0
    byScore.foreach { case (_, g) =>
      val midrank = cum + (g.length + 1) / 2.0
      rp += g.count(_._2 == 1.0) * midrank
      cum += g.length
    }
    val np = rows.count(_._2 == 1.0).toDouble
    val nn = rows.length - np
    val ranksum = (rp - np * (np + 1.0) / 2.0) / (np * nn)
    assert(math.abs(trap - ranksum) < 1e-12, s"trap=$trap ranksum=$ranksum")
  }
}
