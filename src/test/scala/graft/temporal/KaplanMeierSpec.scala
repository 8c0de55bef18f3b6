package graft.temporal

import graft.SparkTestBase

class KaplanMeierSpec extends SparkTestBase {
  import spark.implicits._

  // the textbook worked example: events at t=1 (d=1, n=5) and t=3
  // (d=2, n=3); a censored subject at t=2 leaves the risk set between
  // them; one subject censored at t=4
  lazy val subjects = Seq(
    (1L, true), (2L, false), (3L, true), (3L, true), (4L, false))
    .toDF("duration", "event")

  private lazy val out = new KaplanMeier().survival(subjects)
    .as[(Long, Long, Long, Double)].collect()
    .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("product-limit steps at event times with censor-adjusted risk sets") {
    assert(out.keySet === Set(1L, 3L))       // t=2,4 are censor-only
    val (n1, d1, s1) = out(1L)
    assert(n1 === 5L && d1 === 1L)
    assert(math.abs(s1 - 4.0 / 5.0) < 1e-12)
    val (n3, d3, s3) = out(3L)
    assert(n3 === 3L && d3 === 2L)           // the t=2 censor left the risk set
    assert(math.abs(s3 - (4.0 / 5.0) * (1.0 / 3.0)) < 1e-12)
  }

  test("no censoring degenerates to the empirical survivor function") {
    val all = Seq((1L, true), (2L, true), (2L, true), (5L, true))
      .toDF("duration", "event")
    val s = new KaplanMeier().survival(all)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(math.abs(s(1L) - 3.0 / 4.0) < 1e-12)
    assert(math.abs(s(2L) - 1.0 / 4.0) < 1e-12)
    assert(math.abs(s(5L) - 0.0) < 1e-12)    // everyone gone
  }

  test("everyone censored -> no survival steps at all") {
    val cens = Seq((1L, false), (2L, false)).toDF("duration", "event")
    assert(new KaplanMeier().survival(cens).count() === 0)
  }
}
