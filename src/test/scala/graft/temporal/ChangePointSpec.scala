package graft.temporal

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

/** Hand CUSUM fixtures: a level shift, a flat series, per-group
  * independence, and the earliest-tie rule.
  */
class ChangePointSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Double)])
      : Map[String, (Long, Double, Long)] =
    ChangePoint.detect(rows.toDF("g", "t", "x"), Seq("g"), col("t"), col("x"))
      .as[(String, Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("level shift: the change point lands on the last pre-shift day") {
    // mean 5; S = -5,-10,-15,-10,-5,0 -> max |S| = 15 at t=3
    val rows = (1L to 6L).map(t => ("a", t, if (t <= 3) 0.0 else 10.0))
    assert(run(rows)("a") === ((3L, 15.0, 6L)))
  }

  test("flat series: statistic 0 at the earliest day") {
    val rows = (1L to 5L).map(t => ("a", t, 7.0))
    assert(run(rows)("a") === ((1L, 0.0, 5L)))
  }

  test("groups are independent") {
    val rows = (1L to 6L).map(t => ("a", t, if (t <= 3) 0.0 else 10.0)) ++
      (1L to 4L).map(t => ("b", t, if (t <= 1) 8.0 else 0.0))
    val got = run(rows)
    assert(got("a")._1 === 3L)
    // b: mean 2; S = 6, 4, 2, 0 -> max 6 at t=1
    assert(got("b") === ((1L, 6.0, 4L)))
  }

  test("symmetric tie breaks to the earliest day") {
    // mean 5; S = 5, 0, -5, 0 -> |S| ties 5 at t=1 and t=3
    val rows = Seq(("a", 1L, 10.0), ("a", 2L, 0.0), ("a", 3L, 0.0), ("a", 4L, 10.0))
    assert(run(rows)("a")._1 === 1L)
  }

  test("empty input is clean") {
    assert(run(Seq.empty).isEmpty)
  }
}
