package graft.stats

import graft.SparkTestBase

/** CUPED algebra against an in-memory reference, the variance-contraction
  * guarantee on a correlated fixture, the degenerate-covariate fallback,
  * and empties.
  */
class CupedSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(String, Double, Double)]) =
    Cuped.adjust(rows.toDF("variant", "x", "y"), "variant", "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap

  /** In-memory reference with the identical moment algebra. */
  private def ref(rows: Seq[(String, Double, Double)])
      : Map[String, (Long, Double, Double, Double, Double, Double)] = {
    val n = rows.size.toDouble
    val sx = rows.map(_._2).sum; val sy = rows.map(_._3).sum
    val sxy = rows.map(r => r._2 * r._3).sum
    val sxx = rows.map(r => r._2 * r._2).sum
    val theta = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    val xbar = sx / n
    rows.groupBy(_._1).map { case (v, rs) =>
      val m = rs.size.toDouble
      val vsx = rs.map(_._2).sum; val vsy = rs.map(_._3).sum
      val vsxy = rs.map(r => r._2 * r._3).sum
      val vsxx = rs.map(r => r._2 * r._2).sum
      val vsyy = rs.map(r => r._3 * r._3).sum
      val cyy = vsyy - vsy * vsy / m
      val cxy = vsxy - vsx * vsy / m
      val cxx = vsxx - vsx * vsx / m
      v -> ((rs.size.toLong, vsy / m,
        (vsy - theta * (vsx - m * xbar)) / m,
        cyy / (m - 1),
        (cyy - 2 * theta * cxy + theta * theta * cxx) / (m - 1),
        theta))
    }
  }

  private val fixture = Seq(
    ("A", 10.0, 25.0), ("A", 12.0, 30.0), ("A", 8.0, 18.0), ("A", 15.0, 33.0),
    ("B", 11.0, 29.0), ("B", 9.0, 22.0), ("B", 14.0, 35.0), ("B", 7.0, 16.0))

  test("matches the in-memory moment algebra on both arms") {
    val got = run(fixture)
    val want = ref(fixture)
    assert(got.keySet === want.keySet)
    for ((v, (n, my, mc, vy, vc, th)) <- want) {
      val r = got(v)
      assert(r.getLong(1) === n)
      assert(math.abs(r.getDouble(2) - my) < 1e-10, s"$v mean_y")
      assert(math.abs(r.getDouble(3) - mc) < 1e-10, s"$v mean_y_cuped")
      assert(math.abs(r.getDouble(4) - vy) < 1e-9, s"$v var_y")
      assert(math.abs(r.getDouble(5) - vc) < 1e-9, s"$v var_y_cuped")
      assert(math.abs(r.getDouble(6) - th) < 1e-10, s"$v theta")
    }
  }

  test("a strongly predictive covariate contracts the variance") {
    // y = 3x + small noise: CUPED should remove nearly all variance
    val rows = (1 to 40).map { i =>
      val x = (i % 10).toDouble + 1
      (if (i % 2 == 0) "A" else "B", x, 3 * x + (i % 3) * 0.01)
    }
    val got = run(rows)
    for (v <- Seq("A", "B")) {
      val r = got(v)
      assert(r.getDouble(5) < r.getDouble(4) * 0.01,
        s"$v: var_y_cuped ${r.getDouble(5)} !<< var_y ${r.getDouble(4)}")
    }
  }

  test("a perfectly linear covariate drives the adjusted variance to ~0") {
    val rows = Seq(("A", 1.0, 2.0), ("A", 2.0, 4.0), ("A", 3.0, 6.0),
      ("B", 4.0, 8.0), ("B", 5.0, 10.0), ("B", 6.0, 12.0))
    val got = run(rows)
    assert(math.abs(got("A").getDouble(6) - 2.0) < 1e-12) // theta = slope
    assert(math.abs(got("A").getDouble(5)) < 1e-18)
    assert(math.abs(got("B").getDouble(5)) < 1e-18)
  }

  test("a CONSTANT covariate falls back to theta = 0 (no adjustment)") {
    val rows = Seq(("A", 2.0, 5.0), ("A", 2.0, 7.0),
      ("B", 2.0, 6.0), ("B", 2.0, 9.0))
    val got = run(rows)
    for (v <- Seq("A", "B")) {
      assert(got(v).getDouble(6) === 0.0, s"$v theta")
      assert(got(v).getDouble(3) === got(v).getDouble(2), s"$v mean unchanged")
      assert(got(v).getDouble(5) === got(v).getDouble(4), s"$v var unchanged")
    }
  }

  test("single-unit arm reports null variances; empty input is clean") {
    val got = run(Seq(("A", 1.0, 2.0), ("B", 3.0, 4.0), ("B", 5.0, 6.0)))
    assert(got("A").isNullAt(4) && got("A").isNullAt(5))
    assert(!got("B").isNullAt(4))
    assert(run(Seq.empty).isEmpty)
  }
}
