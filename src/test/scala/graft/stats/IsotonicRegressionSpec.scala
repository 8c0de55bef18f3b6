package graft.stats

import graft.SparkTestBase

/** Distributed PAV against the textbook sequential algorithm and the
  * minimax characterization, partition invariance, tie pooling, and the
  * monotone/mass-preservation invariants on randomized data.
  */
class IsotonicRegressionSpec extends SparkTestBase {
  import spark.implicits._

  private def run(pts: Seq[(Double, Double)], parts: Int = 4): Map[Double, (Double, Long)] =
    new IsotonicRegression(parts)
      .fit(pts.toDF("x", "y"), "x", "y")
      .as[(Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3.toLong)).toMap

  /** Sequential reference PAV over pooled distinct-x points. */
  private def refPav(pts: Seq[(Double, Double)]): Map[Double, Double] = {
    val pooled = pts.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (x, rs) => (x, x, rs.map(_._2).sum, rs.size.toDouble) }
    val st = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Double, Double)]
    for (b <- pooled) {
      var cur = b
      while (st.nonEmpty && st.last._3 * cur._4 >= cur._3 * st.last._4) {
        val p = st.remove(st.size - 1)
        cur = (p._1, cur._2, p._3 + cur._3, p._4 + cur._4)
      }
      st += cur
    }
    (for {
      (xlo, xhi, sy, w) <- st
      (x, _) <- pts.distinct if x >= xlo && x <= xhi
    } yield x -> sy / w).toMap
  }

  /** Minimax characterization: f(i) = max_{j<=i} min_{k>=i} mean(j..k). */
  private def refMinimax(pts: Seq[(Double, Double)]): Map[Double, Double] = {
    val pooled = pts.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (x, rs) => (x, rs.map(_._2).sum, rs.size.toDouble) }
    val n = pooled.size
    def mean(j: Int, k: Int): Double = {
      val sy = (j to k).map(pooled(_)._2).sum
      val w = (j to k).map(pooled(_)._3).sum
      sy / w
    }
    (0 until n).map { i =>
      pooled(i)._1 ->
        (0 to i).map(j => (i until n).map(k => mean(j, k)).min).max
    }.toMap
  }

  test("textbook fixture: [1,3,2,4] -> [1, 2.5, 2.5, 4]") {
    val pts = Seq((1.0, 1.0), (2.0, 3.0), (3.0, 2.0), (4.0, 4.0))
    val got = run(pts)
    assert(got.view.mapValues(_._1).toMap ===
      Map(1.0 -> 1.0, 2.0 -> 2.5, 3.0 -> 2.5, 4.0 -> 4.0))
  }

  test("decreasing input collapses to the global mean") {
    val pts = Seq((1.0, 5.0), (2.0, 3.0), (3.0, 1.0))
    val got = run(pts)
    got.values.foreach { case (f, _) => assert(math.abs(f - 3.0) < 1e-15) }
  }

  test("exact x-ties pool before PAV, with pooled weight reported") {
    val pts = Seq((1.0, 0.0), (1.0, 1.0), (2.0, 0.0), (2.0, 0.0))
    // pooled: x=1 mean .5 (w 2), x=2 mean 0 (w 2) -> violation -> both .25
    val got = run(pts)
    assert(got === Map(1.0 -> ((0.25, 2L)), 2.0 -> ((0.25, 2L))))
  }

  test("matches the sequential reference AND the minimax form on random data") {
    val rnd = new scala.util.Random(11)
    val pts = (1 to 200).map { _ =>
      (rnd.nextInt(40).toDouble, rnd.nextInt(2).toDouble)
    }
    val got = run(pts).view.mapValues(_._1).toMap
    val pav = refPav(pts)
    val mm = refMinimax(pts)
    assert(got.keySet === pav.keySet)
    for (x <- got.keySet) {
      assert(math.abs(got(x) - pav(x)) < 1e-12, s"pav x=$x")
      assert(math.abs(got(x) - mm(x)) < 1e-9, s"minimax x=$x")
    }
  }

  test("partition-count-proof with integer-valued y") {
    val rnd = new scala.util.Random(13)
    val pts = (1 to 500).map { _ =>
      (rnd.nextInt(60).toDouble / 10.0, rnd.nextInt(2).toDouble)
    }
    val a = run(pts, parts = 1)
    val b = run(pts, parts = 7)
    val c = run(pts, parts = 32)
    assert(a === b)
    assert(a === c)
  }

  test("fit is non-decreasing and preserves weighted mass") {
    val rnd = new scala.util.Random(17)
    val pts = (1 to 300).map(i => (i.toDouble % 50, rnd.nextDouble()))
    val got = run(pts).toSeq.sortBy(_._1)
    got.sliding(2).foreach {
      case Seq((_, (f1, _)), (_, (f2, _))) => assert(f1 <= f2 + 1e-12)
      case _ =>
    }
    val mass = got.map { case (_, (f, w)) => f * w }.sum
    assert(math.abs(mass - pts.map(_._2).sum) < 1e-9)
  }

  test("empty input is clean") {
    assert(run(Seq.empty).isEmpty)
  }
}
