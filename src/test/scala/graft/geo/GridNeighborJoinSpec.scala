package graft.geo

import graft.SparkTestBase

class GridNeighborJoinSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic pseudo-random points, including cross-cell and
  // boundary-distance cases
  lazy val pts = (0 until 200).map { i =>
    (i.toLong, (i * 37 % 101) / 10.0, (i * 53 % 97) / 10.0)
  }.toDF("id", "x", "y")

  private def brute(eps: Double): Set[(Long, Long)] = {
    val rows = pts.as[(Long, Double, Double)].collect()
    (for {
      a <- rows; b <- rows if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= eps * eps
    } yield (a._1, b._1)).toSet
  }

  test("complete and exact vs brute force (each pair exactly once)") {
    val eps = 0.7
    val out = new GridNeighborJoin(eps).pairs(pts)
      .as[(Long, Long, Double)].collect()
    assert(out.map(r => (r._1, r._2)).toSet === brute(eps))
    assert(out.length === out.map(r => (r._1, r._2)).distinct.length,
      "a pair was emitted more than once")
  }

  test("boundary distance is inclusive") {
    val two = Seq((1L, 0.0, 0.0), (2L, 3.0, 4.0)).toDF("id", "x", "y")
    // dist = 5 exactly
    assert(new GridNeighborJoin(5.0).pairs(two).count() === 1)
    assert(new GridNeighborJoin(4.999).pairs(two).count() === 0)
  }

  test("negative coordinates land in the right cells") {
    val near = Seq((1L, -0.1, -0.1), (2L, 0.1, 0.1)).toDF("id", "x", "y")
    assert(new GridNeighborJoin(0.5).pairs(near).count() === 1)
  }

  test("duplicate coordinates pair up but never self-pair") {
    val dup = Seq((1L, 2.0, 2.0), (2L, 2.0, 2.0)).toDF("id", "x", "y")
    val out = new GridNeighborJoin(1.0).pairs(dup)
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq === Seq((1L, 2L, 0.0)))
  }
}
