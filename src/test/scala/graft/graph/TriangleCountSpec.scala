package graft.graph

import graft.SparkTestBase

class TriangleCountSpec extends SparkTestBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    TriangleCount.perNode(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("counts the planted triangles; squares and pendants contribute none") {
    // triangle {1,2,3}; square {10,11,12,13} (no diagonal); pendant 4-1
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L),
      (4L, 1L))
    assert(run(edges) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("K4 gives every node 3 triangles; duplicates/orientation/self-loops absorbed") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val noisy = k4 ++ k4.map { case (a, b) => (b, a) } ++ Seq((1L, 1L), (2L, 2L))
    assert(run(noisy) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("hub wedge work is bounded by orientation: star graph has zero triangles") {
    // a 200-leaf star: naive wedge generation at the hub would make 19900
    // wedges; the (deg, id) orientation points every edge AT the hub, so
    // the hub has out-degree 0 and the join generates none
    val star = (1L to 200L).map(i => (0L, i))
    assert(run(star) === Map.empty[Long, Long])
  }

  test("triangle sharing an edge with another triangle counts both") {
    // {1,2,3} and {2,3,4} share edge (2,3)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L), (3L, 4L))
    assert(run(edges) === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }
}
