package graft.graph

import graft.SparkTestBase

/** Hand-built BFS fixtures: chains, multi-seed minimum, unreachable
  * omission, seeds off the graph, the loud depth guard, and empties.
  */
class BfsDistanceSpec extends SparkTestBase {
  import spark.implicits._

  private def bfs(
      edges: Seq[(Long, Long)],
      seeds: Seq[Long],
      maxRounds: Int = 16): Seq[(Long, Long)] =
    new BfsDistance(maxRounds)
      .run(edges.toDF("src", "dst"), seeds.toDF("node"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq

  test("chain from one end: dist = position") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(bfs(edges, Seq(1L)) ===
      Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L)))
  }

  test("two seeds: every node takes the MIN hop count") {
    // chain 1-2-3-4-5 seeded at both ends: middle node reads 2, not 4
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(bfs(edges, Seq(1L, 5L)) ===
      Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 1L), (5L, 0L)))
  }

  test("unreachable component is OMITTED, not infinity") {
    val edges = Seq((1L, 2L), (10L, 11L))
    assert(bfs(edges, Seq(1L)) === Seq((1L, 0L), (2L, 1L)))
  }

  test("a seed absent from the edge list still reports dist 0") {
    val edges = Seq((1L, 2L))
    assert(bfs(edges, Seq(1L, 99L)) === Seq((1L, 0L), (2L, 1L), (99L, 0L)))
  }

  test("edges are undirected and duplicates/self-loops collapse") {
    // reversed orientation, a duplicate, and a self-loop: same answer
    val edges = Seq((2L, 1L), (1L, 2L), (3L, 2L), (3L, 3L))
    assert(bfs(edges, Seq(1L)) === Seq((1L, 0L), (2L, 1L), (3L, 2L)))
  }

  test("depth past maxRounds fails loudly; depth == maxRounds converges") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    // depth 3 with cap 3: the confirming empty round is free
    assert(bfs(edges, Seq(1L), maxRounds = 3).size === 4)
    val e = intercept[IllegalArgumentException] {
      bfs(edges, Seq(1L), maxRounds = 2)
    }
    assert(e.getMessage.contains("maxRounds"))
  }

  test("empty seeds and empty edges are clean") {
    assert(bfs(Seq((1L, 2L)), Seq.empty[Long]) === Seq.empty)
    assert(bfs(Seq.empty[(Long, Long)], Seq(7L)) === Seq((7L, 0L)))
    assert(bfs(Seq.empty[(Long, Long)], Seq.empty[Long]) === Seq.empty)
  }
}
