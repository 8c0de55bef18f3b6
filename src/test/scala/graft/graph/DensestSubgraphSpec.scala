package graft.graph

import graft.SparkTestBase

/** Planted-clique recovery, round-0 optimality on regular graphs, exact
  * density values, the loud round guard, and empties.
  */
class DensestSubgraphSpec extends SparkTestBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], maxRounds: Int = 16)
      : (Set[Long], Option[Double]) = {
    val rows = new DensestSubgraph(maxRounds)
      .run(edges.toDF("src", "dst"))
      .as[(Long, Double)].collect()
    (rows.map(_._1).toSet, rows.headOption.map(_._2))
  }

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for (i <- ids.indices; j <- (i + 1) until ids.size)
      yield (ids(i), ids(j))

  test("K8 plus a long chain: peeling recovers exactly the clique") {
    // K8 degree 7 > 2*avg = 4*68/49 ≈ 5.6, so the clique survives round
    // 1 while the chain (degree <= 2) peels; round 2 empties the graph
    // and the round-1 snapshot (28/8 = 3.5 > 68/49) wins the argmax
    val k8 = clique(1L to 8L)
    val chain = (10L until 50L).map(i => (i, i + 1))
    val (ids, dens) = run(k8 ++ chain)
    assert(ids === (1L to 8L).toSet)
    assert(dens === Some(3.5)) // 28 edges / 8 nodes
  }

  test("a single triangle: round 0 is already optimal") {
    val (ids, dens) = run(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    assert(ids === Set(1L, 2L, 3L))
    assert(dens === Some(1.0))
  }

  test("two disjoint K4s survive together (equal density, one snapshot)") {
    val (ids, dens) = run(clique(1L to 4L) ++ clique(11L to 14L))
    assert(ids === ((1L to 4L) ++ (11L to 14L)).toSet)
    assert(dens === Some(1.5)) // 12 edges / 8 nodes
  }

  test("depth past maxRounds fails loudly") {
    val edges = clique(1L to 6L) ++ (10L until 40L).map(i => (i, i + 1)) ++
      Seq((6L, 10L))
    val e = intercept[IllegalArgumentException] { run(edges, maxRounds = 1) }
    assert(e.getMessage.contains("maxRounds"))
  }

  test("empty input and self-loop-only input are clean") {
    assert(run(Seq.empty)._1 === Set.empty)
    assert(run(Seq((3L, 3L)))._1 === Set.empty)
  }
}
