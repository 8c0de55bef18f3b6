package graft.graph

import graft.SparkTestBase

/** Hand-built peeling cascades, orientation invariance, the loud
  * non-convergence guard, and degenerate inputs for the k-core operator.
  */
class KCoreSpec extends SparkTestBase {
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int, maxRounds: Int = 12) =
    new KCore(k, maxRounds).vertices(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq

  test("triangle with a pendant chain: the chain peels in cascade, the triangle stays") {
    // 1-2-3 triangle, chain 3-4-5-6: at k=2 node 6 peels, THEN 5, THEN 4
    // (a three-round cascade — the fixpoint, not one-shot degree filter)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    assert(core(edges, k = 2) === Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    // one-shot degree filtering would have KEPT 4 and 5 (degree 2 in the
    // raw graph) — pin that the cascade actually ran
    val oneShot = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).filter(_._2.size >= 2).keySet
    assert(oneShot.contains(4L) && oneShot.contains(5L))
  }

  test("k above the densest core empties; k = 1 keeps every non-isolated node") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    assert(core(edges, k = 3).isEmpty) // triangle is a 2-core, not a 3-core
    assert(core(edges ++ Seq((3L, 4L)), k = 1).map(_._1) === Seq(1L, 2L, 3L, 4L))
  }

  test("orientation, duplicates, and self-loops never double-count a degree") {
    // (1,2) twice + (2,1): still ONE edge; self-loop (3,3) contributes
    // nothing, so 3's only real edge is to the triangle's node 1
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (1L, 3L),
      (2L, 4L), (4L, 1L), (2L, 4L))
    // 1-2, 1-3, 1-4, 2-4: k=2 core = {1, 2, 4} (3 has degree 1)
    assert(core(messy, k = 2) === Seq((1L, 2L), (2L, 2L), (4L, 2L)))
  }

  test("a cascade deeper than maxRounds refuses loudly") {
    // pure chain 1..6: at k=2 it peels one endpoint pair per round
    val chain = (1L to 5L).map(i => (i, i + 1))
    val e = intercept[IllegalArgumentException](core(chain, k = 2, maxRounds = 1))
    assert(e.getMessage.contains("did not converge"))
    assert(core(chain, k = 2, maxRounds = 12).isEmpty) // enough rounds: empty core
  }

  test("peeling depth EQUAL to maxRounds converges (r15 ADVICE off-by-one)") {
    // chain 1..6 peels in exactly 3 edge-removing rounds at k=2 (ends,
    // then 2-5, then 3-4); the confirming round (equal edge count) is
    // free per the doc contract — so maxRounds = 3 must converge and
    // maxRounds = 2 must refuse
    val chain = (1L to 5L).map(i => (i, i + 1))
    assert(core(chain, k = 2, maxRounds = 3).isEmpty)
    val e = intercept[IllegalArgumentException](core(chain, k = 2, maxRounds = 2))
    assert(e.getMessage.contains("did not converge"))
  }

  test("empty input yields an empty frame with the contract schema") {
    val got = new KCore(2).vertices(Seq.empty[(Long, Long)].toDF("src", "dst"))
    assert(got.columns.toSeq === Seq("id", "core_degree"))
    assert(got.count() === 0L)
  }
}
