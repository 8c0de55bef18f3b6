package graft.graph

import graft.SparkTestBase

/** Hand-built coreness fixtures (K4 ∪ chain, triangle + pendant cascade),
  * consistency with fixed-k [[KCore]] membership, the loud
  * non-convergence guard, and degenerate inputs.
  */
class CorenessSpec extends SparkTestBase {
  import spark.implicits._

  private def coreness(edges: Seq[(Long, Long)], maxRounds: Int = 24) =
    new Coreness(maxRounds).run(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq

  test("K4 plus a chain: clique nodes read 3, chain nodes read 1") {
    // K4 on 1-4; chain 10-11-12-13 (disconnected): every K4 node sits in
    // the 3-core, every pure-chain node only in the 1-core (any subgraph
    // of a path has an endpoint of degree 1)
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val chain = Seq((10L, 11L), (11L, 12L), (12L, 13L))
    assert(coreness(k4 ++ chain) ===
      Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L),
        (10L, 1L), (11L, 1L), (12L, 1L), (13L, 1L)))
  }

  test("triangle with a pendant chain: the h-index cascade refines past degree") {
    // 1-2-3 triangle, chain 3-4-5: node 4 has RAW degree 2 but coreness 1
    // (5 peels, then 4) — a one-shot h-index of degrees would leave 4 at
    // 2, so this pins that the iteration actually runs to the fixpoint
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    assert(coreness(edges) ===
      Seq((1L, 2L), (2L, 2L), (3L, 2L), (4L, 1L), (5L, 1L)))
  }

  test("coreness agrees with fixed-k KCore membership on a mixed graph") {
    import org.apache.spark.sql.functions.col
    // K4 sharing node 4 with a triangle 4-5-6, plus pendant 6-7
    val edges = (for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)) ++
      Seq((4L, 5L), (5L, 6L), (4L, 6L), (6L, 7L))
    val cv = coreness(edges).toMap
    for (k <- 1 to 3) {
      val members = new KCore(k).vertices(edges.toDF("src", "dst"))
        .select(col("id")).as[Long].collect().toSet
      assert(cv.filter(_._2 >= k).keySet === members,
        s"coreness >= $k must equal the $k-core membership")
    }
  }

  test("orientation, duplicates, and self-loops never double-count a degree") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (1L, 3L),
      (2L, 3L), (2L, 3L))
    // clean graph = triangle 1-2-3: all coreness 2
    assert(coreness(messy) === Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("refinement deeper than maxRounds refuses loudly; depth == maxRounds converges") {
    // chain 1..8: the h-index cascade walks inward one node per round
    // from each end — depth 3 on this length (measured), so maxRounds=3
    // converges and maxRounds=2 refuses
    val chain = (1L to 7L).map(i => (i, i + 1))
    assert(coreness(chain, maxRounds = 12).forall(_._2 == 1L))
    val depth = {
      // measure: find the smallest maxRounds that converges
      (1 to 12).find(r =>
        scala.util.Try(coreness(chain, maxRounds = r)).isSuccess).get
    }
    assert(depth >= 2, s"fixture too shallow (depth $depth) to exercise the cap")
    val e = intercept[IllegalArgumentException](coreness(chain, maxRounds = depth - 1))
    assert(e.getMessage.contains("did not converge"))
  }

  test("empty input yields an empty frame with the contract schema") {
    val got = new Coreness().run(Seq.empty[(Long, Long)].toDF("src", "dst"))
    assert(got.columns.toSeq === Seq("id", "coreness"))
    assert(got.count() === 0L)
  }
}
