package graft.graph

import graft.SparkTestBase

/** Hand-walked synchronous rounds, tie-break determinism, two-community
  * separation, messy-input normalization, and degenerate inputs for the
  * fixed-round label propagation.
  */
class LabelPropagationSpec extends SparkTestBase {
  import spark.implicits._

  private def lpa(edges: Seq[(Long, Long)], rounds: Int) =
    new LabelPropagation(rounds).run(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq

  test("two triangles joined by one bridge separate into their min labels") {
    // triangle A: 1-2-3; triangle B: 10-11-12; bridge 3-10
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
    val got = lpa(edges, rounds = 5).toMap
    // hand-traced: community A converges to label 1; community B to
    // label 3 — the bridge node's label invades B via round-2 ties
    // (11/12 tie {3, 10} -> 3) and then holds as B's majority. The two
    // communities stay DISTINCT; the bridge endpoint 3 itself stays in A.
    assert(got(1L) === 1L && got(2L) === 1L && got(3L) === 1L)
    assert(got(10L) === 3L && got(11L) === 3L && got(12L) === 3L)
  }

  test("one synchronous round is the hand-walked neighbor vote") {
    // star: center 5 with leaves 1, 2, 3 — after ONE sync round the
    // center adopts min neighbor label 1 (all counts tie at 1) and each
    // leaf adopts 5 (its only neighbor)
    val edges = Seq((5L, 1L), (5L, 2L), (5L, 3L))
    assert(lpa(edges, rounds = 1) ===
      Seq((1L, 5L), (2L, 5L), (3L, 5L), (5L, 1L)))
  }

  test("tie-break is the SMALLEST label among max-count candidates") {
    // node 0 sees labels 7 and 9 once each after init (neighbors 7, 9):
    // one round gives 0 -> 7, not 9
    val edges = Seq((0L, 7L), (0L, 9L))
    val got = lpa(edges, rounds = 1).toMap
    assert(got(0L) === 7L)
    // and frequency beats smallness: 0 sees {3} twice via distinct
    // neighbors relabeled... build directly: neighbors 2 and 4 both
    // carry label 2 after round 1 of a triangle 2-4-2? — instead pin via
    // two rounds on a path: 1-2, 2-3, 3-4 (round 1: 2->1, 3->2, ...)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val r1 = lpa(path, rounds = 1).toMap
    assert(r1 === Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("orientation, duplicates, and self-loops never double-count a vote") {
    // (1,2) three ways + self-loop: one real edge 1-2 plus 2-3 — node
    // 2's round-1 vote is a TIE between labels 1 and 3 -> 1; were the
    // duplicate (1,2) rows kept, label 1 would win 2:1 (same answer) but
    // node 1's count of label 2 would be 3 — pin the full row set
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 2L), (2L, 3L))
    assert(lpa(messy, rounds = 1) === Seq((1L, 2L), (2L, 1L), (3L, 2L)))
  }

  test("fixed rounds are the contract: round counts differ, both deterministic") {
    // bipartite 2-cycle: sync LPA on a single edge oscillates —
    // round 1 swaps labels, round 2 swaps back; both are well-defined
    val edge = Seq((1L, 2L))
    assert(lpa(edge, rounds = 1) === Seq((1L, 2L), (2L, 1L)))
    assert(lpa(edge, rounds = 2) === Seq((1L, 1L), (2L, 2L)))
  }

  test("empty input and negative ids") {
    val got = new LabelPropagation(3).run(Seq.empty[(Long, Long)].toDF("src", "dst"))
    assert(got.columns.toSeq === Seq("id", "label"))
    assert(got.count() === 0L)
    val e = intercept[IllegalArgumentException](lpa(Seq((-1L, 2L)), rounds = 1))
    assert(e.getMessage.contains("non-negative"))
  }
}
