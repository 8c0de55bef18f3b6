package graft.dedup

import graft.SparkTestBase

/** Containment join against a brute-force all-ordered-pairs reference:
  * subset capture, asymmetry, threshold boundary, duplicate-token
  * collapse, and empties.
  */
class ContainmentJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def run(sets: Seq[(Long, Seq[String])], t: Double) =
    new ContainmentJoin(t, "id", "toks")
      .pairs(sets.toDF("id", "toks"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  /** Brute force over every ordered pair. */
  private def ref(sets: Seq[(Long, Seq[String])], t: Double)
      : Map[(Long, Long), Double] = {
    val m = sets.map { case (id, ts) => id -> ts.distinct.toSet }
      .filter(_._2.nonEmpty)
    (for {
      (a, ta) <- m; (b, tb) <- m if a != b
      c = ta.intersect(tb).size.toDouble / ta.size if c >= t
    } yield (a, b) -> c).toMap
  }

  test("a doc swallowed by a larger one: contained direction only") {
    val sets = Seq(
      1L -> Seq("a", "b", "c"),
      2L -> Seq("a", "b", "c", "d", "e", "f", "g", "h", "i", "j"))
    val got = run(sets, 0.9)
    assert(got === Map((1L, 2L) -> 1.0)) // C(2,1) = 3/10, far below 0.9
  }

  test("matches brute force on a mixed corpus") {
    // overlapping templates, a subset pair, a disjoint doc, a duplicate
    val sets = Seq(
      1L -> Seq("w1", "w2", "w3", "w4", "w5"),
      2L -> Seq("w1", "w2", "w3", "w4", "w5", "w6"),
      3L -> Seq("w1", "w2", "w3", "w9", "w10"),
      4L -> Seq("z1", "z2"),
      5L -> Seq("w1", "w2", "w3", "w4", "w5"))
    for (t <- Seq(0.5, 0.8, 1.0)) {
      val got = run(sets, t)
      val want = ref(sets, t)
      assert(got.keySet === want.keySet, s"t=$t")
      got.foreach { case (k, v) =>
        assert(math.abs(v - want(k)) < 1e-15, s"t=$t pair $k") }
    }
  }

  test("threshold boundary is inclusive (>=)") {
    // C(1,2) = 4/5 = 0.8 exactly
    val sets = Seq(
      1L -> Seq("a", "b", "c", "d", "e"),
      2L -> Seq("a", "b", "c", "d", "x", "y", "z", "q", "r", "s"))
    assert(run(sets, 0.8).contains((1L, 2L)))
    assert(!run(sets, 0.81).contains((1L, 2L)))
  }

  test("duplicate tokens collapse to set semantics") {
    val sets = Seq(
      1L -> Seq("a", "a", "a", "b"),
      2L -> Seq("a", "b", "b", "c"))
    val got = run(sets, 0.9)
    // sets are {a,b} and {a,b,c}: C(1,2) = 1.0, C(2,1) = 2/3
    assert(got === Map((1L, 2L) -> 1.0))
  }

  test("empty sets join nothing; empty input is clean") {
    val sets = Seq(1L -> Seq.empty[String], 2L -> Seq("a"))
    assert(run(sets, 0.5).isEmpty)
    assert(run(Seq.empty, 0.5).isEmpty)
  }

  test("pruning is lossless on a randomized corpus (seeded)") {
    val rnd = new scala.util.Random(7)
    val vocab = (1 to 40).map("t" + _)
    val sets = (1L to 60L).map { id =>
      id -> rnd.shuffle(vocab).take(3 + rnd.nextInt(20)).toSeq
    }
    for (t <- Seq(0.6, 0.9)) {
      val got = run(sets, t)
      val want = ref(sets, t)
      assert(got.keySet === want.keySet, s"t=$t")
    }
  }
}
