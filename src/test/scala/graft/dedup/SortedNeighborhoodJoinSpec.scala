package graft.dedup

import graft.SparkTestBase

/** Window mechanics against a brute-force in-order reference, the
  * canonicalization, Jaccard verification, null-key loudness, empties.
  */
class SortedNeighborhoodJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def cands(
      recs: Seq[(Long, String)], w: Int): Set[(Long, Long)] =
    new SortedNeighborhoodJoin(w, "id", "k")
      .candidates(recs.toDF("id", "k"))
      .as[(Long, Long)].collect().toSet

  /** Brute force: sort by (k, id), pair within w positions. */
  private def ref(recs: Seq[(Long, String)], w: Int): Set[(Long, Long)] = {
    val order = recs.sortBy(r => (r._2, r._1)).map(_._1)
    (for {
      i <- order.indices; j <- (i + 1) to math.min(i + w, order.size - 1)
      a = order(i); b = order(j)
    } yield (a min b, a max b)).toSet
  }

  test("neighborhood pairs match brute force across window sizes") {
    val recs = Seq(5L -> "cc", 1L -> "aa", 9L -> "ab", 3L -> "cc",
      7L -> "ba", 2L -> "zz", 8L -> "aa")
    for (w <- Seq(1, 2, 3, 6, 10)) {
      assert(cands(recs, w) === ref(recs, w), s"w=$w")
    }
  }

  test("equal keys order by id (the total-order contract)") {
    val recs = Seq(4L -> "x", 2L -> "x", 3L -> "x")
    // sort order: 2, 3, 4 -> w=1 pairs (2,3), (3,4)
    assert(cands(recs, 1) === Set((2L, 3L), (3L, 4L)))
  }

  test("verified pairs: only Jaccard >= threshold survive") {
    val recs = Seq(
      (1L, "aa", Seq("a", "b", "c", "d")),
      (2L, "ab", Seq("a", "b", "c", "e")), // J(1,2) = 3/5 = 0.6
      (3L, "ac", Seq("x", "y", "z"))) // J vs others = 0
      .toDF("doc_id", "key", "toks")
    val got = new SortedNeighborhoodJoin(5).pairs(recs, "toks", 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(p => (p._1, p._2)) === Seq((1L, 2L)))
    assert(math.abs(got.head._3 - 0.6) < 1e-15)
  }

  test("a null blocking key fails loudly") {
    val recs = Seq((1L, "aa"), (2L, null.asInstanceOf[String]))
    val e = intercept[Exception] { cands(recs, 2) }
    assert(e.getMessage != null)
  }

  test("empty input and empty token sets are clean") {
    assert(cands(Seq.empty, 3) === Set.empty)
    val recs = Seq((1L, "aa", Seq.empty[String]), (2L, "ab", Seq.empty[String]))
      .toDF("doc_id", "key", "toks")
    assert(new SortedNeighborhoodJoin(5).pairs(recs, "toks", 0.5).count() === 0L)
  }
}
