package graft.similarity

import graft.SparkTestBase

class HybridRetrieverSpec extends SparkTestBase {
  import spark.implicits._

  private def leg(rows: (String, Long, Int)*) =
    rows.toSeq.toDF("query_id", "id", "rank")

  test("fused score is the fixed-order RRF sum; missing legs contribute 0") {
    val lex = leg(("q", 1L, 1), ("q", 2L, 2), ("q", 3L, 3))
    val vec = leg(("q", 2L, 1), ("q", 4L, 2))
    val got = HybridRetriever.fuse(Seq("lex" -> lex, "vec" -> vec), topK = 10)
      .as[(String, Long, Double, Int, Option[Long], Option[Long])]
      .collect().sortBy(_._4)

    // doc 2: both legs; docs 1/3 lex-only; doc 4 vec-only
    val s2 = 1.0 / (60.0 + 2.0) + 1.0 / (60.0 + 1.0)
    val s1 = 1.0 / (60.0 + 1.0)
    val s4 = 1.0 / (60.0 + 2.0)
    val s3 = 1.0 / (60.0 + 3.0)
    assert(got.map(r => (r._2, r._3)).toSeq ===
      Seq((2L, s2), (1L, s1), (4L, s4), (3L, s3)))
    assert(got.head === (("q", 2L, s2, 1, Some(2L), Some(1L))))
    assert(got(1)._5 === Some(1L) && got(1)._6 === None)
  }

  test("ties on the fused score break by id ascending") {
    // identical single-leg ranks -> identical scores
    val lex = leg(("q", 9L, 1), ("q", 3L, 1))
    val got = HybridRetriever.fuse(Seq("lex" -> lex), topK = 2)
      .select("id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(got.toSeq === Seq((3L, 1), (9L, 2)))
  }

  test("duplicate (query, id) within a leg keeps its best (minimum) rank") {
    val lex = leg(("q", 1L, 5), ("q", 1L, 2))
    val got = HybridRetriever.fuse(Seq("lex" -> lex), topK = 1)
      .select("rank_lex").as[Long].collect()
    assert(got.toSeq === Seq(2L))
  }

  test("topK truncates per query independently") {
    val lex = leg(
      ("a", 1L, 1), ("a", 2L, 2), ("a", 3L, 3),
      ("b", 7L, 1))
    val got = HybridRetriever.fuse(Seq("lex" -> lex), topK = 2)
      .select("query_id", "id").as[(String, Long)].collect().toSet
    assert(got === Set(("a", 1L), ("a", 2L), ("b", 7L)))
  }

  test("duplicate leg names refuse at wiring time") {
    val l = leg(("q", 1L, 1))
    val e = intercept[IllegalArgumentException] {
      HybridRetriever.fuse(Seq("x" -> l, "x" -> l))
    }
    assert(e.getMessage.contains("duplicate leg names"))
  }

  test("three legs fuse in declared order with per-leg rank columns") {
    val a = leg(("q", 1L, 1))
    val b = leg(("q", 1L, 2))
    val c = leg(("q", 2L, 1))
    val got = HybridRetriever.fuse(Seq("a" -> a, "b" -> b, "c" -> c), topK = 5)
    assert(got.columns.toSeq ===
      Seq("query_id", "id", "rrf_score", "rank", "rank_a", "rank_b", "rank_c"))
    val byId = got.as[(String, Long, Double, Int, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._2 -> r).toMap
    assert(byId(1L)._3 === 1.0 / 61.0 + 1.0 / 62.0)
    assert(byId(2L)._3 === 1.0 / 61.0)
    assert(byId(1L)._4 === 1 && byId(2L)._4 === 2)
  }
}
