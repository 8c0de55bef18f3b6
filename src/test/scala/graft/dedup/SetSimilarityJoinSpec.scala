package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SetSimilarityJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def run(t: Double, rows: Seq[(Long, Seq[String])]): Map[(Long, Long), Double] =
    new SetSimilarityJoin(t, "doc_id", "toks")
      .pairs(rows.toDF("doc_id", "toks"))
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap

  private def brute(t: Double, rows: Seq[(Long, Seq[String])]): Map[(Long, Long), Double] =
    (for {
      (a, ta) <- rows; (b, tb) <- rows if a < b
      sa = ta.toSet; sb = tb.toSet
      u = (sa ++ sb).size if u > 0
      j = (sa & sb).size.toDouble / u if j >= t
    } yield (a, b) -> j).toMap

  lazy val fixture = Seq(
    (1L, Seq("a", "b", "c", "d")),
    (2L, Seq("a", "b", "c", "e")),
    (3L, Seq("a", "b", "c", "d")),
    (4L, Seq("x", "y")),
    (5L, Seq.empty[String]))

  test("finds exactly the pairs at or above the threshold") {
    val got = run(0.6, fixture)
    assert(got === Map((1L, 2L) -> 0.6, (1L, 3L) -> 1.0, (2L, 3L) -> 0.6))
    // >= is inclusive: the exact-boundary pairs (J = 0.6) are present
    val tight = run(0.7, fixture)
    assert(tight === Map((1L, 3L) -> 1.0))
  }

  test("empty sets never pair, duplicate input tokens collapse") {
    val got = run(0.1, fixture)
    assert(!got.keys.exists { case (a, b) => a == 5L || b == 5L })
    // [a,a,b] is the SET {a,b}: identical to [a,b], J = 1.0
    val dup = run(0.9, Seq((1L, Seq("a", "a", "b")), (2L, Seq("a", "b"))))
    assert(dup === Map((1L, 2L) -> 1.0))
  }

  test("matches brute force on overlapping-window sets (incl. the ceil-fuzz size 30)") {
    // 40 sets of 30 consecutive tokens of a 69-token universe, stride 1:
    // neighbors at every Jaccard level around the threshold, and size 30
    // is the 0.7*30 = 21.000000000000004 float-fuzz case — an unguarded
    // ceil() would shorten prefixes and silently drop near-threshold pairs
    val rows = (0 until 40).map { i =>
      (i.toLong, (i until i + 30).map(n => s"t$n"))
    }
    val t = 0.7
    val got = run(t, rows)
    val want = brute(t, rows)
    assert(got.keySet === want.keySet)
    got.foreach { case (k, j) => assert(math.abs(j - want(k)) < 1e-12) }
    assert(want.nonEmpty) // the fixture genuinely exercises pairs
  }

  test("length filter never drops a qualifying pair (small vs large sets)") {
    val rows = Seq(
      (1L, (0 until 10).map(n => s"t$n")),
      (2L, (0 until 14).map(n => s"t$n")), // J = 10/14 = 0.714
      (3L, (0 until 30).map(n => s"t$n"))) // J(1,3) = 1/3 — size-filtered out
    val got = run(0.7, rows)
    assert(got.keySet === Set((1L, 2L)))
    assert(math.abs(got((1L, 2L)) - 10.0 / 14) < 1e-12)
  }
}
