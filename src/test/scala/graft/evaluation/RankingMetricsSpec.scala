package graft.evaluation

import graft.SparkTestBase

/** Hand-computed metric fixtures, perfect/zero-recall edges, rank>k
  * filtering, and truthless-query dropping.
  */
class RankingMetricsSpec extends SparkTestBase {
  import spark.implicits._

  private val w = RankingMetrics.discounts(3)

  private def run(
      runRows: Seq[(Long, Long, Int)],
      truthRows: Seq[(Long, Long)],
      k: Int = 3): Map[Long, (Long, Double, Double, Double)] =
    RankingMetrics.evaluate(
      runRows.toDF("query_id", "vec_id", "rank"),
      truthRows.toDF("query_id", "vec_id"), k)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("hand fixture: hits at ranks 1 and 3 of a 3-item truth set") {
    val got = run(
      Seq((1L, 10L, 1), (1L, 99L, 2), (1L, 11L, 3)),
      Seq((1L, 10L), (1L, 11L), (1L, 12L)))
    val (nh, rec, mrr, ndcg) = got(1L)
    assert(nh === 2L)
    assert(math.abs(rec - math.round(2.0 / 3 * 1e6) / 1e6) < 1e-12)
    assert(mrr === 1.0)
    val want = (w(0) + w(2)) / (w(0) + w(1) + w(2))
    assert(math.abs(ndcg - want) < 1e-6)
  }

  test("perfect ranking reads 1.0 everywhere; zero hits read 0.0") {
    val got = run(
      Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 98L, 1), (2L, 99L, 2)),
      Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L)), k = 2)
    assert(got(1L) === ((2L, 1.0, 1.0, 1.0)))
    assert(got(2L) === ((0L, 0.0, 0.0, 0.0)))
  }

  test("rows with rank > k are ignored") {
    val got = run(
      Seq((1L, 10L, 1), (1L, 11L, 4)),
      Seq((1L, 10L), (1L, 11L)), k = 3)
    assert(got(1L)._1 === 1L) // the rank-4 hit does not count at k=3
  }

  test("IDCG uses min(k, truth size): one-item truth, hit at rank 1") {
    val got = run(Seq((1L, 10L, 1), (1L, 11L, 2)), Seq((1L, 10L)), k = 3)
    assert(got(1L)._4 === 1.0) // dcg = w1, idcg = w1
  }

  test("queries absent from truth are dropped") {
    val got = run(Seq((1L, 10L, 1), (7L, 10L, 1)), Seq((1L, 10L)))
    assert(got.keySet === Set(1L))
  }
}
