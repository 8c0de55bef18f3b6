package graft.text

import graft.SparkTestBase

/** Interpolated bigram scoring vs hand-computed probabilities. */
class BigramLMSpec extends SparkTestBase {
  import spark.implicits._

  test("scores match the hand-computed interpolated formula") {
    // doc1 [a b a b], doc2 [b a]:
    //   unigrams a:3 b:3 (N=6, V=2); bigrams (a,b):2 (b,a):2; cprev a:2 b:2
    //   every scored bigram: P_bi = 1.0, P_uni(tok) = 3.5/7 = 0.5
    //   nll = -ln(0.7·1 + 0.3·0.5) = -ln(0.85)
    val docs = Seq((1L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
    val got = new BigramLM(lambda = 0.7, alpha = 0.5).fitScore(docs)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val want = BigDecimal(-math.log(0.85))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L)._2 === 3L) // tokens 2..4 scored
    assert(got(2L)._2 === 1L)
    assert(got(1L)._3 === want)
    assert(got(2L)._3 === want)
  }

  test("predictable sequences score lower nll than shuffled ones") {
    // rigid bigram structure vs the same tokens scrambled: the bigram term
    // must separate them where a unigram model cannot (same token counts)
    val rigid = (0L until 40L).map(i => (i, "x y z x y z x y z"))
    val mixed = (40L until 80L).map(i => (i, "z x x y y z y x z"))
    val docs = (rigid ++ mixed).toDF("doc_id", "text")
    val out = new BigramLM(lambda = 0.7, alpha = 0.5).fitScore(docs)
      .as[(Long, Long, Double)].collect()
    val rigidAvg = out.filter(_._1 < 40).map(_._3).sum / 40
    val mixedAvg = out.filter(_._1 >= 40).map(_._3).sum / 40
    assert(rigidAvg < mixedAvg, s"rigid=$rigidAvg mixed=$mixedAvg")
  }

  test("single-token and empty documents produce no score row") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    val ids = new BigramLM().fitScore(docs).select("doc_id").as[Long].collect().toSet
    assert(ids === Set(3L))
  }
}
