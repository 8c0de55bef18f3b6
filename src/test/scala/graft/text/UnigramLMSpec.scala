package graft.text

import graft.SparkTestBase

/** Unigram-LM scoring vs hand-computed negative log-likelihoods. */
class UnigramLMSpec extends SparkTestBase {
  import spark.implicits._

  test("fitScore matches hand-computed smoothed nll") {
    // corpus: "a a b" and "a c" -> counts a=3 b=1 c=1, N=5, V=3, alpha=.5
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = new UnigramLM(alpha = 0.5).fitScore(docs)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val den = 5.0 + 0.5 * 3
    def nll(c: Long): Double = -math.log((c + 0.5) / den)
    assert(got(1L)._1 === 3L)
    assert(math.abs(got(1L)._2 - (2 * nll(3) + nll(1)) / 3) < 1e-6)
    assert(got(2L)._1 === 2L)
    assert(math.abs(got(2L)._2 - (nll(3) + nll(1)) / 2) < 1e-6)
  }

  test("unseen tokens get the alpha floor, and rarer docs score worse") {
    val corpus = Seq((1L, "the cat sat on the mat"), (2L, "the dog sat")).toDF("doc_id", "text")
    val lm = new UnigramLM(alpha = 0.5)
    val model = lm.fit(corpus)
    val scored = lm.score(
      Seq((10L, "the the the"), (11L, "zebra quux xylophone")).toDF("doc_id", "text"),
      model).as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    // all-unseen doc must score strictly worse than the all-common doc
    assert(scored(11L) > scored(10L))
    // unseen-token nll = -ln(alpha / (N + alpha V)) exactly
    val den = 9.0 + 0.5 * 6 // N=9 tokens, V=6 distinct {the,cat,sat,on,mat,dog}
    assert(math.abs(scored(11L) - (-math.log(0.5 / den))) < 1e-6)
  }

  test("model is a DataFrame, not a driver map (plan shape)") {
    val docs = Seq((1L, "x y z")).toDF("doc_id", "text")
    val lm = new UnigramLM()
    val plan = lm.score(docs, lm.fit(docs)).queryExecution.executedPlan.toString
    // scoring joins the vocab table; no collect-based literal vocabulary
    assert(plan.contains("Join") || plan.contains("BroadcastHashJoin"), plan)
  }
}
