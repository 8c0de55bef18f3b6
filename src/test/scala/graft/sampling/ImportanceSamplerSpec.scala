package graft.sampling

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** DSIR-style importance scoring vs the hand-computed log-ratio formula. */
class ImportanceSamplerSpec extends SparkTestBase {
  import spark.implicits._

  // base corpus: doc 1 = "cat cat dog", doc 2 = "fish". target = doc 1.
  // base counts: cat 2, dog 1, fish 1 (N=4, V=3)
  // target counts: cat 2, dog 1 (N=3, V=2)
  private val docs = Seq((1L, "cat cat dog"), (2L, "fish")).toDF("doc_id", "text")
  private val target = docs.where($"doc_id" === 1L)

  private def pT(c: Double) = (c + 0.5) / (3.0 + 2 * 0.5)
  private def pB(c: Double) = (c + 0.5) / (4.0 + 3 * 0.5)

  test("score equals the hand-computed smoothed log ratio") {
    val got = new ImportanceSampler(alpha = 0.5).score(docs, target)
      .select($"doc_id", $"n_tokens", $"score")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap

    val d1 = (2 * math.log(pT(2) / pB(2)) + math.log(pT(1) / pB(1))) / 3.0
    val d2 = math.log(pT(0) / pB(1)) // fish unseen in target
    assert(got(1L)._2 === 3L)
    assert(math.abs(got(1L)._3 - d1) < 1e-12)
    assert(got(2L)._2 === 1L)
    assert(math.abs(got(2L)._3 - d2) < 1e-12)
    // target-like doc scores higher than the off-domain doc
    assert(got(1L)._3 > got(2L)._3)
  }

  test("selection is deterministic and replays the md5 coin exactly") {
    val s = new ImportanceSampler(alpha = 0.5, rate = 0.5)
    val a = s.select(docs, target).orderBy($"doc_id").collect().toSeq
    val b = s.select(docs, target).orderBy($"doc_id").collect().toSeq
    assert(a === b)
    // kept must equal the hand-replayed coin: uniform md5 hash < rate·exp(score)
    val scores = s.score(docs, target)
      .select($"doc_id", $"score").as[(Long, Double)].collect().toMap
    def coin(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dsir:$id".getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(
        md.take(4).map(b => f"$b%02x").mkString, 16)
      h.toDouble < 0.5 * math.exp(scores(id)) * 4294967296.0
    }
    val byId = a.map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(byId.size === 2)
    for (id <- byId.keys) assert(byId(id) === coin(id), s"doc $id")
    // threshold is monotone in score: the target-like doc's acceptance
    // probability strictly exceeds the off-domain doc's
    assert(math.exp(scores(1L)) > math.exp(scores(2L)))
  }

  test("rate scales acceptance on a larger deterministic corpus") {
    val big = (0L until 2000L)
      .map(i => (i, if (i % 4 == 0) "alpha beta gamma" else "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val tgt = big.where($"doc_id" % 4 === 0) // target = the alpha/beta/gamma docs
    def keptCount(rate: Double): (Long, Long) = {
      val out = new ImportanceSampler(alpha = 0.5, rate = rate).select(big, tgt)
      (out.where($"kept" && $"doc_id" % 4 === 0).count(),
        out.where($"kept" && $"doc_id" % 4 =!= 0).count())
    }
    val (inDom, offDom) = keptCount(0.5)
    // target-domain docs are kept far more often than off-domain ones
    assert(inDom > 0L)
    assert(inDom.toDouble / 500 > 2 * offDom.toDouble / 1500,
      s"inDom=$inDom offDom=$offDom")
    // higher rate keeps at least as many
    val (inDom2, offDom2) = keptCount(1.0)
    assert(inDom2 >= inDom && offDom2 >= offDom)
  }
}
