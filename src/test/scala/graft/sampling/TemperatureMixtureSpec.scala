package graft.sampling

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TemperatureMixtureSpec extends SparkTestBase {
  import spark.implicits._

  // 800 head rows vs 100 + 100 tail rows across three groups
  lazy val docs = (0 until 1000).map { i =>
    val g = if (i < 800) "en" else if (i < 900) "de" else "fr"
    (i.toLong, g)
  }.toDF("doc_id", "lang")

  test("alpha=0.5 boosts tail groups relative to natural proportions") {
    val thr = new TemperatureMixture(totalTarget = 500, alpha = 0.5)
      .thresholds(docs)
      .select($"lang", $"__thr").as[(String, Long)].collect().toMap
    // natural share of en is 80%; sqrt-tempered share is
    // sqrt(800)/(sqrt(800)+sqrt(100)+sqrt(100)) ≈ 58.6% → en's keep-rate
    // (500*0.586/800 ≈ 0.366) sits well under its natural-target rate 0.5
    // (thresholds are on the 2^32 coin scale)
    assert(thr("en") < (0.5 * MixtureSampler.CoinRange).toLong)
    // the two equal-size tail groups get identical, boosted rates
    assert(thr("de") === thr("fr"))
    assert(thr("de") > thr("en"))
  }

  test("alpha=1 reproduces natural proportions (uncapped rates equal)") {
    val thr = new TemperatureMixture(totalTarget = 500, alpha = 1.0)
      .thresholds(docs)
      .select($"lang", $"__thr").as[(String, Long)].collect().toMap
    // target_g/n_g = total/N for every group when alpha=1
    assert(thr.values.toSet.size === 1)
    assert(thr("en") === (0.5 * MixtureSampler.CoinRange).toLong)
  }

  test("tiny groups hit the rate cap and keep everything") {
    val skew = docs.union(Seq((9990L, "zz"), (9991L, "zz")).toDF("doc_id", "lang"))
    val out = new TemperatureMixture(totalTarget = 500).transform(skew)
    assert(out.where($"lang" === "zz").count() === 2)
  }

  test("sampled size lands near the total target") {
    val n = new TemperatureMixture(totalTarget = 500).transform(docs).count()
    assert(n > 400 && n < 600, s"got $n")
  }

  test("membership is deterministic and partitioning-invariant") {
    val tm = new TemperatureMixture(totalTarget = 300)
    val a = tm.transform(docs).select("doc_id").as[Long].collect().toSet
    val b = tm.transform(docs.repartition(13)).select("doc_id").as[Long].collect().toSet
    assert(a === b)
  }
}
