package graft

import org.apache.spark.sql.functions._

import graft.dedup.DedupClusters
import graft.sampling.HashSampler
import graft.text.QualityFilter

class CurationSpec extends SparkTestBase {
  import spark.implicits._

  test("quality filter drops short and junk documents") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and keeps running for a while longer today"),
      (2L, "short"),
      (3L, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( ))) @@@ !!!"))
      .toDF("doc_id", "text")
    val kept = new QualityFilter().setTextCol("text")
      .setMinTokens(10).setMaxPunctRatio(0.2).setMinQuality(0.3)
      .transform(docs).select("doc_id").as[Long].collect()
    assert(kept.toSeq === Seq(1L))
  }

  test("hash sampler: deterministic, disjoint complement, salt-independent") {
    val docs = (0L until 1000L).toDF("doc_id")
    val s = new HashSampler().setIdCol("doc_id").setPercent(30).setSalt("val")
    val kept = s.transform(docs).select("doc_id").as[Long].collect().toSet
    val kept2 = s.transform(docs).select("doc_id").as[Long].collect().toSet
    assert(kept === kept2) // stable across runs
    val rest = s.transformComplement(docs).select("doc_id").as[Long].collect().toSet
    assert(kept.intersect(rest).isEmpty && kept.size + rest.size === 1000)
    assert(kept.size > 200 && kept.size < 400) // ~30%
    val other = new HashSampler().setIdCol("doc_id").setPercent(30).setSalt("test")
      .transform(docs).select("doc_id").as[Long].collect().toSet
    assert(other !== kept) // different salt, different sample
  }

  test("mixture sampler caps over-represented groups, keeps rare ones whole") {
    import graft.sampling.MixtureSampler
    val docs = (1L to 400L).map(i => (i, if (i <= 300) "en" else "zh"))
      .toDF("doc_id", "lang")
    val out = new MixtureSampler(Map("en" -> 100L, "zh" -> 500L))
      .transform(docs).select($"doc_id", $"lang")
      .as[(Long, String)].collect()
    val byLang = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang("zh") === 100)                // rate 1: all 100 kept
    assert(byLang("en") > 60 && byLang("en") < 140) // ~100 of 300 via hash rate
    // deterministic: a second run selects the identical ids
    val again = new MixtureSampler(Map("en" -> 100L, "zh" -> 500L))
      .transform(docs).select($"doc_id").as[Long].collect().toSet
    assert(again === out.map(_._1).toSet)
    // untargeted groups are dropped
    val dropped = new MixtureSampler(Map("zh" -> 500L))
      .transform(docs).select($"lang").distinct().as[String].collect()
    assert(dropped.toSeq === Seq("zh"))
  }

  test("mixture sampler: a tiny positive rate keeps SOME rows, never zero by quantization") {
    import graft.sampling.MixtureSampler
    // rate = 5 / 60000 ≈ 8.3e-5 < 1e-4: the old mod-1e4 coin floored the
    // threshold to 0 and silently dropped the ENTIRE group despite a
    // positive target; the 2^32 coin keeps ~target rows
    val docs = (1L to 60000L).map((_, "web")).toDF("doc_id", "lang")
    val kept = new MixtureSampler(Map("web" -> 5L)).transform(docs).count()
    assert(kept > 0L, "a positive target must never quantize to zero kept rows")
    assert(kept < 60L, s"rate 8.3e-5 of 60k rows should keep a handful, got $kept")
  }

  test("weighted sampler: zero/negative/null weights are excluded, not guaranteed-picked") {
    import graft.sampling.WeightedSampler
    // u/0 is NULL (sorts FIRST ascending) and negative weights sort before
    // every positive priority — the raw arithmetic GUARANTEED selection of
    // exactly the rows whose inclusion probability should be zero
    val rows = ((1L to 50L).map(i => (i, Some(1.0))) ++
      (51L to 60L).map(i => (i, Some(0.0))) ++
      (61L to 70L).map(i => (i, Some(-5.0))) ++
      (71L to 80L).map(i => (i, Option.empty[Double])))
      .toDF("doc_id", "w")
    val picked = new WeightedSampler(k = 20, weightCol = "w")
      .transform(rows).select($"doc_id").as[Long].collect().toSet
    assert(picked.size === 20)
    assert(picked.forall(_ <= 50L), s"non-positive-weight rows selected: ${picked.filter(_ > 50L)}")
  }

  test("stratified sampler keeps exactly min(n, group size) per group") {
    import graft.sampling.StratifiedSampler
    val docs = ((1L to 20L).map((_, "en")) ++ (21L to 23L).map((_, "zh")))
      .toDF("doc_id", "lang")
    val out = new StratifiedSampler(n = 5).transform(docs)
      .select($"doc_id", $"lang").as[(Long, String)].collect()
    val byLang = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byLang("en").size === 5)
    assert(byLang("zh") === Set(21L, 22L, 23L)) // fewer than n -> keep all
    // deterministic across runs
    val again = new StratifiedSampler(n = 5).transform(docs)
      .select($"doc_id").as[Long].collect().toSet
    assert(again === out.map(_._1).toSet)
  }

  test("weighted sampler: deterministic, k-bounded, weight-biased") {
    import graft.sampling.WeightedSampler
    // 200 light rows (w=1) vs 200 heavy rows (w=100): the k=60 sample
    // should be dominated by heavy rows (inclusion odds scale with w)
    val rows = ((1L to 200L).map((_, 1L)) ++ (201L to 400L).map((_, 100L)))
      .toDF("doc_id", "w")
    val s = new WeightedSampler(k = 60, weightCol = "w")
    val picked = s.transform(rows).select($"doc_id").as[Long].collect().toSet
    assert(picked.size === 60)
    val heavy = picked.count(_ > 200L)
    assert(heavy > 45, s"expected heavy-row dominance, got $heavy/60")
    // deterministic across invocations and partitionings
    val again = s.transform(rows.repartition(13)).select($"doc_id").as[Long].collect().toSet
    assert(again === picked)
    // plan: global smallest-k is TakeOrdered, not a full sort
    val plan = s.transform(rows).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }

  test("tfidf ranks distinctive terms above ubiquitous ones") {
    import graft.text.TfIdf
    val docs = Seq(
      (1L, "common common zebra"),
      (2L, "common common yak"),
      (3L, "common common common"))
      .toDF("doc_id", "text")
    val top = new TfIdf(topK = 1).topTerms(docs)
      .select($"doc_id", $"term").as[(Long, String)].collect().toMap
    assert(top(1L) === "zebra") // df=1 beats df=3 despite lower tf
    assert(top(2L) === "yak")
    assert(top(3L) === "common")
    // df column: "common" appears in all 3 docs
    val dfOf = new TfIdf(topK = 3).topTerms(docs)
      .where($"term" === "common").select($"df").as[Long].head()
    assert(dfOf === 3L)
  }

  test("cluster resolution: components collapse transitively") {
    // 1-2, 2-3 chain plus isolated 4,5 and pair 5-6
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val clusters = DedupClusters.components(nodes, pairs, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(clusters === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("cluster resolution handles long chains within iteration bound") {
    val n = 30
    val nodes = (1L to n.toLong).toDF("doc_id")
    val pairs = (1L until n.toLong).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val clusters = DedupClusters.components(nodes, pairs, "doc_id", maxRounds = 40)
      .as[(Long, Long)].collect().toMap
    assert(clusters.values.toSet === Set(1L)) // one chain, one component
  }

  test("leakage-safe split: no near-dup cluster straddles train/valid") {
    val out = graft.SparkEntry
      .queries("q163_leakage_safe_split")(spark, "/root/testdata/sf0.001")
    // the property the query exists for: one split value per cluster
    val straddlers = out.groupBy($"cluster")
      .agg(countDistinct($"split").as("sides"))
      .where($"sides" > 1).count()
    assert(straddlers === 0L)
    // both sides populated and roughly 90/10 at the coin's granularity
    val sides = out.groupBy($"split").count()
      .as[(String, Long)].collect().toMap
    assert(sides.keySet === Set("train", "valid"))
    assert(sides("train") > sides("valid"))
  }
}
