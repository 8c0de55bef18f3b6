package graft.text

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.classification.LocalLogisticRegression
import graft.evaluation.BinaryModelMetrics

/** Hashing-trick featurization: bucket arithmetic replayed by hand, and
  * the end-to-end quality-classifier composition it exists to feed.
  */
class HashedNgramFeaturizerSpec extends SparkTestBase {
  import spark.implicits._

  private def bucket(gram: String, dim: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"hng:$gram".getBytes("UTF-8"))
    java.lang.Long.parseLong(md.take(4).map(b => f"$b%02x").mkString, 16) % dim
  }

  test("features match the hand-replayed md5 buckets for unigrams and bigrams") {
    val docs = Seq((1L, "big data!")).toDF("doc_id", "text")
    // normalized tokens: [big, data]; grams: big, data, "big data"
    val got = new HashedNgramFeaturizer(dim = 4096).features(docs)
      .select($"bucket", $"n").as[(Long, Long)].collect().toMap
    val want = Seq("big", "data", "big data").groupBy(bucket(_, 4096))
      .map { case (b, gs) => b -> gs.size.toLong }
    assert(got === want)
  }

  test("useBigrams=false hashes unigrams only; single-token docs get no bigram") {
    val docs = Seq((1L, "solo"), (2L, "a b")).toDF("doc_id", "text")
    val uniOnly = new HashedNgramFeaturizer(dim = 512, useBigrams = false)
      .features(docs).groupBy($"doc_id").agg(sum($"n")).as[(Long, Long)]
      .collect().toMap
    assert(uniOnly === Map(1L -> 1L, 2L -> 2L))
    val withBi = new HashedNgramFeaturizer(dim = 512)
      .features(docs).groupBy($"doc_id").agg(sum($"n")).as[(Long, Long)]
      .collect().toMap
    assert(withBi === Map(1L -> 1L, 2L -> 3L)) // a, b, "a b"
  }

  test("toVectors assembles dim-sized sparse vectors with total mass = gram count") {
    val docs = Seq((1L, "x y x")).toDF("doc_id", "text")
    val v = new HashedNgramFeaturizer(dim = 128).toVectors(docs)
      .select($"features").head().getAs[Vector](0)
    assert(v.size === 128)
    // grams: x, y, x, "x y", "y x" → total mass 5
    assert(v.toArray.sum === 5.0)
  }

  test("row-local marginCol equals the features() groupBy/sum formulation") {
    val rnd = new scala.util.Random(7)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val docs = (1L to 200L).map { i =>
      (i, (1 to 1 + rnd.nextInt(20)).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val feat = new HashedNgramFeaturizer(dim = 4096)
    val viaGroupBy = feat.features(docs)
      .groupBy($"doc_id").agg(sum(($"bucket" % 7 - 3) * $"n").as("m"))
      .as[(Long, Long)].collect().toMap
    val viaRowLocal = docs
      .select($"doc_id", feat.marginCol($"text", b => b % 7 - 3).as("m"))
      .as[(Long, Long)].collect().toMap
    assert(viaRowLocal === viaGroupBy)
    // and the row-local plan really is shuffle-free
    val plan = docs.select(feat.marginCol($"text", b => b % 7 - 3))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"marginCol plan shuffles:\n$plan")
  }

  test("end-to-end: a quality classifier trained on hashed features separates planted styles") {
    val rnd = new scala.util.Random(41)
    val goodWords = Seq("clear", "concise", "useful", "sourced", "read")
    val junkWords = Seq("spam", "click", "win", "free", "now")
    val docs = (0L until 400L).map { i =>
      val ws = if (i % 2 == 0) goodWords else junkWords
      (i, (1 to 12).map(_ => ws(rnd.nextInt(ws.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val feat = new HashedNgramFeaturizer(dim = 1 << 12)
    val feats = feat.toVectors(docs)
      .join(docs.select($"doc_id",
        when($"doc_id" % 2 === 0, 1.0).otherwise(0.0).as("label")), "doc_id")
      .coalesce(1)
    val model = new LocalLogisticRegression().setMaxIter(30).fit(feats)
    val scored = model.transform(feats)
      .select($"probability".as("score"), $"label")
    val auc = new BinaryModelMetrics(scored).areaUnderROC()
    assert(auc > 0.99, s"AUC $auc")

    // the trained model's margin, recomputed shuffle-free by scoreCol
    // (broadcast coefficient array, one lookup per gram) — must agree
    // with the sparse dot product up to float association order
    val coef = model.coefficients.toArray
    val expected = feat.toVectors(docs).join(docs, "doc_id")
      .select($"doc_id", $"features", $"text").collect().map { r =>
        val v = r.getAs[Vector]("features")
        var dot = model.intercept
        v.foreachActive((i, x) => dot += coef(i) * x)
        r.getLong(0) -> dot
      }.toMap
    val got = docs.select($"doc_id",
        feat.scoreCol($"text", coef, model.intercept).as("m"))
      .as[(Long, Double)].collect().toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, m) =>
      assert(math.abs(m - expected(id)) <= 1e-9 * (1 + math.abs(m)),
        s"doc $id: scoreCol $m vs dot ${expected(id)}")
    }
    val plan = docs.select(feat.scoreCol($"text", coef, model.intercept))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoreCol plan shuffles:\n$plan")
  }
}
