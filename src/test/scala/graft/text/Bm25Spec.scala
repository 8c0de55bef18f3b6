package graft.text

import graft.SparkTestBase

/** BM25 scoring vs hand-computed Okapi values. */
class Bm25Spec extends SparkTestBase {
  import spark.implicits._

  // corpus: 3 docs, query {"cat"}: df(cat)=2, N=3, lengths 3/3/2, avgdl 8/3
  private val docs = Seq(
    (1L, "cat cat dog"),
    (2L, "cat mouse bird"),
    (3L, "dog bird")).toDF("doc_id", "text")

  private def bm25(c: Long, len: Long, df: Long, n: Double, avgdl: Double,
      k1: Double = 1.2, b: Double = 0.75): Double = {
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    idf * (c * (k1 + 1)) / (c + k1 * (1 - b + b * len / avgdl))
  }

  test("single-term scores match the closed form") {
    val got = new Bm25().score(docs, Seq("cat"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val avgdl = 8.0 / 3
    assert(got.keySet === Set(1L, 2L)) // doc 3 has no query term
    assert(got(1L)._1 === 1L)
    assert(math.abs(got(1L)._2 - bm25(2, 3, 2, 3, avgdl)) < 1e-5)
    assert(math.abs(got(2L)._2 - bm25(1, 3, 2, 3, avgdl)) < 1e-5)
    // tf saturation: doc 1 has cat twice but scores < 2x doc 2
    assert(got(1L)._2 < 2 * got(2L)._2)
    assert(got(1L)._2 > got(2L)._2)
  }

  test("multi-term scores sum per matched term and count n_terms") {
    val got = new Bm25().score(docs, Seq("cat", "dog"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val avgdl = 8.0 / 3
    assert(got(1L)._1 === 2L) // matches both terms
    val exp1 = bm25(2, 3, 2, 3, avgdl) + bm25(1, 3, 2, 3, avgdl)
    assert(math.abs(got(1L)._2 - exp1) < 1e-5)
    assert(got(3L)._1 === 1L)
  }

  test("rarer terms get higher idf weight") {
    // "mouse" df=1 vs "dog" df=2 at equal tf/len -> mouse contributes more
    val got = new Bm25().score(docs, Seq("mouse", "bird"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    // doc2 (mouse+bird) > doc3 (bird only)
    assert(got(2L) > got(3L))
  }

  test("query-term pruning happens before df aggregation (plan shape)") {
    val plan = new Bm25().score(docs, Seq("cat"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("retrieve: single-query scores match score() exactly") {
    val viaScore = new Bm25().score(docs, Seq("cat", "dog"))
      .select($"doc_id", $"score").as[(Long, Double)].collect().toSet
    val viaRetrieve = new Bm25()
      .retrieve(docs, Seq("q" -> Seq("cat", "dog")), k = 10)
      .select($"doc_id", $"score").as[(Long, Double)].collect().toSet
    assert(viaRetrieve === viaScore)
  }

  test("retrieve: per-query top-k with contiguous ranks, descending scores") {
    val got = new Bm25().retrieve(docs,
      Seq("q1" -> Seq("cat"), "q2" -> Seq("dog", "bird")), k = 1)
      .as[(String, Long, Double, Long)].collect()
    assert(got.length === 2)
    assert(got.forall(_._4 === 1L))
    // q1's best is doc 1 (cat twice)
    assert(got.find(_._1 == "q1").get._2 === 1L)
  }

  test("retrieve: df is corpus-wide per term, not per query") {
    // the same term in two queries must produce identical per-doc scores
    val got = new Bm25().retrieve(docs,
      Seq("qa" -> Seq("cat"), "qb" -> Seq("cat")), k = 10)
      .select($"query_id", $"doc_id", $"score")
      .as[(String, Long, Double)].collect()
    val byQ = got.groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toSet)
    assert(byQ("qa") === byQ("qb"))
  }
}
