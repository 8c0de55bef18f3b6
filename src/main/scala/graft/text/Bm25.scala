package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.dedup.TextNormalizer

/** Okapi BM25 relevance scoring of every document against a fixed query
  * term set — the classic retrieval ranking function (Robertson &
  * Zaragoza, "The Probabilistic Relevance Framework: BM25 and Beyond",
  * 2009):
  *
  * {{{
  * score(d, q) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 - b + b·|d|/avgdl))
  * idf(t)      = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))
  * }}}
  *
  * Beyond-reference operator (LLM-pipeline extension): corpus-scale
  * lexical retrieval — quality-scoring docs against a topic profile,
  * building hard negatives, or pre-ranking before an embedding reranker.
  *
  * Scale shape: term counts partial-aggregate per (doc, term) with doc
  * length riding through the explode as a grouping constant (no separate
  * length join); the tiny query-term set broadcast-joins to prune the
  * stream to matching terms BEFORE df aggregation, so document frequency
  * is computed only for the handful of query terms; corpus scalars
  * (N, avgdl) arrive as one broadcast row. Nothing driver-side, no
  * vocabulary dictionary — unbounded corpora stream through two keyed
  * aggregations.
  */
class Bm25(
    val k1: Double = 1.2,
    val b: Double = 0.75,
    val idCol: String = "doc_id",
    val textCol: String = "text") {

  require(k1 >= 0, s"k1 ($k1) must be non-negative")
  require(b >= 0 && b <= 1, s"b ($b) must be in [0, 1]")

  /** (idCol, n_terms, score): BM25 score of each document containing at
    * least one query term, over `queryTerms` (matched post-normalization).
    */
  def score(docs: Dataset[_], queryTerms: Seq[String]): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val qt = queryTerms.distinct.toDF("term")

    val toks = docs.select(col(idCol), TextNormalizer.tokens(col(textCol)).as("tl"))
    // outer explode: house guard against InferFiltersFromGenerate cloning
    // the tokenizer regexp chain into a per-row scan filter
    val terms = toks.select(col(idCol), size(col("tl")).cast("long").as("len"),
      explode_outer(col("tl")).as("term"))
    // prune to query terms FIRST (broadcast semi of a tiny set): df and the
    // scoring join never see the corpus vocabulary
    val tc = terms.join(broadcast(qt), Seq("term"))
      .groupBy(col(idCol), col("len"), col("term"))
      .agg(count(lit(1)).as("c"))
    val df = tc.groupBy(col("term")).agg(countDistinct(col(idCol)).as("df"))
    // accepted cost: this scalar aggregate re-runs the tokenizer over the
    // corpus (Spark re-executes shared subtrees per consumer, and the only
    // one-pass alternative is materializing the exploded token stream —
    // corpus-sized state for a 2-scalar result). Both passes are
    // shuffle-free scans; the pruned term path stays the dominant cost.
    val corpus = toks.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(size(col("tl"))).as("avgdl"))

    tc.join(broadcast(df), "term")
      .crossJoin(broadcast(corpus))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("term_score",
        col("idf") * (col("c") * (k1 + 1)) /
          (col("c") + lit(k1) * (lit(1 - b) + lit(b) * col("len") / col("avgdl"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"),
        round(sum(col("term_score")), 6).as("score"))
  }

  /** Batch retrieval: top-`k` documents per query for a (bounded) query
    * SET — (query_id, idCol, score, rank). One corpus pass serves every
    * query: term counts and document frequencies are computed once over
    * the UNION of query terms, then the tiny (query, term) table fans the
    * per-(doc, term) scores out to queries (broadcast join, fan-out ≤
    * queries-per-term, never corpus × queries).
    *
    * The per-query top-k rides [[graft.sql.GroupedNtile.rankByValue]]'s
    * two-phase rank over score-range buckets: a window partitioned by
    * query_id would sort each query's whole match set in ONE task — the
    * low-cardinality-window class this repo bans. Ranks tie-break on the
    * rounded score by doc id, so ordering is engine-replayable.
    */
  def retrieve(docs: Dataset[_], queries: Seq[(String, Seq[String])], k: Int): DataFrame = {
    require(queries.nonEmpty, "queries must be non-empty")
    require(queries.forall(_._2.nonEmpty), "every query needs at least one term")
    require(k > 0, s"k ($k) must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val qt = queries.flatMap { case (q, ts) => ts.distinct.map(q -> _) }
      .toDF("query_id", "term")
    val uniq = qt.select(col("term")).distinct()

    val toks = docs.select(col(idCol), TextNormalizer.tokens(col(textCol)).as("tl"))
    val terms = toks.select(col(idCol), size(col("tl")).cast("long").as("len"),
      explode_outer(col("tl")).as("term"))
    val tc = terms.join(broadcast(uniq), Seq("term"))
      .groupBy(col(idCol), col("len"), col("term"))
      .agg(count(lit(1)).as("c"))
    val df = tc.groupBy(col("term")).agg(countDistinct(col(idCol)).as("df"))
    val corpus = toks.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(size(col("tl"))).as("avgdl"))

    val scored = tc.join(broadcast(qt), "term")
      .join(broadcast(df), "term")
      .crossJoin(broadcast(corpus))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("term_score",
        col("idf") * (col("c") * (k1 + 1)) /
          (col("c") + lit(k1) * (lit(1 - b) + lit(b) * col("len") / col("avgdl"))))
      .groupBy(col("query_id"), col(idCol))
      .agg(round(sum(col("term_score")), 6).as("score"))

    graft.sql.GroupedNtile.rankByValue(scored, "query_id", "score",
        descending = true, tieCols = Seq(col(idCol)), rankName = "rank")
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("score"), col("rank"))
  }
}
