package graft.evaluation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-query retrieval-quality metrics — recall@k, MRR@k, nDCG@k (binary
  * relevance) — of a ranked RUN against a ground-truth item set. The
  * evaluation half of the ANN stack: "what recall does the IVF index
  * actually deliver against brute force" is the question every
  * approximate-retrieval deployment has to answer before trading
  * exactness for speed, and it is answered here as one declarative plan
  * (no per-query driver loops).
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * == Deterministic contract ==
  *
  * The nDCG discount weights 1/log2(r+1) and their prefix sums (the
  * ideal DCG for a truth set of size t) are computed ONCE in Scala and
  * consumed as array literals — never per-engine log() calls, whose last
  * ulp drifts across libms (the q191 log-edge lesson). recall and MRR
  * are ratios of exact integers. The remaining float work is summing <=k
  * identical literals per query.
  *
  * == Scale shape ==
  *
  * One keyed equi-join (run x truth on (query, item)), two
  * map-side-combinable per-query aggregations, one broadcast-sized
  * literal lookup. Linear in |run| + |truth| at any query count.
  */
object RankingMetrics {

  /** Binary-relevance discount weights w_r = 1/log2(r+1), r = 1..k. */
  def discounts(k: Int): Seq[Double] =
    (1 to k).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))

  /** (query_id, n_hits, recall_k, mrr, ndcg) per query in `run`.
    *
    * `run`: (queryCol, itemCol, rankCol) with rank 1-based — rows with
    * rank > k are ignored. `truth`: (queryCol, itemCol) — the relevant
    * set per query; queries absent from `truth` are dropped (no metric
    * is defined). IDCG uses min(k, |truth|) ideal hits.
    */
  def evaluate(
      run: DataFrame,
      truth: DataFrame,
      k: Int,
      queryCol: String = "query_id",
      itemCol: String = "vec_id",
      rankCol: String = "rank"): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    val w = discounts(k)
    val prefix = w.scanLeft(0.0)(_ + _).tail // idcg for truth sizes 1..k
    val wAt = element_at(array(w.map(lit): _*), col(rankCol).cast("int"))
    val idcgAt = element_at(array(prefix.map(lit): _*),
      least(lit(k), col("nt")).cast("int"))
    val hits = run
      .select(col(queryCol).as("query_id"), col(itemCol).as("item"),
        col(rankCol).as(rankCol))
      .where(col(rankCol) <= k)
      .join(truth.select(col(queryCol).as("query_id"), col(itemCol).as("item"))
          .withColumn("__rel", lit(1L)),
        Seq("query_id", "item"), "left")
      .withColumn("hit", coalesce(col("__rel"), lit(0L)))
    val perQuery = hits.groupBy(col("query_id")).agg(
      sum(col("hit")).as("n_hits"),
      min(when(col("hit") === 1, col(rankCol))).as("first_hit"),
      sum(when(col("hit") === 1, wAt).otherwise(lit(0.0))).as("dcg"))
    val tc = truth.groupBy(col(queryCol).as("query_id"))
      .agg(count(lit(1)).as("nt"))
    perQuery.join(tc, "query_id")
      .select(col("query_id"), col("n_hits"),
        round(col("n_hits").cast("double") / col("nt"), 6).as("recall_k"),
        round(when(col("first_hit").isNotNull,
          lit(1.0) / col("first_hit")).otherwise(lit(0.0)), 6).as("mrr"),
        round(col("dcg") / idcgAt, 6).as("ndcg"))
  }
}
