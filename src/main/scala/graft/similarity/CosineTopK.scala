package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sql.functions.cosineSimilarity

/** Brute-force exact top-k cosine neighbor search — the correctness
  * baseline for the LSH variant (and the right plan when the query set is
  * small: broadcast-nested-loop streams the big side once, no shuffle of
  * the candidate table).
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * Scale: the query set is broadcast (must fit in one executor; typical ANN
  * workloads query 10s-1000s of probes against billions of candidates) and
  * every candidate partition is scanned exactly once. The per-query rank is
  * a window PARTITIONED by query id — parallel across queries. For large
  * query sets use [[RandomHyperplaneLSH.searchTopK]] instead.
  */
class CosineTopK(
    k: Int,
    idCol: String = "vec_id",
    vecCol: String = "embedding") {
  require(k > 0, s"k ($k) must be positive")

  private def dvec(c: Column): Column = c.cast("array<double>")

  /** (query_id, vec_id, cosine, rank) — k nearest candidates per query by
    * cosine, ties broken by candidate id. Self-pairs (same id) excluded.
    */
  def search(queries: DataFrame, candidates: DataFrame): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), dvec(col(vecCol)).as("qv"))
    // spread: |queries| cosine kernels per candidate row; a single-split
    // candidate file would run them all on one task
    val c = graft.sql.functions.spread(
      candidates.select(col(idCol), dvec(col(vecCol)).as("cv")), col(idCol))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col(idCol))
    c.join(broadcast(q), col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol),
        cosineSimilarity(col("qv"), col("cv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
