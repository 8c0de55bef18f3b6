package graft.classification

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.similarity.CosineTopK

/** k-nearest-neighbor classification over an embedding column: each query
  * vector takes the majority label of its k nearest labeled neighbors by
  * cosine — the standard label-propagation / weak-labeling step of a
  * training-data pipeline (propagate a seed taxonomy onto unlabeled
  * documents via their embeddings).
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * Deterministic contract: neighbor ties break by candidate id (inherited
  * from [[CosineTopK]]); vote ties break toward the SMALLEST label, so
  * the prediction is engine-replayable with no randomness.
  *
  * Scale: the neighbor search is [[CosineTopK]]'s broadcast-query scan —
  * right for bounded query batches against an unbounded corpus; swap in
  * `IvfCosineIndex`/`RandomHyperplaneLSH` search for huge query sets (the
  * voting tail is identical: a (query, label) count and one argmax
  * partial aggregation, both map-side combinable — no window, no sort).
  */
class KnnClassifier(
    k: Int,
    idCol: String = "vec_id",
    vecCol: String = "embedding",
    labelCol: String = "label") {
  require(k > 0, s"k ($k) must be positive")

  /** (query_id, predicted, votes): majority label among the k nearest
    * labeled neighbors and its vote count. Self-pairs excluded, so a
    * labeled corpus can be classified against itself (leave-one-out).
    */
  def predict(queries: DataFrame, labeled: DataFrame): DataFrame = {
    // argmax votes, ties to the SMALLEST label, as min_by over
    // (-votes, label): negating the COUNT (always numeric) instead of the
    // label keeps the tie-break working for ANY orderable label type — a
    // string taxonomy label under `-label` casts to double, which is NULL
    // under non-ANSI defaults (arbitrary per-run tie winners) and a
    // runtime cast error under ANSI
    val voteKey = struct((-col("votes")).as("__nv"), col(labelCol))
    new CosineTopK(k, idCol, vecCol).search(queries, labeled)
      .join(labeled.select(col(idCol), col(labelCol)), idCol)
      .groupBy(col("query_id"), col(labelCol))
      .agg(count(lit(1)).as("votes"))
      .groupBy(col("query_id"))
      .agg(
        min_by(col(labelCol), voteKey).as("predicted"),
        max(col("votes")).as("votes"))
  }
}
