package graft.text

import org.apache.spark.ml.linalg.{Vectors => MlVectors}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.dedup.TextNormalizer

/** Hashing-trick text featurizer (the fastText / quality-classifier
  * front-end): unigrams plus within-document bigrams are hashed into a
  * fixed `dim`-bucket space and counted — no learned vocabulary, no fit
  * step, and the feature space is identical across batches and jobs by
  * construction. Feed [[toVectors]] into
  * [[graft.classification.LocalLogisticRegression]] to train the
  * CCNet-style quality classifier that scores a corpus for curation.
  *
  * Beyond-reference operator (LLM-pipeline extension).
  *
  * Scale shape: one explode over the gram stream (built row-locally —
  * bigrams from the same zip_with slice pair array as [[BigramLM]]), one
  * partial-aggregated groupBy on (doc, bucket). The bucket hash is the
  * engine's md5 discipline (first 8 hex chars, uniform on 2^32, mod dim)
  * so the long-format output is replayable as ANSI SQL by the oracle —
  * unlike xxhash64, which DuckDB lacks. Vector assembly is a row-local
  * UDF over each document's bounded bucket list.
  */
class HashedNgramFeaturizer(
    val dim: Int = 1 << 18,
    val useBigrams: Boolean = true,
    val idCol: String = "doc_id",
    val textCol: String = "text") {
  require(dim > 0, s"dim ($dim) must be positive")

  private def bucketOf(gram: Column): Column =
    conv(substring(md5(concat(lit("hng:"), gram)), 1, 8), 16, 10)
      .cast("long") % dim

  /** (idCol, bucket, n): hashed gram counts in long format — the
    * oracle-checkable core. NULL-text documents emit no rows.
    */
  def features(docs: Dataset[_]): DataFrame = {
    val tl = col("tl")
    val pairs = zip_with(
      slice(tl, lit(1), greatest(size(tl) - 1, lit(0))),
      slice(tl, lit(2), greatest(size(tl) - 1, lit(0))),
      (l, r) => concat_ws(" ", l, r))
    val grams = if (useBigrams) concat(tl, pairs) else tl
    docs.select(col(idCol), TextNormalizer.tokens(col(textCol)).as("tl"))
      .select(col(idCol), explode_outer(grams).as("gram"))
      .where(col("gram").isNotNull)
      .groupBy(col(idCol), bucketOf(col("gram")).as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** (idCol, features): each document's bucket counts assembled into a
    * `dim`-sized sparse ML vector, ready for an Estimator.
    */
  def toVectors(docs: Dataset[_]): DataFrame = {
    val d = dim
    // one struct list keeps (bucket, n) pairs aligned by construction
    val assemble = udf { (bn: Seq[org.apache.spark.sql.Row]) =>
      val idx = bn.map(r => (r.getLong(0).toInt, r.getLong(1).toDouble))
        .sortBy(_._1).toArray
      MlVectors.sparse(d, idx.map(_._1), idx.map(_._2))
    }
    features(docs)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("bucket"), col("n"))).as("bn"))
      .select(col(idCol), assemble(col("bn")).as("features"))
  }
}
