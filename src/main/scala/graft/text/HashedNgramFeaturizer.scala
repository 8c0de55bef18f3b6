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
    graft.sql.functions.uniform32("hng", gram) % dim

  /** The per-document gram array (unigrams + optional bigrams), built
    * row-locally from the token array.
    */
  private def gramsOf(tl: Column): Column = {
    val pairs = TextNormalizer.adjacentPairs(tl)((l, r) => concat_ws(" ", l, r))
    if (useBigrams) concat(tl, pairs) else tl
  }

  private def gramsCol: Column = gramsOf(col("tl"))

  /** Row-local linear margin over the hashed grams: Σ_g weightOf(bucket(g)),
    * evaluated inside codegen with no explode, no shuffle and no join —
    * the scoring path for curation plans. Numerically identical to
    * `features(docs).groupBy(id).agg(sum(weightOf(bucket) * n))` (the sum
    * is over exact longs, so association order cannot change it), but the
    * corpus is scanned once and scored in place: at 100 TB the margin is
    * a map over the scan instead of a gram-explode shuffle joined back to
    * the corpus. NULL text scores NULL (the long-format inner-join shape
    * drops those documents; a `where` on any margin predicate does too).
    */
  def marginCol(text: Column, weightOf: Column => Column): Column =
    aggregate(
      org.apache.spark.sql.functions.transform(
        gramsOf(TextNormalizer.tokens(text)),
        g => weightOf(bucketOf(g)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Row-local score under a TRAINED linear model: intercept + Σ_g
    * coefficients(bucket(g)) — i.e. the margin of a
    * [[graft.classification.LocalLogisticRegression]] fit on
    * [[toVectors]], evaluated without materializing any vector: the
    * `dim`-sized coefficient array broadcasts as a literal into codegen
    * and each gram does one array lookup. This is the 100 TB scoring
    * path: train on a bounded labeled sample, then score the corpus as a
    * pure map over the scan. Float caveat: the gram-order double sum can
    * differ from a sparse-vector dot product in the last ulps (addition
    * is not associative) — equal to ~1e-12 relative, not bit-equal.
    */
  def scoreCol(text: Column, coefficients: Array[Double], intercept: Double): Column = {
    require(coefficients.length == dim,
      s"coefficient length ${coefficients.length} != dim $dim")
    val w = lit(coefficients)
    aggregate(
      org.apache.spark.sql.functions.transform(
        gramsOf(TextNormalizer.tokens(text)),
        g => element_at(w, bucketOf(g).cast("int") + 1)),
      lit(intercept), (acc, x) => acc + x)
  }

  /** (idCol, bucket, n): hashed gram counts in long format — the
    * oracle-checkable core. NULL-text documents emit no rows.
    */
  def features(docs: Dataset[_]): DataFrame =
    docs.select(col(idCol), TextNormalizer.tokens(col(textCol)).as("tl"))
      .select(col(idCol), explode_outer(gramsCol).as("gram"))
      .where(col("gram").isNotNull)
      .groupBy(col(idCol), bucketOf(col("gram")).as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** (idCol, features): each document's bucket counts assembled into a
    * `dim`-sized sparse ML vector, ready for an Estimator. Bucket
    * counting is per-document by construction, so this is fully
    * row-local — hashing in codegen over the gram array, counting in a
    * per-row UDF — with ZERO shuffles (features()'s groupBy exists only
    * for the long-format oracle contract).
    */
  def toVectors(docs: Dataset[_]): DataFrame = {
    val d = dim
    val assemble = udf { (buckets: Seq[Long]) =>
      val counts = scala.collection.mutable.TreeMap.empty[Int, Double]
      if (buckets != null)
        buckets.foreach(b => counts(b.toInt) = counts.getOrElse(b.toInt, 0.0) + 1.0)
      MlVectors.sparse(d, counts.keys.toArray, counts.values.toArray)
    }
    docs.select(col(idCol), TextNormalizer.tokens(col(textCol)).as("tl"))
      .select(col(idCol),
        org.apache.spark.sql.functions.transform(gramsCol, g => bucketOf(g)).as("bs"))
      .where(col("bs").isNotNull) // NULL-text docs emit no row, matching features()
      .select(col(idCol), assemble(col("bs")).as("features"))
  }
}
