package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding preprocessing: mean-center the corpus (subtract the global
  * per-dimension mean) and L2-normalize each vector — the standard prepass
  * before cosine retrieval / ANN indexing ([[IvfCosineIndex]],
  * [[RandomHyperplaneLSH]]): centering removes the "hubness" bias of a
  * nonzero corpus mean, and unit norm makes cosine a plain dot product.
  *
  * Scale shape: pass 1 reduces the corpus to ONE mean-vector row
  * (posexplode + per-dimension avg — partial-aggregated, `dim` rows of
  * state); pass 2 broadcasts that row and rewrites each vector row-locally
  * (zip_with/transform, no shuffle of the corpus). At 100 TB the big table
  * is scanned twice and shuffled never.
  */
class EmbeddingNormalizer(val inputCol: String = "embedding") {

  /** One-row DataFrame holding the global per-dimension mean as `mu`. */
  def meanVector(df: DataFrame): DataFrame =
    df.select(posexplode(col(inputCol)).as(Seq("dim", "x")))
      .groupBy(col("dim")).agg(avg(col("x")).as("mu"))
      // `functions.transform` spelled out: the class's own `transform`
      // (DataFrame) shadows the array HOF here
      .agg(org.apache.spark.sql.functions.transform(
        array_sort(collect_list(struct(col("dim"), col("mu")))),
        s => s.getField("mu")).as("mu"))

  /** Input with `<inputCol>_norm`: mean-centered, L2-normalized (zero
    * vectors stay zero rather than dividing by zero).
    */
  def transform(df: DataFrame): DataFrame = {
    // materialize `centered` and `nrm` once each: lambda-bearing
    // expressions are not reliably CSE'd, so inlining them into
    // when/otherwise (and the norm into the per-element division lambda)
    // multiplies the per-row work; CollapseProject keeps multiply-used
    // non-cheap projections as separate steps
    df.crossJoin(broadcast(meanVector(df)))
      .withColumn("__centered", zip_with(col(inputCol), col("mu"), (x, m) => x - m))
      .withColumn("__nrm",
        sqrt(aggregate(col("__centered"), lit(0.0d), (acc, v) => acc + v * v)))
      .withColumn(s"${inputCol}_norm",
        when(col("__nrm") === 0.0, col("__centered"))
          .otherwise(org.apache.spark.sql.functions.transform(
            col("__centered"), x => x / col("__nrm"))))
      .drop("mu", "__centered", "__nrm")
  }
}
