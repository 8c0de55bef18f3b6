package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.dedup.TextNormalizer

/** Per-group corpus diversity statistics: token counts, type counts,
  * type-token ratio, and Shannon entropy of the token distribution (with
  * its normalized form H / ln(types)) — the standard dashboard for judging
  * whether a training-data source is varied or degenerate boilerplate.
  *
  * Beyond-reference operator (LLM-pipeline extension). Wordcount-shaped:
  * one (group, term) partial-aggregated count, then one per-group
  * aggregation using the algebraic identity
  *   H = ln(N) - Σ n·ln(n) / N
  * so entropy needs no per-term probability column, no second pass, and no
  * join back to group totals. Both shuffles key on (group, term) / group —
  * survives any corpus size.
  */
class CorpusDiversity(
    groupCol: String = "source",
    textCol: String = "text") {

  /** (group, n_tokens, n_types, ttr, entropy, norm_entropy) per group. */
  def stats(docs: Dataset[_]): DataFrame = {
    val terms = docs
      .select(col(groupCol),
        explode_outer(TextNormalizer.tokens(col(textCol))).as("term"))
      .where(col("term").isNotNull)
    val tc = terms.groupBy(col(groupCol), col("term")).agg(count(lit(1)).as("n"))

    tc.groupBy(col(groupCol))
      .agg(
        sum(col("n")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        (log(sum(col("n"))) - sum(col("n") * log(col("n"))) / sum(col("n")))
          .as("h"))
      .select(col(groupCol), col("n_tokens"), col("n_types"),
        round(col("n_types") / col("n_tokens").cast("double"), 6).as("ttr"),
        round(col("h"), 6).as("entropy"),
        round(when(col("n_types") > 1, col("h") / log(col("n_types").cast("double")))
          .otherwise(lit(0.0)), 6).as("norm_entropy"))
  }
}
