package graft.text

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.dedup.TextNormalizer

/** Gopher-style repetition statistics per document: duplicate-token ratio
  * and most-frequent-bigram dominance — the "repetitious text" signals of
  * the Gopher paper's quality rules (Rae et al. 2021, §A1.1), used to drop
  * boilerplate/spam from training corpora.
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * Deliberately distributed, NOT row-local: per-doc n-gram mode via
  * higher-order expressions is O(tokens²) interpreted work per row, so the
  * counts run as the classic wordcount shape instead — explode → two-level
  * partial-aggregated groupBy on (doc, gram) then (doc) — which scales
  * like any keyed aggregation (the 100 TB path) and keeps every expression
  * inside codegen. Bigram fan-out reuses the native
  * [[graft.sql.expressions.Shingles]] kernel.
  *
  * Output columns:
  *  - `n_tokens`, `n_distinct_tokens`, `dup_token_ratio` (= 1 − distinct/n)
  *  - `top_bigram_count`, `n_bigrams`, `top_bigram_frac`
  *    (0 for docs with fewer than 2 tokens)
  */
class RepetitionStats(override val uid: String) extends Transformer
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("repetitionStats"))

  final val idCol: Param[String] = new Param[String](this, "idCol", "Document id column")
  final val textCol: Param[String] = new Param[String](this, "textCol", "Text column")

  setDefault(idCol -> "doc_id", textCol -> "text")

  def setIdCol(value: String): this.type = set(idCol, value)
  def setTextCol(value: String): this.type = set(textCol, value)

  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema)
    val id = col($(idCol))
    val toks = graft.sql.functions.spread(
      dataset.select(id, col($(textCol))), id)
      .select(id, TextNormalizer.tokens(col($(textCol))).as("tl"))

    val tokenStats = toks
      .select(id, explode_outer(col("tl")).as("tok"))
      .groupBy(id)
      .agg(count(col("tok")).as("n_tokens"),
        count_distinct(col("tok")).as("n_distinct_tokens"))

    // explode_outer: the gram array is non-empty, and a plain explode
    // would clone the kernel into a scan filter (InferFiltersFromGenerate).
    // Single-token docs are dropped AFTER the explode by gram width (a true
    // bigram contains exactly one space; tokens never do post-normalizer):
    // a pre-explode `size(tl) >= 2` filter gets pushed through the project
    // into the scan, re-evaluating the whole tokenizer chain per row — and
    // forks this branch onto a second scan instead of sharing `toks` with
    // tokenStats.
    val bigramStats = toks
      .select(id,
        explode_outer(org.apache.spark.sql.GraftBridge.column(
          graft.sql.expressions.Shingles(
            org.apache.spark.sql.GraftBridge.expression(col("tl")), 2))).as("bg"))
      .where(col("bg").contains(" "))
      .groupBy(id, col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(id)
      .agg(max(col("c")).as("top_bigram_count"), sum(col("c")).as("n_bigrams"))

    tokenStats.join(bigramStats, Seq($(idCol)), "left")
      .select(id,
        col("n_tokens"), col("n_distinct_tokens"),
        round(lit(1.0) - col("n_distinct_tokens") / col("n_tokens"), 6)
          .as("dup_token_ratio"),
        coalesce(col("top_bigram_count"), lit(0L)).as("top_bigram_count"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(round(col("top_bigram_count") / col("n_bigrams"), 6), lit(0.0))
          .as("top_bigram_frac"))
  }

  override def transformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(idCol)), s"id column ${$(idCol)} not found")
    require(schema($(textCol)).dataType == StringType,
      s"text column must be string, got ${schema($(textCol)).dataType}")
    StructType(Seq(
      schema($(idCol)),
      StructField("n_tokens", LongType),
      StructField("n_distinct_tokens", LongType),
      StructField("dup_token_ratio", DoubleType),
      StructField("top_bigram_count", LongType),
      StructField("n_bigrams", LongType),
      StructField("top_bigram_frac", DoubleType)))
  }

  override def copy(extra: ParamMap): RepetitionStats = defaultCopy(extra)
}

object RepetitionStats extends DefaultParamsReadable[RepetitionStats]
