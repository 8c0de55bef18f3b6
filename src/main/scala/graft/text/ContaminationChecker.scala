package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.dedup.TextNormalizer

/** Benchmark decontamination: per corpus document, how many of its
  * distinct token n-grams also appear in a benchmark/eval set — the
  * n-gram-overlap check training pipelines run before shipping a corpus
  * (the GPT-3/PaLM-style "13-gram overlap" rule, parameterized here).
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * Scale shape: the benchmark side is small by nature (eval suites are
  * thousands of examples, not billions), so its distinct gram set is
  * BROADCAST and the corpus side streams through one hash join — no
  * shuffle of the 100 TB side; per-doc totals then aggregate on doc id.
  * The n-gram fan-out reuses the native [[graft.sql.expressions.Shingles]]
  * kernel. Documents shorter than n tokens have zero grams and report
  * zero overlap.
  */
class ContaminationChecker(
    n: Int = 8,
    idCol: String = "doc_id",
    textCol: String = "text") {

  require(n >= 2, s"n-gram width n ($n) must be >= 2")

  /** Distinct token n-grams: (id, gram); docs with < n tokens emit none.
    * Short docs are dropped AFTER the explode by gram width (a true n-gram
    * joins n tokens with exactly n-1 spaces; a < n-token doc yields one
    * narrower gram): a pre-explode `size(tokens) >= n` filter gets pushed
    * through the projection into the scan's DataFilters, re-evaluating the
    * whole tokenizer chain per row.
    */
  private def grams(df: Dataset[_]): DataFrame =
    df.select(col(idCol), TextNormalizer.tokens(col(textCol)).as("__tl"))
      .select(col(idCol),
        explode_outer(array_distinct(
          org.apache.spark.sql.GraftBridge.column(
            graft.sql.expressions.Shingles(
              org.apache.spark.sql.GraftBridge.expression(col("__tl")), n))))
          .as("gram"))
      .where(length(col("gram")) - length(replace(col("gram"), lit(" "), lit(""))) === n - 1)

  /** (id, n_grams, hit_grams, overlap_ratio) for every corpus row;
    * ratio 0 for gram-less (short) documents.
    */
  def check(corpus: Dataset[_], benchmark: Dataset[_]): DataFrame = {
    val benchGrams = grams(benchmark).select(col("gram")).distinct()
    val cg = grams(corpus)
    val counts = cg
      .join(broadcast(benchGrams.withColumn("__hit", lit(1))), Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0))).cast("long").as("hit_grams"))
    corpus.select(col(idCol)).distinct()
      .join(counts, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("hit_grams"), lit(0L)).as("hit_grams"),
        coalesce(round(col("hit_grams") / col("n_grams"), 6), lit(0.0))
          .as("overlap_ratio"))
  }
}
