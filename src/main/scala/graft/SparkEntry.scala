package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator-inventory names to runnable DataFrame builders;
  * `oracleSql` gives a DuckDB-equivalent for every SQL-expressible one.
  * Column names/aliases match EXACTLY between the two (driver hash-compares
  * per-column after sorting columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises scan → two-phase aggregate → collect_list(struct) (the
    * reference's signature Gather shape).
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q04_gather")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (plus the
    * LLM-pipeline extensions: dedup, similarity, text analysis).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ FeatureQueries.queries ++ MetricsQueries.queries ++
      DedupQueries.queries ++ SimilarityQueries.queries ++ TextQueries.queries ++
      ClassificationQueries.queries ++ StreamingQueries.queries ++
      MultimodalQueries.queries ++ CurationQueries.queries ++
      TemporalQueries.queries ++ GraphQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops → driver
    * records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ FeatureQueries.oracles ++ MetricsQueries.oracles ++
      DedupQueries.oracles ++ SimilarityQueries.oracles ++ TextQueries.oracles ++
      ClassificationQueries.oracles ++ StreamingQueries.oracles ++
      MultimodalQueries.oracles ++ CurationQueries.oracles ++
      TemporalQueries.oracles ++ GraphQueries.oracles
}
