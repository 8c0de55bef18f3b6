package graft.sql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SQL function façade — the engine's equivalent of the reference's
  * `org.apache.spark.sql.ext.functions` (reference:
  * sparkext-sql/src/main/scala/org/apache/spark/sql/ext/functions.scala:9-17).
  *
  * The reference's `collectArray` exists only as a Spark-1.5 workaround for
  * SPARK-9301; modern Spark's `collect_list` has identical semantics (skips
  * nulls, keeps duplicates, empty array for an all-null/empty group) and is
  * planned as an ObjectHashAggregateExec with automatic partial/final split —
  * the hand-rolled `CollectArray.asPartial` (reference aggregates.scala:17-22)
  * is what Catalyst already does.
  */
object functions {

  /** Collect all non-null values of the column into an array (duplicates
    * kept, order unspecified — same contract as the reference).
    */
  def collectArray(e: Column): Column = collect_list(e)

  /** Deterministic variant for result comparison: element-sorted array. */
  def collectArraySorted(e: Column): Column = array_sort(collect_list(e))

  /** Cosine similarity between two ARRAY&lt;FLOAT|DOUBLE&gt; columns.
    * Pure built-in expressions (zip_with + aggregate) so it stays inside
    * whole-stage codegen — no UDF. Returns DOUBLE.
    */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, v) => acc + v * v))
    dot / (na * nb)
  }

  /** Dot product of two numeric array columns (codegen-friendly). */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  /** L2 norm of a numeric array column. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))
}
