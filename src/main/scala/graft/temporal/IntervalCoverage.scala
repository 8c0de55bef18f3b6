package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key interval union (gaps-and-islands): merge overlapping or
  * touching [start, end) intervals and report each key's total covered
  * span and merged-interval count — "how long was this user actually
  * active", "what fraction of the day did the pipeline hold the lock",
  * the standard de-overlapping that a naive `sum(end - start)` double-
  * counts.
  *
  * Semantics: intervals sort by (start, end); an interval starts a new
  * island iff its start is strictly greater than the running max end of
  * everything before it (touching intervals — start == previous end —
  * MERGE, the half-open convention). Islands reduce to
  * [min start, max end]; coverage is the sum of island lengths.
  *
  * Beyond-reference operator (temporal family). Scale: one hash shuffle
  * on the key + one per-key sort (the same cost class as any keyed
  * window), then a partial-aggregated island rollup — never a self-join,
  * never interval × interval work. A hot key serializes only its own
  * partition, and the island rollup shrinks rows before anything else
  * happens.
  */
class IntervalCoverage(
    keyCol: String = "user_id",
    startCol: String = "start_us",
    endCol: String = "end_us") {

  /** (keyCol, covered, n_islands, first_start, last_end) per key. Rows
    * with NULL start/end or end <= start are dropped (zero-length or
    * malformed intervals cover nothing).
    */
  def coverage(df: DataFrame): DataFrame = {
    val valid = df
      .where(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(endCol) > col(startCol))
      .select(col(keyCol), col(startCol).cast("long").as("__s"),
        col(endCol).cast("long").as("__e"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__s"), col("__e"))
    val prevMax = max(col("__e"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val islands = valid
      .withColumn("__new",
        when(prevMax.isNull || col("__s") > prevMax, 1L).otherwise(0L))
      .withColumn("__island", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__island"))
      .agg(min(col("__s")).as("__is"), max(col("__e")).as("__ie"))
    islands.groupBy(col(keyCol))
      .agg(sum(col("__ie") - col("__is")).as("covered"),
        count(lit(1)).as("n_islands"),
        min(col("__is")).as("first_start"),
        max(col("__ie")).as("last_end"))
  }
}
