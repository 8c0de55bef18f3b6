package graft.sql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Layout-optimized batch writer: range-partition the table by a clustering
  * key, sort within partitions, and write parquet — the write-side half of
  * multi-dimensional data clustering (pair with
  * [[graft.sql.functions.zorder]] as the key).
  *
  * Why this is a first-class 100 TB operator: a table clustered this way
  * has monotone, non-overlapping key ranges across files AND across row
  * groups within each file, so every parquet min/max statistic becomes a
  * tight pruning interval. A scan predicate on either z-ordered dimension
  * skips row groups at read time (Spark's parquet filter pushdown) and
  * lets table formats that track file-level stats skip whole files — the
  * difference between reading 100 TB and reading the ~1% a typical
  * dashboard predicate actually touches.
  *
  * Mechanics: `repartitionByRange` samples the key to build balanced range
  * bounds (one shuffle — the same cost any global sort pays),
  * `sortWithinPartitions` orders rows inside each task without a second
  * exchange, and `maxRecordsPerFile` bounds file size so a skewed range
  * doesn't produce a monster file. The clustering key is dropped before
  * the write when it was synthesized (`keyCol` absent from the input).
  */
class LayoutWriter(maxRecordsPerFile: Long = 1L << 20) {

  /** Write `df` to `path` clustered by `key` into `numRanges` sorted ranges. */
  def write(df: DataFrame, key: Column, numRanges: Int, path: String): Unit = {
    val hadKey = df.columns.contains(LayoutWriter.KeyCol)
    // clustering by an EXISTING '__cluster_key' column is fine (no-op
    // withColumn, column kept); synthesizing a DIFFERENT key under that
    // name would silently overwrite the user's data and persist it —
    // loud failure instead
    require(!hadKey || key.toString == LayoutWriter.KeyCol,
      s"input already has a '${LayoutWriter.KeyCol}' column; pass col(\"${LayoutWriter.KeyCol}\") " +
        "to cluster by it, or rename it before synthesizing a different key")
    val clustered = df.withColumn(LayoutWriter.KeyCol, key)
      .repartitionByRange(numRanges, col(LayoutWriter.KeyCol))
      .sortWithinPartitions(col(LayoutWriter.KeyCol))
    val out = if (hadKey) clustered else clustered.drop(LayoutWriter.KeyCol)
    out.write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
  }
}

object LayoutWriter {
  /** Synthesized clustering-key column name (dropped before write). */
  val KeyCol = "__cluster_key"
}
