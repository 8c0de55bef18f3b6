package graft.sql

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Dataset version diffing: classify every key across two snapshots as
  * added / removed / changed / unchanged by content fingerprint — the
  * ingest-ops report run before promoting a new corpus drop (how much
  * churn, what got silently rewritten, did the loader drop a shard).
  *
  * Beyond-reference operator (LLM-pipeline extension).
  *
  * Scale: each side reduces to (key, fingerprint) at the scan (sha2 of the
  * content column, projection-pruned), then ONE full-outer shuffle on the
  * key. No content strings travel through the join — only 256-bit hashes —
  * so the exchange is fixed-width regardless of document size.
  */
object SnapshotDiff {

  /** (key, status, fp_old, fp_new) for every key in either snapshot;
    * status ∈ added | removed | changed | unchanged.
    */
  def byKey(
      oldDf: Dataset[_],
      newDf: Dataset[_],
      keyCol: String,
      contentCol: String): DataFrame = {
    def fp(d: Dataset[_], alias: String) =
      d.select(col(keyCol).as(s"${alias}_key"),
        sha2(col(contentCol).cast("string"), 256).as(s"fp_$alias"))
    fp(oldDf, "old")
      .join(fp(newDf, "new"), col("old_key") === col("new_key"), "full_outer")
      .select(
        coalesce(col("old_key"), col("new_key")).as(keyCol),
        when(col("old_key").isNull, "added")
          .when(col("new_key").isNull, "removed")
          // null-safe inequality: a null-content side (fp = sha2(null) =
          // null) must read as CHANGED, not fall through to unchanged
          .when(!(col("fp_old") <=> col("fp_new")), "changed")
          .otherwise("unchanged").as("status"),
        col("fp_old"), col("fp_new"))
  }
}
