package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.TextNormalizer

/** Streaming exact deduplication: drop rows whose normalized-text
  * fingerprint was already seen, with a watermark bounding how long each
  * fingerprint is remembered — the continuous-ingest counterpart of
  * [[graft.dedup.ExactDeduplicator]] (same sha2-256-over-normalized-text
  * identity, so batch backfill and streaming ingest dedup identically).
  *
  * Built on `dropDuplicatesWithinWatermark`: state for a fingerprint is
  * dropped once the watermark passes it, so state size tracks the
  * watermark window (bounded), not the corpus (unbounded) — the only
  * formulation that survives an always-on 100 TB/day ingest. Within the
  * window, duplicates are eliminated exactly; a duplicate arriving after
  * its original's state expired starts fresh (the documented at-least-once
  * dedup contract of watermarked streaming dedup).
  */
object StreamingDedup {

  /** Fingerprint column shared with the batch deduplicator. */
  def fingerprint(text: Column): Column =
    sha2(TextNormalizer.normalize(text), 256)

  /** Appends `fingerprint` and drops in-window duplicates. On a
    * streaming frame `tsCol` is the event-time column and `delay` the
    * watermark (how long duplicates are remembered). On a BATCH frame —
    * the backfill half of the parity contract — the whole input is one
    * window, so this degenerates to a plain fingerprint dropDuplicates
    * (`dropDuplicatesWithinWatermark` itself refuses batch frames); the
    * kept row per fingerprint is arbitrary either way, so the
    * deterministic surface is the fingerprint set (q177's oracle).
    */
  def dedup(df: DataFrame, textCol: String, tsCol: String, delay: String): DataFrame = {
    val fp = df.withColumn("fingerprint", fingerprint(col(textCol)))
    if (!df.isStreaming) fp.dropDuplicates("fingerprint")
    else fp.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark("fingerprint")
  }
}
