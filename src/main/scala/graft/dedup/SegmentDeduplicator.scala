package graft.dedup

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Segment-level exact deduplication (the CCNet/RefinedWeb "line dedup"
  * pass): split every document into segments, keep only the globally FIRST
  * occurrence of each distinct segment (order = lowest (doc id, position)),
  * and reassemble documents from their surviving segments — removing
  * boilerplate repeated across the corpus (headers, footers, navbars)
  * that document-level dedup can't touch.
  *
  * Segments are fixed `blockTokens`-token blocks of the normalized text
  * (paragraph/newline segmentation is not expressible downstream of
  * [[TextNormalizer]], which canonicalizes all whitespace to single
  * spaces). Beyond-reference operator (LLM-pipeline extension).
  *
  * Scale shape: one explode to (id, seg_idx, segment), ONE hash-partitioned
  * shuffle keyed by the segment's md5 fingerprint (never the text itself as
  * the window key — fingerprints keep the sort key fixed-width), a
  * first-occurrence `row_number`, and one keyed re-aggregation per doc.
  * No self-join, no all-pairs anything — the same discipline as
  * [[ExactDeduplicator]], applied sub-document.
  */
class SegmentDeduplicator(
    val blockTokens: Int = 16,
    val idCol: String = "doc_id",
    val textCol: String = "text") {
  require(blockTokens > 0, s"blockTokens ($blockTokens) must be positive")

  /** (idCol, seg_idx, segment): fixed-size token blocks of the normalized
    * text. OUTER explode — house guard against InferFiltersFromGenerate
    * cloning the tokenizer into a scan filter.
    */
  def segments(docs: Dataset[_]): DataFrame = {
    val b = blockTokens
    // Spark SQL `/` is DOUBLE division; sequence() needs integral bounds.
    val lastSeg = floor((size(col("tl")) - 1) / b).cast("int")
    // tokens("") = [] (TextNormalizer filters zero-length tokens), so a
    // blank/punctuation-only doc has lastSeg = -1 — and sequence(0, -1)
    // DESCENDS in Spark (yields [0, -1]), which would fabricate two
    // phantom segments. Gate the sequence to NULL for empty token lists
    // and drop the null row the outer explode emits for it: blank docs
    // contribute ZERO segments. (The oracle needs its own explicit
    // `len(tl) > 0` guard for the same case — DuckDB's // TRUNCATES
    // toward zero, so its (len-1)//16 range would keep i=0 for a blank
    // doc and emit one phantom '' segment.)
    val segIdxs = when(size(col("tl")) > 0, sequence(lit(0), lastSeg))
    docs.select(col(idCol), TextNormalizer.tokens(col(textCol)).as("tl"))
      .select(col(idCol), col("tl"), posexplode_outer(segIdxs))
      .where(col("col").isNotNull)
      .select(col(idCol), col("col").cast("int").as("seg_idx"),
        array_join(slice(col("tl"), col("col") * b + 1, lit(b)), " ").as("segment"))
  }

  /** (idCol, n_segments, kept_segments, clean_text): documents reassembled
    * from their globally-first segments (in original order; a document
    * whose every segment appeared earlier collapses to ''; a blank /
    * punctuation-only document has no segments and is absent from the
    * output entirely).
    */
  def transform(docs: Dataset[_]): DataFrame = {
    val first = Window.partitionBy(col("fp")).orderBy(col(idCol), col("seg_idx"))
    segments(docs)
      .withColumn("fp", md5(col("segment")))
      .withColumn("rn", row_number().over(first))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("kept_segments"),
        array_join(
          // fully qualified: the class's own `transform` shadows the import
          org.apache.spark.sql.functions.transform(
            array_sort(collect_list(when(col("rn") === 1,
              struct(col("seg_idx"), col("segment"))))),
            s => s.getField("segment")),
          " ").as("clean_text"))
  }
}
