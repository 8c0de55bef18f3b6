package graft.dedup

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Substring-level exact deduplication: find every OVERLAPPING `k`-token
  * window whose normalized text occurs at least `minCount` times across
  * the whole corpus, merge each document's duplicated windows into
  * maximal spans, and report (and optionally cut) the duplicated token
  * ranges. The scalable fixed-k variant of suffix-array substring dedup
  * (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
  * Better"): a length-`>= k` substring shared by two documents is
  * exactly a run of shared k-shingles, so fixed-k shingle counts find
  * the same spans a suffix array would, at wordcount cost.
  *
  * Complements the dedup family: [[ExactDeduplicator]] kills whole-doc
  * copies, [[SegmentDeduplicator]] kills aligned fixed blocks (its
  * non-overlapping blocks miss duplicated text that straddles a block
  * boundary or starts mid-block); this pass catches duplication at ANY
  * token offset. Beyond-reference operator (LLM-pipeline extension).
  *
  * Scale shape: one explode to (id, pos, shingle-md5) — the fingerprint
  * is fixed-width, the text never shuffles — a partial-aggregated
  * wordcount over the md5 key, an equi-join of occurrences to the
  * duplicated-key set (no fan-out: one row per occurrence either side),
  * and a per-document lag window keyed by the HIGH-cardinality doc id.
  * Span arithmetic rides the lag: positions are sorted per doc, so the
  * running covered-end is `lag(pos)+k-1`, a new span starts when
  * `pos - lag(pos) >= k`, and an extension adds `pos - lag(pos)` newly
  * covered tokens. No self-join, no all-pairs, no per-row O(n²).
  */
class SubstringDeduplicator(
    val k: Int = 8,
    val minCount: Int = 2,
    val idCol: String = "doc_id",
    val textCol: String = "text") {
  require(k > 0, s"k ($k) must be positive")
  require(minCount >= 2, s"minCount ($minCount) must be >= 2 (1 marks everything)")

  /** (idCol, pos, fp): md5 fingerprint of each overlapping k-token
    * shingle, pos 1-based. Documents shorter than k tokens emit nothing.
    * `sequence` is guarded: Spark's sequence(1, 0) counts DOWN, so the
    * upper bound must be clamped before, not after.
    */
  def shingles(docs: Dataset[_]): DataFrame = {
    val kk = k
    docs.select(col(idCol), TextNormalizer.tokens(col(textCol)).as("tl"))
      .where(size(col("tl")) >= kk)
      .select(col(idCol),
        explode(org.apache.spark.sql.functions.transform(
          sequence(lit(1), size(col("tl")) - (kk - 1)),
          i => struct(i.cast("int").as("pos"),
            md5(array_join(slice(col("tl"), i, lit(kk)), " ")).as("fp")))).as("s"))
      .select(col(idCol), col("s.pos").as("pos"), col("s.fp").as("fp"))
  }

  /** Fingerprints occurring >= minCount times corpus-wide (within-doc
    * repeats count — a doc repeating itself is duplication too).
    */
  def duplicatedFingerprints(docs: Dataset[_]): DataFrame =
    shingles(docs).groupBy(col("fp")).agg(count(lit(1)).as("occurrences"))
      .where(col("occurrences") >= minCount)

  /** Per-document duplicated-span statistics, one row per input document:
    * (idCol, n_tokens, dup_spans, dup_tokens, clean_tokens). Documents
    * with no duplicated shingle report zeros.
    */
  def transform(docs: Dataset[_]): DataFrame = {
    val kk = k
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val dupPositions = shingles(docs)
      .join(duplicatedFingerprints(docs).select("fp"), "fp")
      .withColumn("prev", lag(col("pos"), 1).over(byDoc))
      // first position of a doc, or a gap the previous window can't reach
      .withColumn("fresh", col("prev").isNull || (col("pos") - col("prev") >= kk))
      .withColumn("added",
        when(col("fresh"), lit(kk)).otherwise(col("pos") - col("prev")))
    val perDoc = dupPositions.groupBy(col(idCol)).agg(
      sum(when(col("fresh"), 1L).otherwise(0L)).as("dup_spans"),
      sum(col("added")).cast("long").as("dup_tokens"))
    docs.select(col(idCol), size(TextNormalizer.tokens(col(textCol))).as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (col("n_tokens") - coalesce(col("dup_tokens"), lit(0L))).as("clean_tokens"))
  }

  /** Documents with every duplicated span cut out: (idCol, clean_text).
    * A token survives iff no duplicated k-window covers it. The covered
    * index set is built per doc from its duplicated start positions
    * (bounded by document length) and applied row-locally.
    */
  def clean(docs: Dataset[_]): DataFrame = {
    val kk = k
    val starts = shingles(docs)
      .join(duplicatedFingerprints(docs).select("fp"), "fp")
      .groupBy(col(idCol)).agg(sort_array(collect_list(col("pos"))).as("starts"))
    val fx = org.apache.spark.sql.functions
    docs.select(col(idCol), TextNormalizer.tokens(col(textCol)).as("tl"))
      .join(starts, Seq(idCol), "left")
      .withColumn("st", coalesce(col("starts"), array().cast("array<int>")))
      .select(col(idCol),
        array_join(
          fx.transform(
            fx.filter(
              // (element, index) transform — index is 0-based, pos 1-based
              fx.transform(col("tl"), (t, i) => struct(t.as("t"),
                exists(col("st"),
                  p => (i + 1).between(p, p + (kk - 1))).as("covered"))),
              s => !s.getField("covered")),
            s => s.getField("t")),
          " ").as("clean_text"))
  }
}
