package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.TextNormalizer
import graft.sql.PrefixSum

/** Document packing into fixed-length training sequences — the pretraining
  * batch-prep step that concatenates the corpus token stream and cuts it
  * every `seqLen` tokens, recording which piece of which document lands in
  * which sequence (the span table a loader needs to build attention-mask
  * document boundaries). [[TokenPacker]] answers "which SHARD does each
  * whole document go to"; this answers the finer "which sequence gets
  * which token range", where documents straddle sequence boundaries.
  *
  * The whole computation is prefix-sum arithmetic: with `s_i` the
  * exclusive running token total in `idCol` order, document i occupies
  * the global token interval [s_i, s_i + n_i), so its spans are one row
  * per sequence k in [⌊s_i/L⌋, ⌊(s_i + n_i − 1)/L⌋] — derived ROW-LOCALLY
  * from (s_i, n_i) by a bounded `sequence` explode (≤ n_i/L + 1 rows).
  * No token is ever materialized: a 100 TB corpus ships one (count,
  * offset) pair per document through the two-phase [[PrefixSum]] (never a
  * global window), and the span fan-out is exactly the output size.
  *
  * Empty documents (0 tokens) produce no spans, by construction.
  */
class SequencePacker(
    seqLen: Long,
    idCol: String = "doc_id",
    textCol: String = "text") {
  require(seqLen > 0, s"seqLen ($seqLen) must be positive")

  /** One row per (document, sequence) span:
    * (idCol, n_tokens, seq_id, seq_off, doc_off, len) — `seq_off` is where
    * the span starts inside the sequence, `doc_off` where it starts inside
    * the document.
    */
  def spans(docs: DataFrame): DataFrame =
    spansOnCounts(docs.select(col(idCol),
      size(TextNormalizer.tokens(col(textCol))).cast("long").as("n_tokens")))

  /** [[spans]] from PRECOMPUTED per-document token counts — a frame of
    * (idCol, n_tokens). The real-tokenizer composition: production
    * loaders budget sequences on actual tokenizer output (e.g.
    * `BpeTrainer.segment` subword counts, q169), not the whitespace
    * count; the span arithmetic is identical either way.
    */
  def spansOnCounts(counts: DataFrame): DataFrame = {
    val counted = counts.select(col(idCol),
      col("n_tokens").cast("long").as("n_tokens"))
    val withStart =
      PrefixSum.exclusive(counted, idCol, "n_tokens", "start")
        .where(col("n_tokens") > 0)
    val L = lit(seqLen)
    // exact integer floor-div via the pmod trick (same reasoning as
    // Resampler: the numerator is an exact multiple of L, so the DOUBLE
    // division is exact and the cast is lossless)
    val firstSeq = ((col("start") - pmod(col("start"), L)) / L).cast("long")
    val lastTok = col("start") + col("n_tokens") - 1
    val lastSeq = ((lastTok - pmod(lastTok, L)) / L).cast("long")
    withStart
      .select(col(idCol), col("n_tokens"), col("start"),
        explode(sequence(firstSeq, lastSeq)).as("seq_id"))
      .withColumn("__sfrom", greatest(col("start"), col("seq_id") * L))
      .withColumn("__sto",
        least(col("start") + col("n_tokens"), (col("seq_id") + 1) * L))
      .select(col(idCol), col("n_tokens"), col("seq_id"),
        (col("__sfrom") - col("seq_id") * L).as("seq_off"),
        (col("__sfrom") - col("start")).as("doc_off"),
        (col("__sto") - col("__sfrom")).as("len"))
  }
}
