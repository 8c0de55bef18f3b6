package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** T5-style span-corruption pairs (Raffel et al., "Exploring the Limits of
  * Transfer Learning with a Unified Text-to-Text Transformer", JMLR 2020,
  * §3.1.4 "denoising objective"): mask contiguous token spans, replace
  * each span with a numbered sentinel in the INPUT, and emit the masked
  * spans behind their sentinels (plus a terminal sentinel) as the TARGET —
  * the (input, target) seq2seq pair denoising pretraining trains on.
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * Token masking is a DETERMINISTIC md5 coin per (salt, doc, position) —
  * the [[graft.sampling.HashSampler]] discipline: membership depends only
  * on (salt, id, pos), stable across runs, partitions, cluster sizes, and
  * engines (the SQL oracle replays it exactly). Span lengths emerge from
  * independent per-token coins (adjacent masked tokens merge into one
  * span) — the "i.i.d. corruption then merge" variant.
  *
  * Scale: ONE row-local fold per document (a single `aggregate` over the
  * token positions carrying (input, target, span-count, prev-masked)
  * state) — no explode, no per-token shuffle, no window; corrupting a
  * 100 TB corpus is a streamed map with zero exchanges. The invariant the
  * spec pins: merging input and target at matching sentinels reconstructs
  * the original token sequence exactly.
  */
object SpanCorruption {

  /** Adds `corrupted_input` and `target` columns for `textCol`. The token
    * split is plain whitespace with empties dropped (case and punctuation
    * preserved — corruption must not normalize the text it corrupts).
    * `ratePercent` is the per-token masking probability in percent (T5
    * default ≈ 15). Empty text yields ("", "<extra_id_0>").
    */
  def corrupt(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      ratePercent: Int = 15,
      salt: String = "span"): DataFrame = {
    require(ratePercent >= 0 && ratePercent <= 100,
      s"ratePercent ($ratePercent) must be in 0..100")
    // masked(i): the engine-portable integer coin (DuckDB replay:
    // ('0x' || substr(md5(...), 1, 8))::BIGINT % 100 < rate). Evaluated
    // ONCE per token into __sc_mask — Spark does no common-subexpression
    // elimination inside HOF lambdas, so referencing the md5 directly from
    // the fold's five branch conditions would hash every token ~5x.
    val mskAt =
      s"CAST(conv(substring(md5(concat('$salt', ':', CAST($idCol AS STRING), ':', " +
        s"CAST(i AS STRING))), 1, 8), 16, 10) AS BIGINT) % 100 < $ratePercent"
    def msk(i: String): String = s"element_at(__sc_mask, $i + 1)"
    // sequence(0, -1) DESCENDS ([0, -1]) rather than yielding an empty
    // range, so the zero-token case needs its own branch
    val fold =
      s"""CASE WHEN size(__sc_toks) = 0
         |  THEN named_struct('corrupted_input', '', 'target', '<extra_id_0>')
         |ELSE aggregate(
         |  sequence(0, size(__sc_toks) - 1),
         |  named_struct('inp', CAST('' AS STRING), 'tgt', CAST('' AS STRING),
         |               'k', 0, 'prev', false),
         |  (acc, i) -> named_struct(
         |    'inp', CASE
         |      WHEN NOT (${msk("i")})
         |        THEN concat(acc.inp, ' ', element_at(__sc_toks, i + 1))
         |      WHEN NOT acc.prev
         |        THEN concat(acc.inp, ' <extra_id_', CAST(acc.k AS STRING), '>')
         |      ELSE acc.inp END,
         |    'tgt', CASE
         |      WHEN (${msk("i")}) AND NOT acc.prev
         |        THEN concat(acc.tgt, ' <extra_id_', CAST(acc.k AS STRING), '> ',
         |                    element_at(__sc_toks, i + 1))
         |      WHEN (${msk("i")})
         |        THEN concat(acc.tgt, ' ', element_at(__sc_toks, i + 1))
         |      ELSE acc.tgt END,
         |    'k', acc.k + CASE WHEN (${msk("i")}) AND NOT acc.prev THEN 1 ELSE 0 END,
         |    'prev', (${msk("i")})),
         |  acc -> named_struct(
         |    'corrupted_input', ltrim(acc.inp),
         |    'target', ltrim(concat(acc.tgt, ' <extra_id_', CAST(acc.k AS STRING), '>'))))
         |END""".stripMargin
    df
      .withColumn("__sc_toks",
        expr(s"filter(split($textCol, '\\\\s+'), t -> t != '')"))
      // sequence(0, -1) descends, so guard the zero-token case here too
      .withColumn("__sc_mask", expr(
        s"""CASE WHEN size(__sc_toks) = 0 THEN array()
           |ELSE transform(sequence(0, size(__sc_toks) - 1), i -> $mskAt) END""".stripMargin))
      .withColumn("__sc_pair", expr(fold))
      .withColumn("corrupted_input", col("__sc_pair.corrupted_input"))
      .withColumn("target", col("__sc_pair.target"))
      .drop("__sc_toks", "__sc_mask", "__sc_pair")
  }
}
