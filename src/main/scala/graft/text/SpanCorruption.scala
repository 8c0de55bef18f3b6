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
    // ('0x' || substr(md5(...), 1, 8))::BIGINT % 100 < rate).
    val mskAt =
      s"CAST(conv(substring(md5(concat('$salt', ':', CAST($idCol AS STRING), ':', " +
        s"CAST(i AS STRING))), 1, 8), 16, 10) AS BIGINT) % 100 < $ratePercent"
    // The coin must be hashed exactly ONCE per token. Two shapes fail:
    // inlining mskAt into the fold's five branch conditions hashes every
    // token ~5x (no common-subexpression elimination inside HOF lambdas),
    // and precomputing a mask COLUMN then reading it via element_at is
    // O(n^2) md5s — CollapseProject inlines the whole transform(...) array
    // expression into every element_at reference, so each access rebuilds
    // the full mask (ScaleSmoke measured 110 s/5k docs for that shape).
    // The fix: zip the mask into the fold's INPUT — one (token, masked)
    // struct array built once per row, O(n) hashes total.
    // sequence(0, -1) DESCENDS ([0, -1]) rather than yielding an empty
    // range, so the zero-token case needs its own branch.
    val fold =
      s"""CASE WHEN size(__sc_toks) = 0
         |  THEN named_struct('corrupted_input', '', 'target', '<extra_id_0>')
         |ELSE aggregate(
         |  zip_with(__sc_toks,
         |    transform(sequence(0, size(__sc_toks) - 1), i -> $mskAt),
         |    (t, m) -> named_struct('tok', t, 'm', m)),
         |  named_struct('inp', CAST('' AS STRING), 'tgt', CAST('' AS STRING),
         |               'k', 0, 'prev', false),
         |  (acc, x) -> named_struct(
         |    'inp', CASE
         |      WHEN NOT x.m THEN concat(acc.inp, ' ', x.tok)
         |      WHEN NOT acc.prev
         |        THEN concat(acc.inp, ' <extra_id_', CAST(acc.k AS STRING), '>')
         |      ELSE acc.inp END,
         |    'tgt', CASE
         |      WHEN x.m AND NOT acc.prev
         |        THEN concat(acc.tgt, ' <extra_id_', CAST(acc.k AS STRING), '> ', x.tok)
         |      WHEN x.m THEN concat(acc.tgt, ' ', x.tok)
         |      ELSE acc.tgt END,
         |    'k', acc.k + CASE WHEN x.m AND NOT acc.prev THEN 1 ELSE 0 END,
         |    'prev', x.m),
         |  acc -> named_struct(
         |    'corrupted_input', ltrim(acc.inp),
         |    'target', ltrim(concat(acc.tgt, ' <extra_id_', CAST(acc.k AS STRING), '>'))))
         |END""".stripMargin
    df
      .withColumn("__sc_toks",
        expr(s"filter(split($textCol, '\\\\s+'), t -> t != '')"))
      .withColumn("__sc_pair", expr(fold))
      .withColumn("corrupted_input", col("__sc_pair.corrupted_input"))
      .withColumn("target", col("__sc_pair.target"))
      .drop("__sc_toks", "__sc_pair")
  }
}
