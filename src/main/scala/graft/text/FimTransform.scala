package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fill-in-the-middle transformation (Bavarian et al., "Efficient Training
  * of Language Models to Fill in the Middle", 2022): split a document at
  * two random token boundaries into (prefix, middle, suffix) and re-emit
  * it in PSM order — `<fim_prefix> P <fim_suffix> S <fim_middle> M` — so a
  * left-to-right LM learns infilling from the rearranged plain sequence
  * (the code-model pretraining staple). Applied to a deterministic
  * `ratePercent` subset of documents; the rest pass through (the paper's
  * ~50/50 joint training mix).
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * All three coins (document selection, both cut points) are the
  * engine-portable md5 integer idiom keyed on (salt, doc, role) — stable
  * across runs, partitions, and engines; the SQL oracle replays the exact
  * strings. Cut points are uniform over the n+1 token boundaries with
  * c1 = min, c2 = max, so middle spans are uniform-length including empty
  * (the paper keeps degenerate splits — they teach the format).
  *
  * Scale: row-local `slice` + one `concat_ws` over concatenated arrays —
  * no explode, no shuffle, no window; a streamed map at any corpus size.
  */
object FimTransform {

  /** Adds `fim_text` (PSM-rearranged or space-normalized pass-through)
    * and `fim_applied`. Tokens are whitespace-split with empties dropped;
    * pass-through docs are re-joined on single spaces so both branches
    * emit the same token stream modulo the three markers.
    */
  def transform(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      ratePercent: Int = 50,
      salt: String = "fim"): DataFrame = {
    require(ratePercent >= 0 && ratePercent <= 100,
      s"ratePercent ($ratePercent) must be in 0..100")
    // the engine's md5-membership coin, defined once in graft.sql.functions
    // (these three draws are top-level columns, not lambda-bound, so the
    // Column API applies — no interpolated SQL to keep in sync)
    def coin(role: String) = graft.sql.functions.uniform32(salt,
      concat(col(idCol).cast("string"), lit(":"), lit(role)))
    df
      .withColumn("__fim_toks",
        expr(s"filter(split($textCol, '\\\\s+'), t -> t != '')"))
      .withColumn("fim_applied", coin("sel") % 100 < ratePercent)
      .withColumn("__fim_a", coin("a") % (size(col("__fim_toks")) + 1))
      .withColumn("__fim_b", coin("b") % (size(col("__fim_toks")) + 1))
      .withColumn("__fim_c1", least(col("__fim_a"), col("__fim_b")).cast("int"))
      .withColumn("__fim_c2", greatest(col("__fim_a"), col("__fim_b")).cast("int"))
      .withColumn("fim_text", expr(
        """CASE WHEN fim_applied THEN concat_ws(' ',
          |  concat(array('<fim_prefix>'), slice(__fim_toks, 1, __fim_c1),
          |         array('<fim_suffix>'),
          |         slice(__fim_toks, __fim_c2 + 1, size(__fim_toks) - __fim_c2),
          |         array('<fim_middle>'),
          |         slice(__fim_toks, __fim_c1 + 1, __fim_c2 - __fim_c1)))
          |ELSE concat_ws(' ', __fim_toks) END""".stripMargin))
      .drop("__fim_toks", "__fim_a", "__fim_b", "__fim_c1", "__fim_c2")
  }
}
