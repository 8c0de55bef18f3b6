package graft.sampling

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.text.UnigramLM

/** DSIR-style importance resampling for training-data selection (after
  * Xie et al. 2023, "Data Selection for Language Models via Importance
  * Resampling"): score every document by the log-likelihood ratio of a
  * TARGET-domain unigram LM against the BASE (whole-corpus) LM, then keep
  * documents with a deterministic hash coin of acceptance probability
  * `rate · exp(score)` — documents that look like the target domain are
  * kept proportionally more often. The standard play for tilting a
  * web-scale corpus toward a quality/domain slice without hard filtering.
  *
  * Beyond-reference operator (LLM-pipeline extension).
  *
  * Scale shape: both LMs are DataFrames (token, count) — never driver
  * state — built by [[UnigramLM.fit]]'s wordcount; scoring explodes the
  * corpus token stream once and left-joins the two vocab-keyed models
  * (AQE broadcasts small vocabs), re-aggregating per document. The coin
  * is the engine's md5-membership discipline (HashSampler/Downsampling):
  * row-local, seed-free, and replayable as ANSI SQL by the oracle.
  * Boundary note: the threshold involves exp/ln doubles computed by two
  * engines; a document flips only if its uniform 2^32 hash lands inside
  * the ~1 ulp disagreement window (odds ~1e-13 per doc).
  *
  * DEVIATION from the paper: the score is the MEAN per-token log-ratio (a
  * length-normalized geometric mean of the token likelihood ratios),
  * where Xie et al. weight by the raw SUMMED log-ratio. The sum makes the
  * acceptance odds scale exponentially with document length (long
  * on-target documents saturate, long off-target documents vanish); the
  * mean scores the per-token domain affinity independent of length,
  * which composes better with a separate length policy (QualityFilter
  * bounds, TokenPacker budgets). Callers wanting paper semantics can
  * multiply: `sum_score = score * n_tokens` — both columns are returned.
  */
class ImportanceSampler(
    val alpha: Double = 0.5,
    val rate: Double = 0.5,
    val idCol: String = "doc_id",
    val textCol: String = "text") {
  require(alpha > 0, s"alpha ($alpha) must be positive")
  require(rate > 0, s"rate ($rate) must be positive")

  /** (idCol, n_tokens, score): per-document mean token log-ratio
    * `ln P_target(w) - ln P_base(w)`, each add-alpha smoothed over its own
    * (N + alpha·V).
    */
  def score(docs: Dataset[_], target: Dataset[_]): DataFrame = {
    val lm = new UnigramLM(alpha, idCol, textCol)
    val base = lm.fit(docs)
    val tgt = lm.fit(target)
    val totals = base.agg(
      sum(col("c")).cast("double").as("nb"),
      count(lit(1)).cast("double").as("vb"))
      .crossJoin(tgt.agg(
        sum(col("c")).cast("double").as("nt"),
        count(lit(1)).cast("double").as("vt")))

    docs.select(col(idCol), graft.dedup.TextNormalizer.tokens(col(textCol)).as("tl"))
      .select(col(idCol), explode_outer(col("tl")).as("tok"))
      .where(col("tok").isNotNull) // NULL-text docs score nothing (matches unnest)
      .join(base.withColumnRenamed("c", "cb"), Seq("tok"), "left")
      .join(tgt.withColumnRenamed("c", "ct"), Seq("tok"), "left")
      .crossJoin(broadcast(totals))
      .select(col(idCol),
        (log((coalesce(col("ct"), lit(0L)).cast("double") + alpha) /
            (col("nt") + col("vt") * alpha)) -
          log((coalesce(col("cb"), lit(0L)).cast("double") + alpha) /
            (col("nb") + col("vb") * alpha))).as("lr"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), avg(col("lr")).as("score"))
  }

  /** [[score]] plus the deterministic selection: keep iff
    * `uniformHash(idCol) < rate · exp(score)`. Returns
    * (idCol, n_tokens, score, kept).
    */
  def select(docs: Dataset[_], target: Dataset[_]): DataFrame = {
    val h = graft.sql.functions.uniform32("dsir", col(idCol))
    score(docs, target)
      .withColumn("kept",
        h.cast("double") < lit(rate) * exp(col("score")) * 4294967296.0)
  }
}
