package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.dedup.TextNormalizer

/** Unigram language-model scoring: fit token frequencies over a (clean)
  * corpus, then score each document by its per-token negative
  * log-likelihood under the add-alpha-smoothed unigram model —
  * `nll = -mean(ln((c(tok) + alpha) / (N + alpha·V)))`.
  *
  * The CCNet-style quality gate: documents far from the corpus
  * distribution (high nll / perplexity) are boilerplate, noise, or the
  * wrong register; a threshold on `avg_nll` is the classic pretraining
  * filter. Beyond-reference operator (LLM-pipeline extension).
  *
  * Scale shape: the model IS a DataFrame (token, count) — never a driver
  * vocabulary — scoring joins the exploded token stream against it on the
  * token key (a plain shuffled equi-join that AQE broadcast-converts when
  * the vocab is small) and re-aggregates per document; the two scalars
  * (N, V) ride a broadcast literal join. Everything partial-aggregates.
  */
class UnigramLM(
    val alpha: Double = 0.5,
    val idCol: String = "doc_id",
    val textCol: String = "text") {
  require(alpha > 0, s"alpha ($alpha) must be positive")

  /** Unigram counts (tok, c) over the fit corpus. A NULL text yields a
    * null token list, whose explode_outer row is dropped — SQL `unnest`
    * of a NULL list yields no rows, and the oracle must agree.
    */
  def fit(corpus: Dataset[_]): DataFrame =
    corpus.select(TextNormalizer.tokens(col(textCol)).as("tl"))
      .select(explode_outer(col("tl")).as("tok"))
      .where(col("tok").isNotNull)
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))

  /** (idCol, n_tokens, avg_nll): per-document mean token negative
    * log-likelihood under `model` (a [[fit]] result). Unseen tokens get
    * the alpha floor via the left join's null count.
    */
  def score(docs: Dataset[_], model: DataFrame): DataFrame = {
    val totals = model.agg(
      sum(col("c")).cast("double").as("n_total"),
      count(lit(1)).cast("double").as("v_size"))
    docs.select(col(idCol), TextNormalizer.tokens(col(textCol)).as("tl"))
      .select(col(idCol), explode_outer(col("tl")).as("tok"))
      .where(col("tok").isNotNull) // NULL-text docs score nothing (matches unnest)
      .join(model, Seq("tok"), "left") // vocab-keyed equi-join; AQE broadcasts small vocabs
      .crossJoin(broadcast(totals))
      .select(col(idCol),
        // parens first: `-x.as("nll")` aliases x, then negates into an unnamed column
        (-log((coalesce(col("c"), lit(0L)).cast("double") + alpha) /
          (col("n_total") + col("v_size") * alpha))).as("nll"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), round(avg(col("nll")), 6).as("avg_nll"))
  }

  /** Fit on `corpus`, score `docs` in one call. */
  def fitScore(docs: Dataset[_]): DataFrame = score(docs, fit(docs))
}
