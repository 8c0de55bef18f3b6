package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.dedup.TextNormalizer

/** Interpolated bigram language model scoring: per-document mean negative
  * log-likelihood under `lambda·P(w|prev) + (1-lambda)·P_uni(w)`, where
  * the bigram term is the MLE `c(prev,w)/c(prev)` and the unigram term is
  * add-alpha smoothed (the [[UnigramLM]] formula). The interpolation keeps
  * every token's probability positive, so unseen bigrams degrade to the
  * unigram floor instead of -inf — Jelinek-Mercer smoothing, the classic
  * perplexity-filter upgrade when unigram scores saturate.
  *
  * Beyond-reference operator (LLM-pipeline extension).
  *
  * Scale shape: both models are DataFrames keyed by token / token pair
  * (wordcount-shaped, partial-aggregated — never driver state). Scoring
  * derives each token's predecessor ROW-LOCALLY (the same zip_with slice
  * pair array as [[fitBigrams]] — a lag window would shuffle and sort the
  * whole exploded token stream just to look one element left inside an
  * array it already holds) and left-joins the two count tables on their
  * keys. The first token of a document has no predecessor and is excluded
  * from the mean — deterministic and oracle-replayable.
  */
class BigramLM(
    val lambda: Double = 0.7,
    val alpha: Double = 0.5,
    val idCol: String = "doc_id",
    val textCol: String = "text") {
  require(lambda >= 0 && lambda <= 1, s"lambda ($lambda) must be in [0, 1]")
  require(alpha > 0, s"alpha ($alpha) must be positive")

  /** (prev, tok, cbi) adjacent-pair counts over the fit corpus (within
    * documents only — no cross-document bigrams).
    */
  def fitBigrams(corpus: Dataset[_]): DataFrame =
    corpus.select(TextNormalizer.tokens(col(textCol)).as("tl"))
      .select(explode_outer(TextNormalizer.adjacentPairs(col("tl"))(
        (l, r) => struct(l.as("prev"), r.as("tok")))).as("p"))
      .where(col("p").isNotNull)
      .groupBy(col("p.prev").as("prev"), col("p.tok").as("tok"))
      .agg(count(lit(1)).as("cbi"))

  /** (idCol, n_scored, avg_nll): mean `-ln(lambda·cbi/cprev +
    * (1-lambda)·(cuni+alpha)/(N+alpha·V))` over tokens 2..n of each
    * document. Documents with fewer than two tokens get no row.
    */
  def fitScore(docs: Dataset[_]): DataFrame = {
    val uni = new UnigramLM(alpha, idCol, textCol).fit(docs)
    val bi = fitBigrams(docs)
    // c(prev) for the MLE denominator: sum of outgoing bigram counts — the
    // last token of each document continues nothing, so this is the count
    // of prev AS A PREDECESSOR, which is exactly the MLE normalizer
    val prevTotals = bi.groupBy(col("prev")).agg(sum(col("cbi")).as("cprev"))
    val totals = uni.agg(
      sum(col("c")).cast("double").as("n_total"),
      count(lit(1)).cast("double").as("v_size"))

    docs.select(col(idCol), TextNormalizer.tokens(col(textCol)).as("tl"))
      .select(col(idCol), explode_outer(TextNormalizer.adjacentPairs(col("tl"))(
        (l, r) => struct(l.as("prev"), r.as("tok")))).as("p"))
      .where(col("p").isNotNull)
      .select(col(idCol), col("p.prev").as("prev"), col("p.tok").as("tok"))
      .join(bi, Seq("prev", "tok"), "left")
      .join(prevTotals, Seq("prev"), "left")
      .join(uni.withColumnRenamed("c", "cuni"), Seq("tok"), "left")
      .crossJoin(broadcast(totals))
      .select(col(idCol),
        (-log(
          lit(lambda) * (coalesce(col("cbi"), lit(0L)).cast("double") /
            coalesce(col("cprev"), lit(1L)).cast("double")) +
          lit(1 - lambda) * ((coalesce(col("cuni"), lit(0L)).cast("double") + alpha) /
            (col("n_total") + col("v_size") * alpha)))).as("nll"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_scored"), round(avg(col("nll")), 6).as("avg_nll"))
  }
}
