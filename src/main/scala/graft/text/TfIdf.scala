package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.TextNormalizer

/** TF-IDF top terms per document: term frequency × smoothed inverse
  * document frequency (`ln((N+1)/(df+1))`), ranked per doc — the classic
  * corpus-statistics featurization (keyword extraction, relevance
  * weighting).
  *
  * Beyond-reference operator (LLM-pipeline extension). Fully distributed
  * wordcount shape: (doc, term) counts and per-term document frequencies
  * are partial-aggregated groupBys; the corpus size joins in as one
  * broadcast scalar; ranking is a per-doc window. No driver-side
  * vocabulary, so unbounded vocabularies (URLs, ids) stay distributed —
  * unlike dictionary-based vectorizers.
  */
class TfIdf(
    topK: Int,
    idCol: String = "doc_id",
    textCol: String = "text") {

  require(topK > 0, s"topK ($topK) must be positive")

  /** (id, term, tf, df, tfidf, rnk): each document's topK terms by
    * (tfidf desc, term asc).
    */
  def topTerms(docs: Dataset[_]): DataFrame = {
    val toks = docs.select(col(idCol), TextNormalizer.tokens(col(textCol)).as("tl"))
    // document length rides through the explode as a grouping constant —
    // no separate per-doc length aggregation + join.
    // explode_OUTER: InferFiltersFromGenerate skips outer generates, so the
    // regexp tokenizer chain is not cloned into a `size(tokens) > 0` scan
    // filter re-evaluated per row on the interpreted path (measured up to
    // 50× elsewhere). `split` never returns an empty array, so outer adds
    // no rows; the isNotNull guard keeps null-text semantics identical.
    val terms = toks.select(col(idCol), size(col("tl")).cast("long").as("len"),
      explode_outer(col("tl")).as("term"))
      .where(col("term").isNotNull)
    val termCounts = terms.groupBy(col(idCol), col("len"), col("term"))
      .agg(count(lit(1)).as("c"))
    val docFreq = termCounts.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))

    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    termCounts
      .join(docFreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tf", col("c") / col("len"))
      .withColumn("tfidf",
        col("tf") * log((col("n_docs") + 1) / (col("df") + 1)))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= topK)
      .select(col(idCol), col("term"), round(col("tf"), 6).as("tf"),
        col("df"), round(col("tfidf"), 6).as("tfidf"),
        col("rnk").cast("long").as("rnk"))
  }
}
