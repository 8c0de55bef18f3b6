package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.TextNormalizer

/** Exact multi-phrase matching against a blocklist — the curation gate
  * "flag/count documents containing any of these N phrases" (unsafe
  * content lists, boilerplate markers, license strings). A per-row
  * `contains` sweep is O(N · len) per document and reshuffles nothing
  * but burns CPU linearly in the list size; this formulation is
  * wordcount-shaped instead: documents explode ONCE per distinct phrase
  * LENGTH into token k-grams, and matching is a broadcast equi-join of
  * those k-grams against the (tiny) phrase table — O(len · #lengths)
  * work per document, independent of N.
  *
  * Matching is over [[TextNormalizer]] tokens (case/punctuation
  * insensitive, the curation convention), so "Free Money!!" matches the
  * phrase "free money". Multiple occurrences count multiply; `counts` is
  * row-preserving (clean documents report 0/0).
  */
class PhraseMatcher(
    phrases: Seq[String],
    idCol: String = "doc_id",
    textCol: String = "text") {
  require(phrases.nonEmpty, "empty phrase list")

  /** Normalized phrase table rows: (phrase norm, token count), DISTINCT
    * after normalization — two input spellings collapsing to one norm
    * ("free money" / "Free\nMoney!") must join as ONE row, or every hit
    * count is multiplied by the duplicate factor. Phrases normalizing to
    * zero tokens are rejected loudly. */
  private val normed: Seq[(String, Int)] = phrases.map { p =>
    // whitespace map BEFORE the strip, mirroring TextNormalizer.normalize:
    // a "free\nmoney" phrase must become "free money", not "freemoney".
    // Locale.ROOT: Spark's lower() is locale-independent, and a tr-TR
    // default locale would lowercase "WIN" to "wın" (dotless ı) — which
    // the [a-z] strip then mangles, so the phrase never matches
    val toks = p.toLowerCase(java.util.Locale.ROOT)
      .replaceAll(TextNormalizer.UnicodeWhitespace, " ")
      .replaceAll("[^a-z0-9 ]", "").trim
      .split(" +").filter(_.nonEmpty).toSeq
    require(toks.nonEmpty, s"phrase '$p' normalizes to no tokens")
    (toks.mkString(" "), toks.size)
  }.distinct

  private val lengths: Seq[Int] = normed.map(_._2).distinct.sorted

  /** (idCol, n_hits, n_phrases): total phrase occurrences and distinct
    * phrases matched per document. */
  def counts(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val phraseDf = broadcast(
      spark.createDataFrame(normed).toDF("gram", "k"))
    val tl = docs.select(col(idCol), TextNormalizer.tokens(col(textCol)).as("tl"))
    // one k-gram stream per distinct phrase length; OUTER explode (house
    // rule: InferFiltersFromGenerate would clone the tokenizer into the
    // scan otherwise)
    val grams = lengths.map { k =>
      // sequence(0, n) DESCENDS when n < 0, so short docs guard to an
      // empty array (explode_outer keeps the row as a null gram, which
      // the inner join then ignores)
      val g = when(size(col("tl")) >= k,
        transform(sequence(lit(0), size(col("tl")) - k),
          i => array_join(slice(col("tl"), i + 1, lit(k)), " ")))
        .otherwise(typedLit(Seq.empty[String]))
      tl.select(col(idCol), lit(k).as("k"), explode_outer(g).as("gram"))
    }.reduce(_ unionByName _)
    val hits = grams.join(phraseDf, Seq("gram", "k"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"),
        count_distinct(col("gram")).as("n_phrases"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_phrases"), lit(0L)).as("n_phrases"))
  }
}
