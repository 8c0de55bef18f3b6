package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.dedup.TextNormalizer

/** Text-analysis column functions for training-data curation: token and
  * character statistics, quality scoring, n-gram-heuristic language ID,
  * BPE-ish token estimation, and rolling-hash document fingerprints.
  *
  * Beyond-reference operators (LLM-pipeline extension from the build
  * brief). Everything is a built-in Catalyst expression (split / filter /
  * aggregate / regexp) — no UDFs, stays inside whole-stage codegen, and
  * each function is replayable as ANSI SQL by the correctness oracle.
  */
object TextFunctions {

  /** Whitespace tokens of normalized text. */
  def tokens(text: Column): Column = TextNormalizer.tokens(text)

  /** Binds the normalized token array ONCE as a lambda value and evaluates
    * `f` against it — the public-API common-subexpression barrier. Catalyst
    * offers no way to share a subexpression across a filter predicate's
    * branches (pushdown re-inlines projected aliases), so a compound
    * predicate naively re-runs the normalize+split regex pipeline per
    * metric — measured 5× the single-pass cost on the quality filter.
    * A lambda argument, by contrast, is evaluated once per row by
    * construction.
    */
  def withTokens(text: Column)(f: Column => Column): Column =
    element_at(transform(array(tokens(text)), f), 1)

  /** [[withTokens]] plus the raw-text punctuation ratio bound alongside
    * (the char-level regex is the second repeated cost in compound
    * filters).
    */
  def withTokensAndPunct(text: Column)(f: (Column, Column) => Column): Column =
    element_at(transform(array(punctRatio(text)), p =>
      element_at(transform(array(tokens(text)), tl => f(tl, p)), 1)), 1)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Token-array variants of the metrics, for predicates that bind the
    * array once via [[withTokens]].
    */
  def tokenCountOf(tl: Column): Column = size(tl)

  def avgWordLengthOf(tl: Column): Column = {
    val totalLen = aggregate(tl, lit(0), (acc, t) => acc + length(t))
    when(size(tl) > 0, totalLen.cast("double") / size(tl)).otherwise(0.0)
  }

  /** Mean token length (normalized text; 0 for empty docs). */
  def avgWordLength(text: Column): Column = avgWordLengthOf(tokens(text))

  /** Fraction of characters that are not alphanumeric/space (raw text). */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      (length(text) - length(regexp_replace(lower(text), "[^a-z0-9 ]", "")))
        .cast("double") / length(text))
      .otherwise(0.0)

  /** Stopword lists for the language-ID heuristic (top function words). */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr" -> Seq("le", "les", "et", "est", "dans", "une", "pour", "pas", "vous", "sur"),
    "es" -> Seq("el", "los", "y", "es", "una", "en", "por", "para", "con", "del"))

  private def hitCountOf(tl: Column, words: Seq[String]): Column = {
    val arr = array(words.map(lit): _*)
    size(filter(tl, t => array_contains(arr, t)))
  }

  /** Number of tokens that are stopwords of the given language. */
  def stopwordHits(text: Column, lang: String): Column =
    hitCountOf(tokens(text), stopwords.toMap.apply(lang))

  def stopwordRatioOf(tl: Column): Column =
    when(size(tl) > 0,
      hitCountOf(tl, stopwords.toMap.apply("en")).cast("double") / size(tl))
      .otherwise(0.0)

  /** Fraction of tokens that are English stopwords. */
  def stopwordRatio(text: Column): Column = stopwordRatioOf(tokens(text))

  /** Heuristic language ID: argmax of per-language stopword hit counts,
    * first-listed language wins ties, "und" (undetermined) when no list
    * scores a hit. The token array is bound once across the four
    * language lists.
    */
  def languageIdOf(tl: Column): Column = {
    val hits = stopwords.map { case (lang, words) => lang -> hitCountOf(tl, words) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldRight(lit("und"): Column) { case ((lang, h), rest) =>
      when(h > 0 && h === best, lit(lang)).otherwise(rest)
    }
  }

  def languageId(text: Column): Column = withTokens(text)(languageIdOf)

  /** BPE-ish token-count estimate: alpha runs, digit runs, and individual
    * symbol characters each count as one token (a cheap stand-in for a
    * learned subword vocabulary).
    */
  def bpeTokenEstimate(text: Column): Column =
    regexp_count(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))

  /** Composite quality score in [0,1]: rewards reasonable length, low
    * punctuation density, a natural stopword rate, and mid-range word
    * lengths (the usual heuristic-filter features per Gopher/C4 rules).
    */
  def qualityScoreOf(tl: Column, punct: Column): Column = {
    val lengthTerm = least(tokenCountOf(tl).cast("double") / 100.0, lit(1.0))
    val punctTerm = greatest(lit(0.0), lit(1.0) - punct * 4.0)
    val stopTerm = least(stopwordRatioOf(tl) * 3.0, lit(1.0))
    val awl = avgWordLengthOf(tl)
    val wordLenTerm = when(awl >= 3.0 && awl <= 10.0, 1.0).otherwise(0.0)
    round((lengthTerm + punctTerm + stopTerm + wordLenTerm) / 4.0, 6)
  }

  def qualityScore(text: Column): Column =
    withTokensAndPunct(text)((tl, p) => qualityScoreOf(tl, p))

  /** Rolling-hash fingerprint over the token stream:
    * fold(0, (acc, t) -> (acc*31 + md5_32(t)) mod 1e9+7). Order-sensitive,
    * deterministic, and engine-portable (md5 prefix as the token hash).
    */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(tokens(text), t => conv(substring(md5(t), 1, 8), 16, 10).cast("long")),
      lit(0L),
      (acc, h) => (acc * 31 + h) % 1000000007L)
}
