package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text canonicalization for the dedup family: lowercase, map
  * Unicode whitespace to space, strip everything but `[a-z0-9 ]`,
  * collapse whitespace runs, trim.
  *
  * The whitespace map MUST precede the `[^a-z0-9 ]` strip: stripping
  * first DELETES newlines, fusing the adjacent words — `"Hello\nWorld"`
  * would normalize to `"helloworld"` (one token) and dedupe against
  * `"HelloWorld"` instead of `"Hello World"`, corrupting every tokens()
  * consumer on real multi-line text.
  *
  * The whitespace class is the full Unicode `White_Space` set
  * ([[UnicodeWhitespace]]), NOT Java's ASCII-only `\s`: HTML-derived
  * corpora (CommonCrawl) are full of NBSP U+00A0, and an ASCII map sent
  * NBSP to the strip, fusing its neighbors — two docs differing only by
  * NBSP-vs-space got DIFFERENT dedup fingerprints. The class is written
  * as explicit code points (no `\p{...}` property, no `(?U)` flag)
  * because the oracle replays the chain in DuckDB's RE2, and property
  * names/semantics differ across engines while explicit code points
  * cannot; both engines are pinned by `TextNormalizerSpec` and every
  * oracle interpolates this SAME constant.
  *
  * Pure built-in expressions so the whole chain stays inside whole-stage
  * codegen and is replayable as ANSI SQL by the correctness oracle.
  */
object TextNormalizer {

  /** Unicode `White_Space` as an explicit character class, valid and
    * bit-identical in Java regex (Spark) and RE2 (DuckDB oracle):
    * ASCII `\t\n\x0B\f\r` + space, NEL U+0085, NBSP U+00A0, Ogham
    * U+1680, the U+2000-200A quad family, LS/PS U+2028/9, NNBSP
    * U+202F, MMSP U+205F, ideographic space U+3000. Deliberately
    * EXCLUDES ZWSP U+200B and U+180E (Cf format chars, not
    * White_Space — they strip, as both engines agree).
    */
  val UnicodeWhitespace: String =
    "[\\t\\n\\x0B\\f\\r \\x{0085}\\x{00A0}\\x{1680}\\x{2000}-\\x{200A}" +
      "\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]"

  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(
      regexp_replace(lower(text), UnicodeWhitespace, " "), "[^a-z0-9 ]", ""), " +", " "))

  /** Whitespace tokens of the normalized text. Zero-length tokens are
    * filtered: blank/whitespace-only text normalizes to "" and `split`
    * would yield `[""]` — a spurious empty token that every consumer
    * (LMs, featurizers, counters) would otherwise ingest as a real gram.
    * Blank docs therefore tokenize to an EMPTY array; consumers' size-0
    * guards define the edge semantics (mirrored by the DuckDB oracles'
    * `list_filter(..., t -> t <> '')`).
    */
  def tokens(text: Column): Column =
    filter(split(normalize(text), " "), t => length(t) > 0)

  /** Row-local adjacent pairs of a token array, combined by `f(left,
    * right)` — the zip_with-of-offset-slices skeleton shared by the
    * bigram LM, PMI, and the hashing featurizer (one definition of the
    * off-by-one; a lag window would shuffle the corpus to look one
    * element left inside an array each row already holds). Empty and
    * single-element arrays yield an empty array.
    */
  def adjacentPairs(tl: Column)(f: (Column, Column) => Column): Column =
    zip_with(
      slice(tl, lit(1), greatest(size(tl) - 1, lit(0))),
      slice(tl, lit(2), greatest(size(tl) - 1, lit(0))),
      f)
}
