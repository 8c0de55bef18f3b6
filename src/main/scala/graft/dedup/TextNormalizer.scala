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
  * The whitespace map covers the full Unicode `White_Space` set
  * ([[WhitespaceCodepoints]]), NOT Java's ASCII-only `\s`: HTML-derived
  * corpora (CommonCrawl) are full of NBSP U+00A0, and an ASCII map sent
  * NBSP to the strip, fusing its neighbors — two docs differing only by
  * NBSP-vs-space got DIFFERENT dedup fingerprints. The set is explicit
  * code points (no `\p{...}` property, no `(?U)` flag) because the
  * oracle replays the chain in DuckDB, and property names/semantics
  * differ across engines while explicit code points cannot; both
  * engines are pinned by DedupSpec's Unicode test and every oracle
  * interpolates the one [[sqlTranslateArgs]] fragment.
  *
  * Pure built-in expressions so the whole chain stays inside whole-stage
  * codegen and is replayable as ANSI SQL by the correctness oracle.
  */
object TextNormalizer {

  /** Unicode `White_Space` (all BMP): ASCII `\t\n\x0B\f\r`, NEL U+0085,
    * NBSP U+00A0, Ogham U+1680, the U+2000-200A quad family, LS/PS
    * U+2028/9, NNBSP U+202F, MMSP U+205F, ideographic space U+3000.
    * Space itself maps to itself and is omitted. Deliberately EXCLUDES
    * ZWSP U+200B and U+180E (Cf format chars, not White_Space — they
    * strip, as both engines agree).
    */
  val WhitespaceCodepoints: Seq[Int] =
    (0x09 to 0x0D) ++ Seq(0x85, 0xA0, 0x1680) ++ (0x2000 to 0x200A) ++
      Seq(0x2028, 0x2029, 0x202F, 0x205F, 0x3000)

  /** The same set as a regex character class, bit-identical in Java
    * regex and RE2 — for DRIVER-side regex use (PhraseMatcher); the
    * distributed chain uses `translate` instead (below). Kept in sync
    * with [[WhitespaceCodepoints]] by TextNormalizerSpec.
    */
  val UnicodeWhitespace: String =
    "[\\t\\n\\x0B\\f\\r \\x{0085}\\x{00A0}\\x{1680}\\x{2000}-\\x{200A}" +
      "\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]"

  private val wsChars: String = WhitespaceCodepoints.map(_.toChar).mkString

  /** `translate` argument tail (`chr(..)||...||chr(..), '<spaces>'`) for
    * the DUCKDB ORACLE ONLY: every oracle replica interpolates this ONE
    * fragment, so engine and oracle whitespace sets can never drift —
    * and neither source file needs raw exotic-whitespace characters (a
    * literal U+2028 is a line terminator to scalac and hazardous in SQL
    * text). Do NOT interpolate it into Spark SQL text: Spark's `chr()`
    * is mod-256 (chr(12288) yields codepoint 0, not ideographic space),
    * which would silently map the wrong characters — Spark SQL-text
    * callers use [[sparkSqlTranslateArgs]], and the product path is the
    * [[normalize]] Column API.
    */
  def sqlTranslateArgs: String =
    WhitespaceCodepoints.map(c => s"chr($c)").mkString(" || ") +
      ", '" + (" " * WhitespaceCodepoints.size) + "'"

  /** Spark-SQL-text twin of [[sqlTranslateArgs]] (the `expr()`/SQL-string
    * surface; the product path is the [[normalize]] Column API). NOT the
    * chr-concat form: Spark's `chr()` is mod-256 — `chr(12288)` is
    * codepoint 0, not ideographic space — so the Spark flavor embeds the
    * set as `\\uXXXX` escapes in a plain string literal, which Spark's
    * literal parser decodes and DuckDB's deliberately would not.
    */
  def sparkSqlTranslateArgs: String =
    "'" + WhitespaceCodepoints.map(c => f"\\u$c%04X").mkString + "', '" +
      (" " * WhitespaceCodepoints.size) + "'"

  /** Whitespace map via `translate`, NOT a regex class: a 17-range
    * character class makes every NON-whitespace character fail every
    * range (regexp_replace scans dominate the text family's cost — the
    * r12 measurement: q19/q81/q104/q120 ran 1.2-1.5× slower under the
    * class than under ASCII `\s`), while translate is one dictionary
    * probe per char and replaced even the old `\s` regexp pass.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(
      translate(lower(text), wsChars, " " * wsChars.length),
      "[^a-z0-9 ]", ""), " +", " "))

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
