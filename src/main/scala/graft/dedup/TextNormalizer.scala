package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text canonicalization for the dedup family: lowercase, map
  * ASCII whitespace (newline/tab/CR/VT/FF) to space, strip everything
  * but `[a-z0-9 ]`, collapse whitespace runs, trim.
  *
  * The whitespace map MUST precede the `[^a-z0-9 ]` strip: stripping
  * first DELETES newlines, fusing the adjacent words — `"Hello\nWorld"`
  * would normalize to `"helloworld"` (one token) and dedupe against
  * `"HelloWorld"` instead of `"Hello World"`, corrupting every tokens()
  * consumer on real multi-line text. Oracles replay the same chain with
  * RE2's `[[:space:]]` (the same ASCII set as Java's `\s`).
  *
  * Known limitation, shared by BOTH engines so parity holds: Unicode
  * whitespace (NBSP U+00A0 — common in HTML-derived corpora — U+2028,
  * ideographic space U+3000) is NOT in `\s`/`[[:space:]]` and still
  * falls to the strip, fusing its neighbors. Widening means changing
  * Spark and every oracle replica to a bit-identical Unicode class in
  * lockstep; until a corpus needs it, ASCII keeps the chain simple and
  * replayable.
  *
  * Pure built-in expressions so the whole chain stays inside whole-stage
  * codegen and is replayable as ANSI SQL by the correctness oracle.
  */
object TextNormalizer {

  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(
      regexp_replace(lower(text), "\\s", " "), "[^a-z0-9 ]", ""), " +", " "))

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
