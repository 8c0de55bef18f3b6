package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text canonicalization for the dedup family: lowercase, strip
  * everything but `[a-z0-9 ]`, collapse whitespace runs, trim.
  *
  * Pure built-in expressions so the whole chain stays inside whole-stage
  * codegen and is replayable as ANSI SQL by the correctness oracle.
  */
object TextNormalizer {

  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

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
