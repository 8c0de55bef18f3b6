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

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normalize(text), " ")
}
