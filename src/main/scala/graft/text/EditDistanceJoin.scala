package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Edit-distance-1 similarity self-join via deletion-neighborhood blocking
  * (the FastSS / SymSpell scheme): two strings are within Levenshtein
  * distance 1 only if their deletion neighborhoods — the string itself plus
  * every single-character deletion — intersect (substitution: delete the
  * differing position from both; insertion/deletion: the shorter string is
  * itself a deletion of the longer). Entity resolution / typo clustering
  * over ids, names, and vocabulary terms.
  *
  * Beyond-reference operator (LLM-pipeline extension).
  *
  * Scale design — the naive formulation is an O(n²) cross join; this one
  * never builds it. Each distinct string fans out to len+1 deletion
  * variants (row-local `transform` over a `sequence`, inside whole-stage
  * codegen), candidates come ONLY from an equi-join on the variant key
  * (~uniform strings, shuffle-partitioned), and the exact `levenshtein`
  * verify touches candidates only. Deletion-key collisions at distance 2
  * (e.g. "x12"/"x21" both deleting to "x1") are filtered by the verify.
  * Strings longer than `maxLen` are dropped loudly by the caller's contract
  * (fan-out is linear in string length; 64 keeps the blow-up bounded).
  */
class EditDistanceJoin(maxLen: Int = 64) {
  require(maxLen >= 1, s"maxLen ($maxLen) must be positive")

  /** Distinct-string pairs (a, b, dist) with levenshtein(a, b) == 1 and
    * a < b (distance 0 is impossible on the distinct set).
    */
  def pairs(df: Dataset[_], strCol: String): DataFrame = {
    val strs = df.select(col(strCol).cast("string").as("s"))
      .where(col("s").isNotNull && length(col("s")) <= maxLen)
      .distinct()
    // deletion neighborhood: the string plus each single-char deletion;
    // array_distinct stops duplicate keys from repeated characters
    // ("aa" deletes to "a" twice) double-counting a candidate pair
    val variants = strs.select(col("s"), explode(array_distinct(concat(
      array(col("s")),
      transform(sequence(lit(1), length(col("s"))), i =>
        concat(col("s").substr(lit(1), i - 1),
          col("s").substr(i + 1, length(col("s")))))))).as("v"))

    variants.as("a")
      .join(variants.as("b"), col("a.v") === col("b.v") && col("a.s") < col("b.s"))
      .select(col("a.s").as("a"), col("b.s").as("b")).distinct()
      .withColumn("dist", levenshtein(col("a"), col("b")).cast("long"))
      .where(col("dist") === 1)
  }
}
