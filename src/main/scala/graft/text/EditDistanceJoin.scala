package graft.text

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Edit-distance-1 similarity self-join via position-tagged deletion
  * blocking (the FastSS / SymSpell family): two distinct strings are within
  * Levenshtein distance 1 iff
  *  - they share a single-character deletion at the SAME position
  *    (substitution: delete the differing position from both), or
  *  - one string IS a single-character deletion of the other (indel).
  * Entity resolution / typo clustering over ids, names, vocabulary terms.
  *
  * Beyond-reference operator (LLM-pipeline extension).
  *
  * Scale design — the naive formulation is an O(n²) cross join; this one
  * never builds it. Each distinct string fans out to its deletion variants
  * (row-local `transform` over a `sequence`, inside whole-stage codegen),
  * candidates come ONLY from equi-joins on 64-bit variant hashes
  * (~uniform keys, shuffle-partitioned), and the final `levenshtein`
  * guard keeps hash collisions out. Position tagging matters: the naive
  * "deletion neighborhoods intersect" test (no position) also admits every
  * DISTANCE-2 pair that shares a deletion across different positions —
  * e.g. "x12"/"x21" — which on digit-structured keys is a candidate blow-up
  * an order of magnitude past the true pair set. Same-position matching
  * admits exactly the substitution pairs. Strings longer than `maxLen` are
  * dropped by the operator's contract (fan-out is linear in string length).
  */
class EditDistanceJoin(maxLen: Int = 64) {
  require(maxLen >= 1, s"maxLen ($maxLen) must be positive")

  private def delAt(s: Column, i: Column): Column =
    concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))

  /** Distinct-string pairs (a, b, dist) with levenshtein(a, b) == 1 and
    * a < b (distance 0 is impossible on the distinct set).
    */
  def pairs(df: Dataset[_], strCol: String): DataFrame = {
    val strs = df.select(col(strCol).cast("string").as("s"))
      .where(col("s").isNotNull && length(col("s")) <= maxLen)
      .distinct()

    // substitution pairs: same deletion position, same deletion hash
    val delPos = strs.select(col("s"),
      posexplode(transform(sequence(lit(1), length(col("s"))), i =>
        xxhash64(delAt(col("s"), i)))))
      .toDF("s", "p", "h")
    val subs = delPos.as("a")
      .join(delPos.as("b"),
        col("a.p") === col("b.p") && col("a.h") === col("b.h") &&
          col("a.s") < col("b.s"))
      .select(col("a.s").as("a"), col("b.s").as("b"))

    // indel pairs: some deletion of the longer equals the shorter;
    // array_distinct stops repeated-character runs ("aab" -> "ab" twice)
    // from duplicating a candidate
    val delSet = strs.select(col("s"),
      explode(array_distinct(transform(sequence(lit(1), length(col("s"))), i =>
        xxhash64(delAt(col("s"), i))))).as("h"))
    val idH = strs.select(col("s").as("t"), xxhash64(col("s")).as("h"))
    val indel = delSet.join(idH, "h")
      .select(least(col("s"), col("t")).as("a"),
        greatest(col("s"), col("t")).as("b"))

    // distinct collapses hash-collision dups; levenshtein ejects collisions
    subs.unionByName(indel).distinct()
      .withColumn("dist", levenshtein(col("a"), col("b")).cast("long"))
      .where(col("dist") === 1)
  }
}
