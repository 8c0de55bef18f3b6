package graft.text

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Edit-distance-≤k (k = 1 or 2) similarity self-join via deletion
  * blocking (the FastSS / SymSpell family). Entity resolution / typo
  * clustering over ids, names, vocabulary terms.
  *
  * k = 1 uses position-TAGGED deletions: two distinct strings are within
  * distance 1 iff they share a deletion at the SAME position (substitution)
  * or one IS a deletion of the other (indel) — candidates are exactly the
  * true pairs plus rare hash collisions. Position tagging matters: the
  * untagged "neighborhoods intersect" test also admits every distance-2
  * pair sharing a cross-position deletion (e.g. "x12"/"x21"), which on
  * digit-structured keys is a candidate blow-up an order of magnitude past
  * the true pair set.
  *
  * k = 2 uses untagged depth-≤2 deletion neighborhoods (FastSS):
  * ed(a,b) ≤ k ⟹ D≤k(a) ∩ D≤k(b) ≠ ∅ (each edit can be simulated by
  * deleting the touched position from both sides), so the intersection is
  * a complete candidate set and the exact `levenshtein` verify keeps only
  * true pairs. Fan-out is ~len²/2 variants per string and a true pair
  * surfaces once per shared variant — the immediate `distinct` collapses
  * that before verification.
  *
  * Scale design — the naive formulation is an O(n²) cross join; this one
  * never builds it. Variants are row-local `transform`s over `sequence`s
  * (whole-stage codegen), candidates come ONLY from equi-joins on 64-bit
  * variant hashes (~uniform keys, shuffle-partitioned), and the final
  * `levenshtein` guard ejects hash collisions. Strings longer than
  * `maxLen` are dropped by the operator's contract.
  */
class EditDistanceJoin(k: Int = 1, maxLen: Int = 64) {
  require(k == 1 || k == 2, s"k ($k) must be 1 or 2")
  require(maxLen >= 1, s"maxLen ($maxLen) must be positive")

  private def delAt(s: Column, i: Column): Column =
    concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))

  /** All single-character deletions of `s`. */
  private def d1(s: Column): Column =
    transform(sequence(lit(1), length(s)), i => delAt(s, i))

  /** Distinct-string pairs (a, b, dist) with 1 <= levenshtein(a, b) <= k
    * and a < b (distance 0 is impossible on the distinct set).
    */
  def pairs(df: Dataset[_], strCol: String): DataFrame = {
    // spread: the distinct set is BYTE-small (15k names ≈ 500 KB) but the
    // work built on it is CPU-dense (len-deletion explode + xxhash per
    // variant, levenshtein per candidate), so AQE's byte-based partition
    // coalescing serializes it onto a couple of tasks — measured 3× wall
    // on q88 at sf0.1. The explicit-count repartition pins kernel
    // parallelism (AQE never coalesces a numbered repartition); on a real
    // cluster a big distinct set arrives already wide and spread no-ops.
    val strs = graft.sql.functions.spread(
      df.select(col(strCol).cast("string").as("s"))
        .where(col("s").isNotNull && length(col("s")) <= maxLen)
        .distinct(), col("s"))
    if (k == 2) return pairsK2(strs)

    // the same CPU-density argument as spread, for the REDUCER stages:
    // the join and verify stages carry a few MB but micro-benchmark-dense
    // per-row work (hash probes, levenshtein), and AQE's byte-based
    // coalescing runs them near-serial (measured 3× wall on q88 @ sf0.1
    // with coalescing on vs off). A NUMBERED repartition on exactly the
    // downstream key is never coalesced AND satisfies the join/distinct
    // distribution requirement, so it replaces (not adds to) the exchange
    // the plan needed anyway.
    val target = strs.sparkSession.sparkContext.defaultParallelism

    // substitution pairs: same deletion position, same deletion hash
    val delPos = strs.select(col("s"),
      posexplode(transform(sequence(lit(1), length(col("s"))), i =>
        xxhash64(delAt(col("s"), i)))))
      .toDF("s", "p", "h")
      .repartition(target, col("p"), col("h"))
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
      .repartition(target, col("h"))
    val idH = strs.select(col("s").as("t"), xxhash64(col("s")).as("h"))
    val indel = delSet.join(idH, "h")
      .select(least(col("s"), col("t")).as("a"),
        greatest(col("s"), col("t")).as("b"))

    // distinct collapses hash-collision dups; levenshtein ejects collisions
    subs.unionByName(indel)
      .repartition(target, col("a"), col("b")).distinct()
      .withColumn("dist", levenshtein(col("a"), col("b")).cast("long"))
      .where(col("dist") === 1)
  }

  /** Depth-≤2 neighborhood intersection: identity ∪ D1 ∪ D2 hashed, one
    * equi-join, distinct, exact verify.
    */
  private def pairsK2(strs: DataFrame): DataFrame = {
    // numbered repartitions on the join/distinct keys — same CPU-dense
    // reducer-stage pinning as the k = 1 path
    val target = strs.sparkSession.sparkContext.defaultParallelism
    val v1 = d1(col("s"))
    val v2 = flatten(transform(v1, v => d1(v)))
    val neigh = strs.select(col("s"),
      explode(array_distinct(transform(
        concat(array(col("s")), v1, v2), v => xxhash64(v)))).as("h"))
      .repartition(target, col("h"))
    neigh.as("a")
      .join(neigh.as("b"), col("a.h") === col("b.h") && col("a.s") < col("b.s"))
      .select(col("a.s").as("a"), col("b.s").as("b"))
      .repartition(target, col("a"), col("b")).distinct()
      .withColumn("dist", levenshtein(col("a"), col("b")).cast("long"))
      .where(col("dist").between(1, k))
  }
}
