package graft.sql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Runtime-filter semi-join: build a fixed-size Bloom filter over the
  * small side's keys, prune the large side with it BEFORE any shuffle,
  * then exact-verify the survivors with a real `left_semi` join.
  *
  * This is the join pattern that matters most at 100 TB: a selective
  * dimension predicate should cut the fact-table scan's output long before
  * the join's exchange, but Spark's own InjectRuntimeFilter only fires
  * under its creation-cost heuristics. This operator makes the pattern
  * explicit and unconditional:
  *
  *  - build side → ONE aggregate row of `numBits/8` bytes (mergeable
  *    bitwise-OR state, map-side partial), collected as a driver
  *    statistic — the same bounded-dictionary discipline as the encoder
  *    fits, never a driver loop over data rows;
  *  - probe side → `might_contain` (native codegen bit test) filters at
  *    the scan, so only maybe-matching rows pay the semi-join shuffle;
  *  - the final `left_semi` removes Bloom false positives, so the result
  *    is EXACTLY the semi-join (the oracle replays plain `IN`, q73) — the
  *    filter only ever changes cost, never semantics.
  */
object BloomJoin {

  /** The Bloom coin hashes `cast(key AS STRING)`, which is equality-
    * consistent ONLY when both keys share one non-floating type: the
    * exact join coerces mixed types equal (INT 1 = DECIMAL 1.00) and
    * treats -0.0 = 0.0, while their strings differ — a divergent coin
    * would prune TRUE matches (semiJoin) or retain them (antiJoin),
    * breaking the "only ever changes cost, never semantics" contract.
    * So the hazardous inputs are rejected loudly up front.
    */
  private def requireHashableKeys(
      probe: DataFrame, probeKey: Column,
      build: DataFrame, buildKey: Column): Unit = {
    val pt = probe.select(probeKey).schema.head.dataType
    val bt = build.select(buildKey).schema.head.dataType
    require(pt == bt,
      s"BloomJoin keys must share one type (probe $pt vs build $bt) — " +
        "the join would coerce them, the string-hashed Bloom coin would not")
    require(pt != org.apache.spark.sql.types.DoubleType &&
      pt != org.apache.spark.sql.types.FloatType,
      s"BloomJoin keys of type $pt are not supported: -0.0/0.0 (and NaN) " +
        "compare equal in joins but hash differently as strings")
  }

  /** `probe ⋉ build` on `probeKey = buildKey`, Bloom-pruned.
    *
    * @param numBits   filter size in bits (≳ 10× expected build keys for
    *                  ~1% false positives at numHashes=5)
    * @param numHashes bits set/probed per key
    */
  def semiJoin(
      probe: DataFrame,
      probeKey: Column,
      build: DataFrame,
      buildKey: Column,
      numBits: Int = 1 << 20,
      numHashes: Int = 5): DataFrame = {
    requireHashableKeys(probe, probeKey, build, buildKey)
    val keyStr = buildKey.cast("string")
    val words = build
      .agg(functions.bloomFilter(keyStr, numBits, numHashes).as("bf"))
      .head().getSeq[Long](0).toArray
    val pruned = probe.where(
      functions.bloomMightContain(typedlit(words), probeKey.cast("string"), numHashes))
    pruned.join(build.select(buildKey.as("__bj_key")).distinct(),
      probeKey === col("__bj_key"), "left_semi")
  }

  /** `probe ▷ build` (anti-join) on `probeKey = buildKey`, Bloom-pruned:
    * a Bloom filter has no false negatives, so rows whose key MISSES the
    * filter are provably absent from the build side and bypass the join
    * exchange entirely; only Bloom hits (true matches + ~1% false
    * positives) pay the exact `left_anti` verify. Result is EXACTLY the
    * anti-join. This is the incremental-ingest shape at 100 TB: the bulk
    * of a fresh batch is genuinely new and never shuffles.
    */
  def antiJoin(
      probe: DataFrame,
      probeKey: Column,
      build: DataFrame,
      buildKey: Column,
      numBits: Int = 1 << 20,
      numHashes: Int = 5): DataFrame = {
    requireHashableKeys(probe, probeKey, build, buildKey)
    val keyStr = buildKey.cast("string")
    val words = build
      .agg(functions.bloomFilter(keyStr, numBits, numHashes).as("bf"))
      .head().getSeq[Long](0).toArray
    val mightContain =
      functions.bloomMightContain(typedlit(words), probeKey.cast("string"), numHashes)
    // null-safe split: a NULL probe key makes mightContain NULL, which a
    // bare `where(!...)` would drop from BOTH branches — left_anti keeps
    // null-key rows (null matches nothing on the build side), so they
    // belong with the definitely-new set
    val definitelyNew = probe.where(not(coalesce(mightContain, lit(false))))
    val verified = probe.where(coalesce(mightContain, lit(false)))
      .join(build.select(buildKey.as("__bj_key")).distinct(),
        probeKey === col("__bj_key"), "left_anti")
    definitelyNew.unionByName(verified)
  }
}
