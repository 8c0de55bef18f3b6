package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD 1995): sort
  * the corpus by a blocking key, slide a window of `w` positions, and
  * emit every in-window pair as a dedup candidate — the third blocking
  * family next to LSH banding ([[MinHashDeduplicator]]) and prefix
  * filtering ([[SetSimilarityJoin]]): O(n·w) candidates regardless of
  * how skewed the key distribution is, which is exactly its niche when a
  * corpus has glut keys that overwhelm equality blocking. Recall is BY
  * DESIGN partial (a true pair sorted > w apart is missed) — the method
  * IS its contract, and the oracle replays the same method, so the gate
  * pins the mechanics, not an absolute-recall claim.
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * == Deterministic contract ==
  *
  * The sort order is the TOTAL order (key, id) — no rank ambiguity, so
  * both engines derive identical neighborhoods. Null keys fail loudly
  * (a silently unsorted record is a silently lost duplicate).
  *
  * == Scale shape ==
  *
  * The global rank is computed two-phase via [[graft.sql.GroupedNtile]]
  * (coarse key-prefix buckets + per-bucket windows + a broadcast offset
  * triangle — never a single-task global sort). Pairing is a constant
  * ×w explode joined back on the rank — an equi-join, not a range join.
  * Verification is the caller's: [[candidates]] returns the raw pairs
  * (canonicalized id_a < id_b) for any downstream scorer.
  */
class SortedNeighborhoodJoin(
    window: Int,
    idCol: String = "doc_id",
    keyCol: String = "key") {

  require(window >= 1, s"window ($window) must be >= 1")

  /** Candidate pairs (id_a, id_b), id_a < id_b, for records within
    * `window` positions of each other in the (key, id) sort order.
    */
  def candidates(records: DataFrame): DataFrame = {
    // the rank frame is consumed TWICE (both sides of the position join);
    // measured at sf0.1 (r16 scratch A/B, warm): unpinned = the whole
    // multi-stage rank chain instantiated per side, 4.0 s for candidates
    // alone; localCheckpoint = 2.2 s once. The frame is corpus-sized but
    // NARROW (id, key, rank), so the executor-storage cost is bounded
    // and the broadcast-demotion hazard that keeps SetSimilarityJoin's
    // token frame unpinned does not bite: the position join is keyed on
    // the dense integer rank, which AQE re-broadcasts from runtime stats.
    val ranked = graft.sql.GroupedNtile.rank(
      records.select(col(idCol).as("id"), col(keyCol).as("k"))
        .withColumn("__g", lit("all")),
      "__g",
      Seq(col("k").asc, col("id").asc),
      // order-consistent coarse bucket: a string prefix sorts like the
      // full key and keeps full-key ties in one bucket
      substring(col("k"), 1, 2),
      "__rnk")
      .localCheckpoint()
    val left = ranked
      .select(col("id").as("id_l"),
        explode(expr(s"sequence(__rnk + 1, __rnk + $window)")).as("__r2"))
    val right = ranked.select(col("__rnk").as("__r2"), col("id").as("id_r"))
    left.join(right, "__r2")
      .select(least(col("id_l"), col("id_r")).as("id_a"),
        greatest(col("id_l"), col("id_r")).as("id_b"))
  }

  /** Candidates verified by exact token-set Jaccard >= `threshold` over
    * `tokensCol` (distinct-element semantics): (id_a, id_b, jaccard).
    */
  def pairs(records: DataFrame, tokensCol: String, threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold ($threshold) must be in (0, 1]")
    // r17: sortedDistinct (same element set) so the verify merge-counts
    // per pair instead of an array_intersect hash-set build per pair
    val toks = records.select(col(idCol).as("id"),
      graft.sql.functions.sortedDistinct(col(tokensCol)).as("ts"))
    // sized is consumed by BOTH verify sides — pinned for the same
    // measured reason as `ranked` (A/B at sf0.1: unpinned 8.2 s, pinned
    // 6.1 s — the token-set derivation re-ran per side); and the
    // candidate frame is SPREAD before the verify kernels (the q183
    // lesson: AQE coalesces the small pair shuffle to ~1 partition and
    // serializes the array_intersect work onto one core)
    val sized = toks.select(col("id"), col("ts"), size(col("ts")).as("sz"))
      .localCheckpoint()
    graft.sql.functions.spread(candidates(records), col("id_a"))
      .join(sized.select(col("id").as("id_a"), col("ts").as("ta"), col("sz").as("sa")), "id_a")
      .join(sized.select(col("id").as("id_b"), col("ts").as("tb"), col("sz").as("sb")), "id_b")
      // empty sets join nothing (Jaccard undefined — and a 0/0 NaN would
      // PASS the >= filter under Spark's NaN-is-largest ordering)
      .where(col("sa") > 0 && col("sb") > 0)
      .select(col("id_a"), col("id_b"),
        graft.sql.functions.sortedIntersectCount(col("ta"), col("tb")).as("i"),
        col("sa"), col("sb"))
      .select(col("id_a"), col("id_b"),
        (col("i").cast("double") / (col("sa") + col("sb") - col("i"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }
}
