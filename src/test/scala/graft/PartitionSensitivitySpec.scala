package graft

/** Partition-count independence as a CORRECTNESS property: on a real
  * cluster `spark.sql.shuffle.partitions` diverges from core count by
  * orders of magnitude, so no query result may depend on how many
  * reducers the shuffle happened to use. The DuckDB oracle already
  * implies this (a single-threaded replay must hash-match), but only at
  * the partition count the driver ran; this spec pins it explicitly by
  * re-running a representative query per operator family in a sibling
  * session configured with a prime partition count (97 — not a multiple
  * of cores, not a power of two) and asserting row-set equality with the
  * default-session result. Complements the round-10 full-bench
  * sensitivity pass (256 partitions, perf side — SURVEY round-10 notes).
  */
class PartitionSensitivitySpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** One query per shuffle-shaped family: aggregation, two-phase prefix
    * sum, grouped ntile ranks, windowed top-k, IVF-cell semantic dedup,
    * PQ fit+encode, grouped AUC midranks, LSH near-dup pairs.
    */
  private val representatives = Seq(
    "q01_agg_pricing", "q48_token_pack", "q96_ccnet_buckets",
    "q56_group_topk", "q108_semantic_dedup", "q115_pq_encode",
    "q161_grouped_auc", "q22_ann_lsh",
    // round 11: artifact-serving ADC — the m-row sum per (query, vec)
    // pair aggregates in shuffle order; the 1e-6 snap must keep ranks
    // partition-count-independent
    "q167_opq_adc_search",
    // round 13: segmented EWMA — bucket assignment, within-segment sort
    // order and the carry-chain fold must be byte-stable regardless of
    // how the gather/window exchanges partition
    "q127_ewma",
    // round 14: the multi-key asof TVF (two-column window partitioning +
    // the right-side pre-dedup shuffle) and the ordered-mode smoother's
    // batch path (segmented EwmaFeatures behind a Dataset[EwmaPoint]
    // façade) — both fold/window over shuffled exchanges
    "q173_asof_sql_multikey", "q176_ewma_ordered",
    // round 14 (continued): the anomaly composition (two independent
    // segmented smoothers + (key, tie) joins + one lag window — doubles
    // must be byte-stable across reducer counts) and RRF fusion (leg
    // union, integer-min pivot, fixed-order float adds, grouped rank)
    "q178_anomaly", "q180_hybrid_rrf",
    // round 15/16 (r15 verdict #6): the streaming near-dup batch route
    // (band-signature join + per-pair verify under adversarial reducer
    // counts), the iterative k-core peel and the h-index coreness loop
    // (per-round degree aggregates + semi-joins across 97-way
    // exchanges), the Poisson-bootstrap fan-out (coin must not depend on
    // row placement), and the log-binned quantile walk (threshold-compare
    // binning + chained cumulative adds)
    "q183_streaming_neardup", "q184_ivf_maintained_search",
    "q185_quantile_stream", "q186_bootstrap_ci", "q187_kcore",
    "q188_neardup_core", "q189_coreness", "q190_bootstrap_ratio",
    "q191_log_quantiles",
    // round 16: the multi-pass distributed selection — each level's
    // histogram row and the final sort-limit must be reducer-count-proof
    "q192_exact_quantiles",
    // round 16: fixed-round synchronous LPA — per-round vote counts and
    // the struct-max tie rule across 97-way exchanges
    "q193_neardup_communities",
    // round 16 (continued): frontier BFS (per-round anti-join against a
    // growing visited set), seeded-teleport PageRank (teleport join +
    // per-round float sums), CUPED moment algebra (two-level agg + 1-row
    // broadcast), containment prefix×index join + exact verify, the
    // jackknife bucket fold, and the sliding-distinct double-dedup fan-out
    "q194_bfs_distance", "q195_seeded_pagerank", "q196_cuped",
    "q197_containment_join", "q198_jackknife",
    "q199_sliding_distinct_exact",
    // round 16 (wave 2-4): the distributed PAV (range-partitioned stack
    // passes MUST be partition-count-proof for integer-valued labels),
    // the two-retrieval-leg metric fold, the wedge aggregation, the
    // peel loop's integer snapshots, basket-count ratios, the two-phase
    // CUSUM fold, the sorted-neighborhood rank+verify, Benford counts,
    // and the two-phase RFM quintile ranks
    "q200_isotonic", "q201_ann_recall", "q202_link_prediction",
    "q203_densest_subgraph", "q204_basket_lift", "q205_changepoint",
    "q206_sorted_neighborhood", "q207_benford", "q208_rfm")

  representatives.foreach { name =>
    test(s"$name: identical result at 97 shuffle partitions") {
      val fn = SparkEntry.queries(name)
      try {
        val base = fn(spark, dir).collect().map(_.toString).sorted

        // newSession() SHARES the CacheManager, and cached plans
        // canonicalize equal across sessions — without clearing, q161's
        // call-site persist() would serve the 97-partition rerun from the
        // base run's 4-partition cache, voiding the property under test
        spark.catalog.clearCache()

        val alt = spark.newSession()
        alt.conf.set("spark.sql.shuffle.partitions", "97")
        val rerun = fn(alt, dir).collect().map(_.toString).sorted

        assert(rerun.length === base.length,
          s"$name row count changed with partition count")
        assert(rerun.toSeq === base.toSeq,
          s"$name rows changed with partition count")
      } finally
        // don't leak this spec's cache entries (q161's persist has no
        // matching unpersist by design) into later suites sharing the
        // singleton session
        spark.catalog.clearCache()
    }
  }
}
