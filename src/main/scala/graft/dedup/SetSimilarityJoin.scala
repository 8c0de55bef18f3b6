package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT Jaccard-threshold set-similarity join via prefix filtering — the
  * AllPairs/SSJoin family (Bayardo et al., "Scaling Up All Pairs
  * Similarity Search", WWW 2007; Chaudhuri et al., ICDE 2006). The exact
  * complement to [[MinHashDeduplicator]]: MinHash-LSH trades recall for
  * speed (a near-threshold pair can miss every band), this join returns
  * EVERY pair with Jaccard >= threshold, yet still never goes all-pairs.
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * The filter: order the vocabulary by ascending document frequency
  * (rarest first, ties by token), sort each set in that global order, and
  * keep only its first `|x| - ceil(t*|x|) + 1` tokens as the PREFIX. Any
  * pair with J >= t must share a prefix token — if two sets disagree on
  * all of both prefixes, the overlap achievable with the remaining tokens
  * is provably below t. Candidates therefore come from an equi-join on
  * prefix tokens only, and prefixes are by construction each set's RAREST
  * tokens: the join's per-key fan-out is bounded by rare-token df, not by
  * stopword df (a "the" never lands in a prefix unless a document is
  * nearly all stopwords). A length filter (min >= t * max) prunes
  * mismatched sizes before the verify.
  *
  * Scale shape: one wordcount-shaped df aggregation, one doc-keyed sort
  * (row-local, bounded by set size), the prefix-token equi-join, and an
  * exact verify that joins ONLY candidate pairs back to their token
  * arrays (row-local `array_intersect` — sets never cross-join). All
  * shuffles are keyed on tokens or ids; nothing quadratic exists unless
  * the OUTPUT is quadratic.
  *
  * Sets come in as an (id, tokens-array) frame, so the same operator
  * serves word-token sets, char-shingle sets ([[graft.sql.expressions.Shingles]]),
  * or any other set definition. Duplicate tokens are collapsed up front
  * (set semantics); empty sets join nothing (Jaccard undefined).
  */
class SetSimilarityJoin(
    threshold: Double,
    idCol: String = "doc_id",
    tokensCol: String = "toks") {
  require(threshold > 0.0 && threshold <= 1.0,
    s"threshold ($threshold) must be in (0, 1]")

  // guards ceil() against float fuzz (0.7*30 = 21.000000000000004 would
  // otherwise ceil to 22 and shorten the prefix — a MISSED-pair bug, not
  // a spurious candidate); 1e-9 admits at most a spurious candidate,
  // which the exact verify discards
  private val eps = 1e-9

  /** All pairs (id_a, id_b, jaccard) with id_a < id_b and exact Jaccard
    * >= threshold over the distinct-token sets.
    */
  def pairs(sets: DataFrame): DataFrame = pairsFrom(sorted(sets))

  /** Candidate pairs (id_a, id_b) surviving the prefix + length +
    * positional filters, BEFORE the exact verify — a superset of the true
    * result. Public so callers can plug their own verification (e.g. a
    * containment or weighted-overlap scorer) behind the same pruning.
    */
  def candidates(sets: DataFrame): DataFrame = candidatesFrom(sorted(sets))

  /** (id, ts, sz): each set re-sorted in the global (df asc, tok asc)
    * order — a total order, so every engine derives the identical prefix.
    *
    * Deliberately NOT pinned (no persist/localCheckpoint), measured, not
    * guessed (round 9 A/B, q120 @ sf0.1, local[32], focused):
    *   - unpinned (this code): 5.6 s, task CPU ≈ wall × 32 (fully parallel)
    *   - `persist()`:          7.4 s, 2.4× the task CPU, ~10× the shuffle
    *   - `localCheckpoint`:   29.5 s — the stats-less `LogicalRDD` demotes
    *     every downstream broadcast join to a sort-merge join on the
    *     skewed `tok` key, collapsing effective parallelism to ~4.6/32
    *     cores
    * The static plan instantiates this subtree once per consumer, but the
    * per-copy cost is small, runtime exchange reuse dedupes the identical
    * inner exchanges, and keeping the subtree as a plain logical plan is
    * what lets AQE keep the verify/prefix joins BROADCAST — worth far more
    * than compute-once. Bench telemetry (task_ms, plan hash) now makes any
    * full-run deviation from this plan attributable from the artifact.
    *
    * r15 incident follow-up (BENCHDIFF_r15 §1): after a contractual bench
    * window read 270.8 s for q120, the quiet min-of-7 re-measure was
    * 7.6 s with the SAME plan hash, and by-hand heap-capped runs at sf0.1
    * measured the pressure envelope: -Xmx3g → 12.6 s warm, -Xmx2g (≈⅓ of
    * the unconstrained 6.3 GB pool peak) → 11.3 s warm. No cliff; the
    * reading was host CPU starvation. An explicit broadcast() pin was
    * considered and REJECTED: the demotion-sensitive sides (dfreq =
    * vocabulary, prefix = corpus × prefix-len) are unbounded at the
    * design scale, so a pin that helps a bench input OOMs the real one.
    */
  private def sorted(sets: DataFrame): DataFrame = {
    val toks = graft.sql.functions.spread(
      sets.select(col(idCol).as("id"), array_distinct(col(tokensCol)).as("ts0")),
      col("id"))
      .select(col("id"), explode_outer(col("ts0")).as("tok"))
    val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    toks.join(dfreq, "tok")
      .groupBy(col("id"))
      .agg(expr("transform(array_sort(collect_list(struct(df, tok))), x -> x.tok)")
        .as("ts"))
      .select(col("id"), col("ts"), size(col("ts")).as("sz"))
  }

  private def candidatesFrom(ordered: DataFrame): DataFrame = {
    val t = threshold
    // 1-based position rides along for the PPJoin positional filter below
    val prefix = ordered.select(col("id"), col("sz"),
      posexplode_outer(expr(
        s"slice(ts, 1, sz - CAST(ceil($t * sz - $eps) AS INT) + 1)")))
      .select(col("id"), col("sz"), (col("pos") + 1).as("rn"), col("col").as("tok"))
    // positional filter (PPJoin, Xiao et al. WWW'08): a match at positions
    // (rn_a, rn_b) bounds the achievable overlap by 1 + min(sz_a - rn_a,
    // sz_b - rn_b) — every OTHER common token follows this one in both
    // lists (the ordering is global), so for the pair's FIRST shared
    // prefix token the bound holds exactly; a true pair therefore always
    // has at least one match passing, and keeping any-passing pairs drops
    // only impossible ones. J >= t needs overlap >= t/(1+t)*(sz_a+sz_b).
    // On templated corpora (many moderately-shared tokens inside
    // prefixes) this prunes the candidate set ~7x before the verify.
    prefix.as("a")
      .join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
          least(col("a.sz"), col("b.sz")).cast("double") >=
            lit(t) * greatest(col("a.sz"), col("b.sz")) - lit(eps) &&
          (least(col("a.sz") - col("a.rn"), col("b.sz") - col("b.rn")) + lit(1))
            .cast("double") >=
            ceil(lit(t / (1 + t)) * (col("a.sz") + col("b.sz")) - lit(eps)))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  private def pairsFrom(ordered: DataFrame): DataFrame = {
    val t = threshold
    candidatesFrom(ordered)
      .join(ordered.select(col("id").as("id_a"), col("ts").as("ta"), col("sz").as("sa")), "id_a")
      .join(ordered.select(col("id").as("id_b"), col("ts").as("tb"), col("sz").as("sb")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("ta"), col("tb"))).as("i"), col("sa"), col("sb"))
      .select(col("id_a"), col("id_b"),
        (col("i").cast("double") / (col("sa") + col("sb") - col("i"))).as("jaccard"))
      .where(col("jaccard") >= t)
  }
}
