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
    *
    * PRECONDITION: ids are unique (one row per id). The verify joins the
    * un-aggregated token frame and picks one row per pair behind a
    * first() barrier, so duplicate ids with DIFFERING token arrays would
    * score an arbitrary one of them (the candidates, by contrast, derive
    * from a groupBy(id)-merged frame). Every declared query feeds one row
    * per document; dedupe ids upstream if yours does not.
    *
    * r16 restructure (guide §1.2 step 1, measured): the verify no longer
    * joins the df-SORTED arrays — intersection size is order-independent,
    * so it joins the raw distinct-token frame (`base`), which skips two
    * full re-derivations of the sort (explode → df join → collect_list)
    * that the old plan instantiated per verify side.
    */
  def pairs(sets: DataFrame): DataFrame = {
    val t = threshold
    val base = SetSimilarityJoin.tokenBase(sets, idCol, tokensCol)
    // The verify intersect must be computed ONCE per candidate: without a
    // barrier, the jaccard filter gets pushed into the last join's
    // condition and the projection recomputes the SAME array_intersect a
    // second time per candidate (r16 plan audit — the q183 "verify pushed
    // into the join" pattern in its batch form). The groupBy(id_a, id_b)
    // + first() barrier costs nothing extra: candidates are already
    // unique per pair, and the verify-join output is hash-partitioned on
    // id_a (a subset of the grouping keys), so the aggregate pipelines
    // with no exchange — but a filter cannot be pushed below first().
    // spread the candidates before the verify kernels: the post-distinct
    // exchange is tiny in bytes, AQE coalesces it to ~1 partition, and
    // the whole verify stage (both probes + the intersect) would
    // serialize onto one core (the q183/q206 lesson — re-measured here:
    // 30 s of stage task time on one partition without it)
    graft.sql.functions.spread(
      candidatesFrom(SetSimilarityJoin.dfSortedFrom(base)), col("id_a"))
      .join(base.select(col("id").as("id_a"), col("ts0").as("ta"),
        size(col("ts0")).as("sa")), "id_a")
      .join(base.select(col("id").as("id_b"), col("ts0").as("tb"),
        size(col("ts0")).as("sb")), "id_b")
      .select(col("id_a"), col("id_b"),
        graft.sql.functions.sortedIntersectCount(col("ta"), col("tb")).as("i"),
        col("sa"), col("sb"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col("i")).as("i"), first(col("sa")).as("sa"),
        first(col("sb")).as("sb"))
      .select(col("id_a"), col("id_b"),
        (col("i").cast("double") / (col("sa") + col("sb") - col("i"))).as("jaccard"))
      .where(col("jaccard") >= t)
  }

  /** Candidate pairs (id_a, id_b) surviving the prefix + length +
    * positional filters, BEFORE the exact verify — a superset of the true
    * result. Public so callers can plug their own verification (e.g. a
    * containment or weighted-overlap scorer) behind the same pruning.
    */
  def candidates(sets: DataFrame): DataFrame =
    candidatesFrom(SetSimilarityJoin.dfSortedFrom(
      SetSimilarityJoin.tokenBase(sets, idCol, tokensCol)))

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
    // repartition BOTH self-join sides by the join key: the identical
    // explicit exchanges make ReuseExchange collapse the whole
    // ordered+prefix derivation to one physical execution (the unkeyed
    // shape broadcast one side, and a BroadcastExchange can never reuse
    // the stream side's exchange — the r16 plan audit measured the full
    // collect_list re-derivation running twice because of it)
    val p = prefix.repartition(col("tok"))
    p.as("a")
      .join(p.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
          least(col("a.sz"), col("b.sz")).cast("double") >=
            lit(t) * greatest(col("a.sz"), col("b.sz")) - lit(eps) &&
          (least(col("a.sz") - col("a.rn"), col("b.sz") - col("b.rn")) + lit(1))
            .cast("double") >=
            ceil(lit(t / (1 + t)) * (col("a.sz") + col("b.sz")) - lit(eps)))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

}

object SetSimilarityJoin {

  /** The (id, ts0) distinct-token base frame every downstream consumer
    * derives from — NOT cached, but shaped so runtime exchange reuse
    * dedupes the tokenizer kernel across consumers.
    *
    * The r16 plan audit found the previous shape ran the caller's
    * tokenizer kernel (an expensive shingle/normalize chain) 8× per
    * execution: 4 consumer subtrees (prefix join's two sides + two
    * verify sides), each containing its own kernel pass plus the df
    * aggregation's second pass, and ZERO ReuseExchange hits — because
    * the consumers' INFERRED IsNotNull(id) filters landed asymmetrically
    * (the verify/prefix branches infer one from their id equi-joins; the
    * df-aggregation branch, which drops id, does not), so the spread
    * exchanges canonicalized differently. Making the filter EXPLICIT
    * here puts the identical filter below every consumer's exchange and
    * ReuseExchange collapses them to ONE kernel pass.
    *
    * Caching A/Bs, for the record (sf0.1, focused, honest per-invocation
    * cache clears): persist() of this frame costs ~2.5 s of columnar
    * array encode AND demotes every downstream broadcast join to
    * sort-merge (InMemoryRelation planning stats) — net wash or worse;
    * localCheckpoint was 4× worse still (r9: stats-less LogicalRDD).
    * Null ids cannot reach the output either way (a null id never
    * equi-joins and never passes id_a < id_b), so the explicit filter
    * changes no result.
    *
    * r17: `ts0` is [[graft.sql.functions.sortedDistinct]] rather than
    * `array_distinct` — same element set, but sorted ONCE per document so
    * the verify legs can merge-count each candidate pair
    * ([[graft.sql.functions.sortedIntersectCount]]) instead of building
    * an `array_intersect` hash set per pair (the r16 profile's largest
    * remaining compute block: q120 343 s + q197 187 s focused task CPU).
    * Every ts0 consumer is order-independent (size, explode+groupBy df
    * aggregation, intersection size), so no result changes.
    */
  private[graft] def tokenBase(
      sets: DataFrame, idCol: String, tokensCol: String): DataFrame =
    graft.sql.functions.spread(
      sets.select(col(idCol).as("id"),
        graft.sql.functions.sortedDistinct(col(tokensCol)).as("ts0"))
        .where(col("id").isNotNull),
      col("id"))

  /** Shared (id, ts, sz) derivation for the prefix-filter family
    * ([[SetSimilarityJoin]], [[ContainmentJoin]]) from a pinned
    * (id, ts0) base: each set re-sorted in the global (df asc, tok asc)
    * order. A window-count formulation of `df` was A/B-ed in r16 and
    * measured WORSE (pairs leg 7.0 s → 8.8 s at sf0.1): the groupBy side
    * partial-aggregates map-side and the df join broadcasts, so the join
    * form never shuffles the raw token stream for the join — while the
    * window form forces a full exchange+sort of every token row. Kept as
    * the join.
    */
  private[graft] def dfSortedFrom(base: DataFrame): DataFrame = {
    val toks = base.select(col("id"), explode_outer(col("ts0")).as("tok"))
    val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    toks.join(dfreq, "tok")
      .groupBy(col("id"))
      .agg(expr("transform(array_sort(collect_list(struct(df, tok))), x -> x.tok)")
        .as("ts"))
      .select(col("id"), col("ts"), size(col("ts")).as("sz"))
  }
}
