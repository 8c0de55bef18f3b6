package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT containment-threshold join: every ORDERED pair (A, B), A != B,
  * with C(A,B) = |A∩B| / |A| >= threshold over distinct-token sets. The
  * asymmetric complement to [[SetSimilarityJoin]]'s Jaccard: containment
  * catches a document swallowed by a LARGER one — boilerplate-wrapped
  * copies, quote farms, page-plus-chrome rewraps — exactly the pairs a
  * symmetric Jaccard threshold misses because the size mismatch dilutes
  * the union (J = |A∩B|/|A∪B| -> small when |B| >> |A| even at C = 1).
  * The set-containment-join literature (Melnik & Garcia-Molina, "Adaptive
  * algorithms for set containment joins", TODS 2003; LSH Ensemble, Zhu et
  * al. VLDB 2016) treats this as its own operator for that reason.
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * == Pruning ==
  *
  * The global token order is the [[SetSimilarityJoin]] one: ascending
  * document frequency, ties by token — a total order, so every engine
  * derives the identical prefix. C(A,B) >= t forces an overlap of at
  * least ceil(t*|A|), so if A's `|A| - ceil(t*|A|) + 1` RAREST tokens are
  * all absent from B, the remaining tokens cannot reach the bound: the
  * candidate join pairs A-prefix tokens against B's FULL token list (the
  * container side cannot be prefix-truncated — the contained overlap may
  * sit anywhere in B's order). Two more filters prune before the verify:
  * the size bound |B| >= ceil(t*|A|), and the positional bound (the
  * PPJoin argument, asymmetric form): both lists share the global order,
  * so the pair's FIRST shared token at positions (rn_a, rn_b) caps the
  * total overlap at 1 + min(|A| - rn_a, |B| - rn_b) — every other shared
  * token follows it in both lists — and a true pair always has its first
  * shared match pass the cap.
  *
  * == Scale shape ==
  *
  * One wordcount-shaped df aggregation, one doc-keyed row-local sort, a
  * prefix-token × inverted-index equi-join, and an exact verify that
  * joins ONLY candidate pairs back to their token arrays (row-local
  * `array_intersect`). The B-side full token index is the honest cost of
  * exact containment (it IS the inverted index); per-key fan-out is
  * bounded by df(token) × |A-prefixes containing token|, and the prefix
  * side holds only each set's rarest tokens, so a stopword posting list
  * pairs with almost nothing. Nothing is quadratic unless the OUTPUT is.
  * Empty sets join nothing (containment undefined at |A| = 0).
  */
class ContainmentJoin(
    threshold: Double,
    idCol: String = "doc_id",
    tokensCol: String = "toks") {
  require(threshold > 0.0 && threshold <= 1.0,
    s"threshold ($threshold) must be in (0, 1]")

  // same ceil-fuzz guard as SetSimilarityJoin: 0.9*30 = 27.000000000000004
  // must not ceil to 28 (a MISSED-pair bug); 1e-9 admits at most a
  // spurious candidate, which the exact verify discards
  private val eps = 1e-9

  /** All ordered pairs (id_a, id_b, containment) with id_a != id_b and
    * exact |A∩B|/|A| >= threshold over the distinct-token sets.
    *
    * PRECONDITION: ids are unique (one row per id) — same contract and
    * reason as [[SetSimilarityJoin.pairs]]: the verify joins the
    * un-aggregated token frame behind a first() barrier, so duplicate ids
    * with differing token arrays would score an arbitrary one.
    */
  def pairs(sets: DataFrame): DataFrame = {
    val t = threshold
    // r16 (the SetSimilarityJoin restructure, measured there): all
    // consumers derive from the shared tokenBase shape so ReuseExchange
    // dedupes the caller's tokenizer kernel to one pass, and the verify
    // joins the UNSORTED base arrays — intersection size is
    // order-independent, so only the prefix/index legs need the
    // df-sorted derivation.
    val base = SetSimilarityJoin.tokenBase(sets, idCol, tokensCol)
    val ordered = SetSimilarityJoin.dfSortedFrom(base)
    // contained side: rarest-token prefix, 1-based position for the bound
    val prefix = ordered.select(col("id"), col("sz"),
      posexplode_outer(expr(
        s"slice(ts, 1, sz - CAST(ceil($t * sz - $eps) AS INT) + 1)")))
      .select(col("id"), col("sz"), (col("pos") + 1).as("rn"), col("col").as("tok"))
    // container side: the FULL list (see class doc), position for the bound
    val index = ordered.select(col("id"), col("sz"),
      posexplode_outer(col("ts")))
      .select(col("id").as("id_b"), col("sz").as("sz_b"),
        (col("pos") + 1).as("rn_b"), col("col").as("tok"))
    // the prefix×index join keeps the planner's broadcast shape: a keyed
    // (repartition-by-tok, sort-merge) variant was A/B-ed in r16 and cost
    // +76% task CPU (330 s vs 187 s focused) for the same wall time —
    // unlike SetSimilarityJoin's SYMMETRIC self-join, the two sides here
    // differ, so forcing identical exchanges buys no ReuseExchange and
    // only pays the full-index shuffle+sort
    val pk = prefix
    val ik = index
    val cands = pk
      .join(ik,
        pk("tok") === ik("tok") && pk("id") =!= ik("id_b") &&
          ik("sz_b").cast("double") >= ceil(lit(t) * pk("sz") - lit(eps)) &&
          (least(pk("sz") - pk("rn"), ik("sz_b") - ik("rn_b")) + lit(1))
            .cast("double") >= ceil(lit(t) * pk("sz") - lit(eps)))
      .select(pk("id").as("id_a"), ik("id_b"))
      .distinct()
    // verify once per candidate behind a first() aggregate barrier (the
    // r16 SetSimilarityJoin finding: an unbarriered containment filter is
    // pushed into the join condition and the projection recomputes the
    // same array_intersect per candidate); the barrier pipelines with no
    // exchange because the join output is already partitioned on id_a
    graft.sql.functions.spread(cands, col("id_a"))
      .join(base.select(col("id").as("id_a"), col("ts0").as("ta"),
        size(col("ts0")).as("sa")), "id_a")
      .join(base.select(col("id").as("id_b"), col("ts0").as("tb")), "id_b")
      .select(col("id_a"), col("id_b"),
        graft.sql.functions.sortedIntersectCount(col("ta"), col("tb")).as("i"),
        col("sa"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col("i")).as("i"), first(col("sa")).as("sa"))
      .select(col("id_a"), col("id_b"),
        (col("i").cast("double") / col("sa")).as("containment"))
      .where(col("containment") >= t)
  }
}
