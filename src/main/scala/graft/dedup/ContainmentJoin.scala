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
    */
  def pairs(sets: DataFrame): DataFrame = {
    val t = threshold
    val ordered = sorted(sets)
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
    val cands = prefix
      .join(index,
        prefix("tok") === index("tok") && prefix("id") =!= index("id_b") &&
          index("sz_b").cast("double") >= ceil(lit(t) * prefix("sz") - lit(eps)) &&
          (least(prefix("sz") - prefix("rn"), index("sz_b") - index("rn_b")) + lit(1))
            .cast("double") >= ceil(lit(t) * prefix("sz") - lit(eps)))
      .select(prefix("id").as("id_a"), index("id_b"))
      .distinct()
    cands
      .join(ordered.select(col("id").as("id_a"), col("ts").as("ta"), col("sz").as("sa")), "id_a")
      .join(ordered.select(col("id").as("id_b"), col("ts").as("tb")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("ta"), col("tb"))).cast("double") / col("sa"))
          .as("containment"))
      .where(col("containment") >= t)
  }

  /** (id, ts, sz): each set re-sorted in the global (df asc, tok asc)
    * order — the [[SetSimilarityJoin]] derivation (deliberately unpinned
    * there for measured reasons that apply identically here).
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
}
