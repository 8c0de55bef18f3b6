package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (RRF, Cormack & Clarke 2009) of N ranked
  * retrieval legs — the standard way to combine a lexical ranker (BM25)
  * with an embedding ranker (cosine ANN) without score calibration:
  * fused(q, d) = Σ_legs 1 / (k0 + rank_leg(q, d)), summed over the legs
  * that retrieved d for q, then re-ranked. Only RANKS cross the fusion
  * boundary, so incomparable score scales (BM25 logs vs cosines) never
  * meet.
  *
  * Beyond-reference operator (LLM-pipeline extension from the build
  * brief): hybrid retrieval is how a curation pipeline finds
  * eval-set contamination and near-topical documents that either pure
  * lexical or pure vector search misses.
  *
  * == Determinism contract ==
  *
  * The per-(query, id) fusion pivots each leg's rank into its own column
  * with an INTEGER min aggregate (duplicate ids within a leg keep their
  * best rank) and adds the 1/(k0+r) terms in FIXED leg order — never a
  * float `sum()` aggregate, whose addition order follows partition
  * arrival and would unpin the bit pattern run to run. Ties on the fused
  * score break by id ascending. The q180 oracle replays the identical
  * fixed-order arithmetic.
  *
  * == Scale ==
  *
  * Inputs are the legs' top-k frames — k rows per query each — so the
  * union + one keyed aggregation + the grouped rank all run on
  * O(queries × k × legs) rows regardless of corpus size; the heavy
  * lifting stays inside the legs (BM25's term-pruned scan, the ANN
  * index), which is the point of fusing ranks instead of re-scoring.
  */
object HybridRetriever {

  /** Fuse named legs — each a DataFrame with (`queryCol`, `idCol`,
    * `rankCol`) where rank is 1-based within query — into
    * (query, id, rrf_score, rank, rank_<leg> ...). A leg that did not
    * retrieve (query, id) contributes 0 and a null rank_<leg>.
    */
  def fuse(
      legs: Seq[(String, DataFrame)],
      rrfK: Int = 60,
      topK: Int = 10,
      queryCol: String = "query_id",
      idCol: String = "id",
      rankCol: String = "rank",
      pin: Boolean = true): DataFrame = {
    require(legs.nonEmpty, "fuse needs at least one leg")
    require(legs.map(_._1).distinct.size == legs.size,
      s"duplicate leg names: ${legs.map(_._1).mkString(", ")}")
    require(rrfK >= 0, s"rrfK ($rrfK) must be nonnegative")
    require(topK > 0, s"topK ($topK) must be positive")

    val tagged = legs.zipWithIndex.map { case ((_, df), i) =>
      df.select(col(queryCol).as("__q"), col(idCol).as("__id"),
        col(rankCol).cast("long").as("__r"), lit(i).as("__leg"))
    }.reduce(_ unionByName _)

    val rankCols = legs.zipWithIndex.map { case ((name, _), i) =>
      min(when(col("__leg") === i, col("__r"))).as(s"rank_$name")
    }
    // localCheckpoint: the grouped-rank path below reads its input
    // through a stats-join diamond (group stats + main branch + bucket
    // offsets), so an UNPINNED frame re-executes the legs' full plans —
    // BM25 corpus scans, ANN kernels — two to three times. Measured on
    // q180 at sf0.1: unpinned 7.2-9.3 s, pinned ~sum of one pass per leg.
    // The pinned frame is O(queries × k × legs) rows by construction
    // (the legs are top-k outputs), so materializing it eagerly is
    // O(output), never O(corpus). `pin = false` exists for PLAN AUDITS:
    // the eager checkpoint truncates lineage, so the per-query audit
    // would otherwise only ever see the fusion tail, never the legs
    // (PlanAuditSpec audits q180's legs through this door).
    val grouped = tagged.groupBy(col("__q"), col("__id"))
      .agg(rankCols.head, rankCols.tail: _*)
    val pivoted = if (pin) grouped.localCheckpoint(true) else grouped

    // fixed left-to-right addition: leg order is part of the contract
    val rrf = legs.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(rrfK.toDouble) + col(s"rank_$name")), lit(0.0))
    }.reduce(_ + _)

    val ranked = graft.sql.GroupedNtile.rankByValue(
      pivoted.withColumn("rrf_score", rrf),
      "__q", "rrf_score", descending = true, tieCols = Seq(col("__id")),
      rankName = "rank")

    ranked.where(col("rank") <= topK)
      .select(
        Seq(col("__q").as(queryCol), col("__id").as(idCol),
          col("rrf_score"), col("rank").cast("int").as("rank")) ++
          legs.map { case (name, _) => col(s"rank_$name") }: _*)
  }
}
