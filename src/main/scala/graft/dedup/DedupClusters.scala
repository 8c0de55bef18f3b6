package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collapses a near-duplicate PAIR list into clusters: connected components
  * by iterative minimum-label propagation (the standard large-scale
  * approach — each hop is one keyed join + aggregation, converging in
  * O(component diameter) hops, with `localCheckpoint` truncating lineage
  * between materialized rounds). The cluster id is the smallest member id,
  * so "keep one per cluster" = `WHERE id = cluster`.
  *
  * Duplicate clusters are tiny by construction (diameter a few hops), so
  * several hops are chained LAZILY inside each materialized round
  * (`hopsPerRound`), and convergence is tested once per round — not per
  * hop — via the fixpoint property that every edge must connect
  * equal-labeled endpoints. A diameter-≤3 graph (the common near-dup case)
  * thus costs ONE materialization plus one check job, instead of one
  * action pair per hop. `maxRounds` bounds the loop (supports diameter up
  * to hopsPerRound×maxRounds); the method throws if it is hit before the
  * fixpoint — a silent partial clustering would corrupt dedup.
  */
object DedupClusters {

  /** (id, cluster) for every node: cluster = min id reachable through
    * `pairs` (undirected). Nodes absent from `pairs` are their own cluster.
    *
    * @param nodes one row per id (column `idCol`)
    * @param pairs candidate/verified duplicate pairs with columns id_a, id_b
    */
  def components(
      nodes: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      maxRounds: Int = 15,
      hopsPerRound: Int = 2): DataFrame = {
    require(maxRounds > 0 && hopsPerRound > 0,
      s"need positive maxRounds ($maxRounds) and hopsPerRound ($hopsPerRound)")
    // symmetrize via a row-local explode, not a union of two selects: the
    // union instantiates the whole upstream `pairs` plan (often a full
    // near-dup candidate/verify pipeline) TWICE in the materialization
    // job, and the differing output projections defeat exchange reuse
    // (r16, guide §2.4). One explode reads pairs once for identical rows.
    val edgesCk = pairs
      .select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint(true)
    val labelsCk = nodes.select(col(idCol).as("id"), col(idCol).as("label"))
      .localCheckpoint(true)

    // size the loop's frames from the measured data: the iteration frames
    // inherit the upstream partitioning (e.g. 32 shuffle partitions), and
    // on small inputs per-iteration cost is pure task-scheduling overhead —
    // coalesce to ~1M rows/partition, capped at default parallelism
    // (both counts are cheap — the frames are already materialized)
    val rows = edgesCk.count() max labelsCk.count()
    val parts = math.max(1L, math.min(
      labelsCk.sparkSession.sparkContext.defaultParallelism.toLong,
      rows / (1L << 20) + 1)).toInt
    val edges = edgesCk.coalesce(parts)

    // one min-label hop: label := min(label, min over neighbors' labels)
    def hop(l: DataFrame): DataFrame = {
      val neighborMin = edges
        .join(l.select(col("id").as("dst"), col("label").as("dstLabel")), "dst")
        .groupBy(col("src")).agg(min(col("dstLabel")).as("nbrMin"))
      l.join(neighborMin.select(col("src").as("id"), col("nbrMin")), Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbrMin"), col("label"))).as("label"))
    }

    // fixpoint test: at convergence every component carries its min label,
    // so every edge connects equal labels; any mismatch means another
    // round is needed
    def mismatched(l: DataFrame): Long = edges
      .join(l.select(col("id").as("src"), col("label").as("srcLabel")), "src")
      .join(l.select(col("id").as("dst"), col("label").as("dstLabel")), "dst")
      .where(col("srcLabel") =!= col("dstLabel"))
      .count()

    var labels = labelsCk.coalesce(parts)
    var dirty = true
    var round = 0
    while (dirty && round < maxRounds) {
      var l = labels
      var h = 0
      while (h < hopsPerRound) { l = hop(l); h += 1 }
      labels = l.coalesce(parts).localCheckpoint(true)
      dirty = mismatched(labels) > 0
      round += 1
    }
    require(!dirty,
      s"label propagation did not converge within $maxRounds rounds of $hopsPerRound hops")
    labels.select(col("id").as(idCol), col("label").as("cluster"))
  }
}
