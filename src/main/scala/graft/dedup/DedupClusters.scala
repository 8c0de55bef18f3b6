package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collapses a near-duplicate PAIR list into clusters: connected components
  * by iterative minimum-label propagation (the standard large-scale
  * approach — each round is one keyed join + aggregation, converging in
  * O(component diameter) rounds, with `localCheckpoint` truncating lineage
  * between rounds). The cluster id is the smallest member id, so "keep one
  * per cluster" = `WHERE id = cluster`.
  *
  * Duplicate clusters are tiny by construction (diameter a few hops), so
  * the loop terminates in a handful of rounds regardless of corpus size;
  * `maxIterations` is a safety bound, and the method throws if it is hit
  * before the fixpoint (a silent partial clustering would corrupt dedup).
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
      maxIterations: Int = 20): DataFrame = {
    val edgesCk = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true)
    var labelsCk = nodes.select(col(idCol).as("id"), col(idCol).as("label"))
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

    var labels = labelsCk.coalesce(parts)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIterations) {
      val neighborMin = edges
        .join(labels.select(col("id").as("dst"), col("label").as("dstLabel")), "dst")
        .groupBy(col("src")).agg(min(col("dstLabel")).as("nbrMin"))
      val updated = labels
        .join(neighborMin.select(col("src").as("id"), col("nbrMin")), Seq("id"), "left")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nbrMin"), col("label"))).as("newLabel"))
        .coalesce(parts)
        .localCheckpoint(true)
      changed = updated.where(col("newLabel") < col("label")).count()
      labels = updated.select(col("id"), col("newLabel").as("label"))
      iter += 1
    }
    require(changed == 0,
      s"label propagation did not converge within $maxIterations iterations")
    labels.select(col("id").as(idCol), col("label").as("cluster"))
  }
}
