package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.similarity.{IvfCosineIndex, IvfIndex}

/** Continuous ANN index maintenance: every streaming micro-batch of new
  * embeddings is assigned against the SAVED coarse centroids (one
  * broadcast pass — no retraining, no rescan of anything already indexed)
  * and written straight into the on-disk inverted-file layout. The batch
  * path's nightly `load → append → save-next-version` cycle
  * (ArtifactPersistenceSpec) rewrites the lists; this operator is the
  * streaming-cadence alternative that does O(micro-batch) work per
  * trigger against a single growing layout.
  *
  * Layout: `$path/centroids` as in [[IvfIndex.save]];
  * `$path/lists/batch=N/cid=K/` — list rows partitioned by the micro-batch
  * id FIRST, then cluster. The batch level is what buys EXACTLY-ONCE
  * effect on top of foreachBatch's at-least-once replays: each write uses
  * dynamic partition overwrite, so a replayed batch id overwrites exactly
  * its own `batch=N` partitions instead of appending duplicate rows
  * (duplicate list entries would surface as duplicate candidates in
  * search results — corrupt top-k, not just wasted space). Probe joins
  * still prune on `cid` (it stays a partition column); [[load]] drops the
  * batch column before handing back a plain [[IvfIndex]].
  *
  * Scale: per trigger, work = one broadcast-centroid pass over the batch
  * plus a `cid`-clustered write of batch-sized output. Files accrue one
  * per (batch, touched cid) — MEASURED (IvfStreamMaintainerSpec cadence
  * test): 20 triggers over a 4-cell index accrued 67 files and slowed
  * search 0.48 s → compaction to 4 files recovered it to 0.29 s, so the
  * recommendation is [[compactTo]] every O(numCentroids) triggers (keep
  * files-per-cell low single digits), run as an offline job against the
  * live path with an atomic pointer cutover. Centroid RETRAIN cadence is
  * signal-driven, not time-driven: [[cellDrift]] reads the PSI of the
  * cell-occupancy mix (appended batches vs the earliest era present —
  * the bootstrap era when one exists) — < 0.1 keep streaming, ≥ 0.25
  * retrain + cutover (spec-pinned on a planted corpus shift).
  */
class IvfStreamMaintainer(ivf: IvfCosineIndex, path: String) {

  /** Initialize the maintained layout from a base corpus: train + save
    * centroids, write the base inverted lists as `batch=0`. (A plain
    * [[IvfIndex.save]] layout is NOT a valid starting point — its lists
    * lack the batch partition level, and mixed-depth partition dirs fail
    * discovery; the maintainer owns its layout end-to-end.)
    */
  def bootstrap(corpus: DataFrame): Unit = {
    val idx = ivf.build(corpus)
    // estimator contract (the KMeans/forCodebook discipline): empty
    // centroids would make every future appendBatch assign against
    // nothing and silently index zero vectors forever
    require(!idx.centroids.isEmpty,
      "cannot bootstrap a maintained IVF index on an empty corpus")
    idx.centroids.coalesce(1).write.mode("overwrite")
      .parquet(s"$path/centroids")
    writeBatch(idx.lists, batchId = 0L)
  }

  // the centroids are immutable for this maintainer's lifetime (only
  // compactTo — a NEW path and maintainer — ever re-writes them), so read
  // the tiny frame once and materialize it instead of paying a parquet
  // read + schema inference on every trigger of a long-running stream
  @volatile private var centsCache: DataFrame = _

  private def centroids(spark: SparkSession): DataFrame = {
    if (centsCache == null)
      centsCache = spark.read.parquet(s"$path/centroids").localCheckpoint()
    centsCache
  }

  /** One micro-batch: assign against the saved centroids and write the
    * new list rows into `batch=<batchId>`. Idempotent per batch id.
    */
  def appendBatch(batch: DataFrame, batchId: Long): Unit =
    writeBatch(ivf.listRows(batch, centroids(batch.sparkSession)), batchId)

  /** Start the maintenance stream: each trigger appends its micro-batch.
    * Streaming batch ids restart from the checkpoint on recovery, so a
    * replayed trigger rewrites its own partition — the exactly-once leg.
    * Batch ids are offset by 1 so `batch=0` stays the bootstrap's.
    */
  def start(stream: DataFrame, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) => appendBatch(b, id + 1L) }
      .start()

  /** Compact the accrued per-batch files into a fresh maintained layout
    * at `newPath` (everything re-written as its `batch=0`): one read of
    * the lists, one `cid`-clustered write — run at whatever cadence file
    * counts demand, then point the maintainer (and its restarted stream)
    * at the new path. A NEW path, not in place: the write would otherwise
    * overwrite its own source (the [[IvfIndex.save]] versioning note),
    * and cutover stays atomic.
    */
  def compactTo(spark: SparkSession, newPath: String): IvfStreamMaintainer = {
    val idx = load(spark)
    idx.centroids.coalesce(1).write.mode("overwrite")
      .parquet(s"$newPath/centroids")
    val next = new IvfStreamMaintainer(ivf, newPath)
    next.writeBatch(idx.lists, batchId = 0L)
    next
  }

  /** Reopen the maintained layout as a plain [[IvfIndex]] (batch column
    * dropped; `cid` re-cast to long as in [[IvfIndex.load]]).
    */
  def load(spark: SparkSession): IvfIndex =
    IvfIndex(
      spark.read.parquet(s"$path/centroids"),
      spark.read.parquet(s"$path/lists")
        .withColumn("cid", col("cid").cast("long"))
        .drop("batch"))

  /** Centroid-retrain signal: PSI drift of the CELL-OCCUPANCY distribution
    * between the EARLIEST batch era present (the bootstrap era when
    * [[bootstrap]] ran; otherwise the first appended micro-batch — a
    * maintainer provisioned without bootstrap has no `batch=0` rows, and
    * an empty baseline would smooth to uniform and read any legitimately
    * skewed occupancy as PSI ≥ 0.25 forever) and everything appended
    * since. Frozen centroids index a drifting corpus into increasingly
    * unbalanced cells — the occupancy shares ARE the symptom (hot cells →
    * fat probe candidate lists, cold cells → wasted probes) — so the
    * standard PSI reading applies directly: < 0.1 keep streaming,
    * 0.1–0.25 watch, ≥ 0.25 retrain (fit fresh centroids on a corpus
    * sample, then [[compactTo]]-style cutover to a new maintainer).
    * Returns 0.0 (no signal) before any data lands — including before the
    * lists directory exists at all. Cost: one min/max-batch agg plus the
    * PSI pass, both reduced map-side to ≤2·numCentroids rows.
    */
  def cellDrift(spark: SparkSession): Double = {
    // a monitor can poll before the first trigger ever writes the layout;
    // spark.read.parquet on a missing path throws, so probe first
    val listsPath = new org.apache.hadoop.fs.Path(s"$path/lists")
    val fs = listsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(listsPath)) return 0.0
    val lists = spark.read.parquet(s"$path/lists")
      .withColumn("cid", col("cid").cast("long"))
    // one combined agg replaces a min-scan plus a since.isEmpty scan:
    // `since` is empty iff max == min. Partition discovery may type
    // `batch` as int; normalize before the agg.
    val eras = lists.agg(
      min(col("batch").cast("long")), max(col("batch").cast("long"))).head()
    if (eras.isNullAt(0)) return 0.0 // schema-fallback file only, no rows
    val b0 = eras.getLong(0)
    if (eras.getLong(1) == b0) return 0.0 // nothing appended since baseline
    val base = lists.where(col("batch") === b0).select(col("cid"))
    val since = lists.where(col("batch") > b0).select(col("cid"))
    new graft.feature.DriftMonitor().categorical(base, since, "cid")
      .agg(sum(col("psi_term"))).head().getDouble(0)
  }

  // Once a batch= partition directory provably exists, it can never
  // disappear (dynamic overwrite only replaces same-batch partitions), so
  // the schema-fallback probe below is settled for this maintainer's
  // lifetime — skip the per-trigger listStatus + delete round-trip that
  // would otherwise tax every micro-batch of a long-running stream.
  @volatile private var layoutHasPartitions = false

  private def writeBatch(listRows: DataFrame, batchId: Long): Unit = {
    val withBatch = listRows.withColumn("batch", lit(batchId))
    withBatch
      .repartition(col("cid"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch", "cid")
      .parquet(s"$path/lists")
    // zero rows + partitionBy writes no schema-bearing files — the same
    // degenerate-layout bug class IvfIndex.save guards against; without
    // this a stream whose FIRST batches are all empty (centroids
    // provisioned, backfill not yet landed) leaves load() dying with
    // UNABLE_TO_INFER_SCHEMA
    if (!layoutHasPartitions) {
      val listsPath = new org.apache.hadoop.fs.Path(s"$path/lists")
      val fs = listsPath.getFileSystem(
        listRows.sparkSession.sparkContext.hadoopConfiguration)
      val hasPartitions = fs.exists(listsPath) &&
        fs.listStatus(listsPath).exists(_.getPath.getName.startsWith("batch="))
      if (!hasPartitions)
        withBatch.limit(0).write.mode("overwrite").parquet(s"$path/lists")
      else {
        // inverse transition: a real batch arriving AFTER an empty prefix
        // must clear the schema-only fallback file — root-level part files
        // mixed with partition directories break partition discovery
        fs.listStatus(listsPath)
          .filter(_.getPath.getName.startsWith("part-"))
          .foreach(f => fs.delete(f.getPath, false))
        layoutHasPartitions = true
      }
    }
  }
}
