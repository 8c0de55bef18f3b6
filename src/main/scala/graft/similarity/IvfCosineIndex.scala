package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sql.functions.cosineSimilarity

/** IVF (inverted-file) approximate cosine search: a coarse quantizer
  * clusters the corpus, each vector is listed under its nearest centroid,
  * and a query probes only the `nprobe` closest clusters — the classic
  * partition-pruning ANN layout (FAISS IVF-Flat shape).
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief);
  * complements [[RandomHyperplaneLSH]]: LSH buckets by random signs, IVF by
  * learned data clusters (better for clustered corpora).
  *
  * The quantizer is deterministic and oracle-replayable: seed centroids =
  * the `numCentroids` lowest-id vectors, refined by ONE Lloyd iteration
  * (per-dimension member mean; cosine is scale-invariant so the mean is
  * left unnormalized). Swap in full distributed k-means offline for
  * production-quality cells — the index/search plumbing is unchanged.
  *
  * Scale: centroids are broadcast (numCentroids is small by design);
  * assignment is one streamed pass over the corpus; search touches only
  * `nprobe / numCentroids` of the data — the whole point of IVF at 100 TB.
  * The inverted lists shuffle on cluster id; skewed clusters are bounded by
  * refining with more centroids.
  */
class IvfCosineIndex(
    numCentroids: Int,
    nprobe: Int,
    val idCol: String = "vec_id",
    val vecCol: String = "embedding",
    dim: Option[Int] = None) {
  require(numCentroids > 0 && nprobe > 0 && nprobe <= numCentroids,
    s"need 0 < nprobe ($nprobe) <= numCentroids ($numCentroids)")
  require(dim.forall(_ > 0), "dim must be positive when given")

  private def dvec(c: Column): Column = c.cast("array<double>")

  /** (id, cv) spread to full parallelism: assignment evaluates numCentroids
    * cosine kernels per row, which a single-split input would serialize.
    */
  private def corpus(candidates: DataFrame): DataFrame =
    graft.sql.functions.spread(
      candidates.select(col(idCol), dvec(col(vecCol)).as("cv")), col(idCol))

  /** The row-local nearest-centroid column (see
    * [[graft.sql.expressions.NearestCentroidId]]) against the COLLECTED
    * centroid set — centroids are driver-tiny by contract (numCentroids
    * rows, the same bound the previous `broadcast(cents)` relied on).
    * None when the set is empty. r17 (guide §2.4): the previous
    * `crossJoin(broadcast) → groupBy(id).max_by → join-back` shape paid an
    * argmax shuffle plus a corpus-side join-back shuffle on EVERY
    * assignment pass (bootstrap, each micro-batch append, each Lloyd
    * step); the expression replicates `max_by(cid, struct(cos, -cid))`
    * bit-exactly (same cosine loop, same tie/NaN/null ordering) with zero
    * shuffles.
    */
  private def collectCells(cents: DataFrame) =
    cents.select(col("cid").cast("long"),
      dvec(col("centroid")).as("centroid")).collect()
      .sortBy(r => (r.isNullAt(0), if (r.isNullAt(0)) 0L else r.getLong(0)))

  private def cellLiterals(rows: Array[org.apache.spark.sql.Row]) = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
    (Literal.create(rows.map(r =>
        if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))).toSeq,
        ArrayType(LongType)),
      Literal.create(rows.map(r =>
        if (r.isNullAt(1)) null else r.getSeq[Double](1)).toSeq,
        ArrayType(ArrayType(DoubleType))))
  }

  private def nearestCidCol(cents: DataFrame): Option[Column] = {
    val rows = collectCells(cents)
    if (rows.isEmpty) None
    else {
      val (cidLit, centLit) = cellLiterals(rows)
      Some(org.apache.spark.sql.GraftBridge.column(
        graft.sql.expressions.NearestCentroidId(
          org.apache.spark.sql.GraftBridge.expression(col("cv")),
          cidLit, centLit)))
    }
  }

  /** Row-local top-nprobe probe-cell array for a query-vector column —
    * replaces the crossJoin + per-query row_number window in [[probes]]
    * (same ordering: cos DESC with NaN first / nulls last, ties by cid).
    */
  private def probeCidsCol(vecCol2: Column, cents: DataFrame): Column = {
    val (cidLit, centLit) = cellLiterals(collectCells(cents))
    org.apache.spark.sql.GraftBridge.column(
      graft.sql.expressions.NearestCentroidIds(
        org.apache.spark.sql.GraftBridge.expression(vecCol2),
        cidLit, centLit, nprobe))
  }

  /** The corpus frame with a row-local `cid` column; empty (same schema)
    * when the centroid set is empty — the previous crossJoin shape joined
    * nothing against an empty broadcast.
    */
  private def withNearest(e: DataFrame, cents: DataFrame): DataFrame =
    nearestCidCol(cents) match {
      case Some(c) => e.withColumn("cid", c)
      case None => e.withColumn("cid", lit(null).cast("long")).where(lit(false))
    }

  /** (id, cid): nearest centroid per vector (ties: lowest cid), computed
    * row-locally — no argmax shuffle. PRECONDITION (shared by every
    * declared query): one row per non-null id; the old groupBy(id) shape
    * collapsed duplicate ids to one arbitrary-winner row where this
    * assigns each row independently.
    */
  private def assign(vectors: DataFrame, cents: DataFrame): DataFrame =
    withNearest(vectors, cents).select(col(idCol), col("cid"))

  /** Learned centroids (cid, centroid): lowest-id seeds + one Lloyd step.
    * A cell that wins no members drops out of the Lloyd means — harmless
    * for IVF (its inverted list would be empty; probes just go to real
    * cells), unlike PQ where dense codes are a layout contract.
    */
  def centroids(candidates: DataFrame): DataFrame = {
    val e = corpus(candidates)
    // seeds picked by RANK (order-by + limit → TakeOrderedAndProject), not a
    // value predicate, so sparse/offset id spaces still yield exactly
    // numCentroids seeds; cid = the seed's dense 0-based rank in id order
    // (NOT the id cast to long — string ids like UUIDs cast to NULL, and
    // NULL never equi-joins, which would make every search silently return
    // zero rows). Rank order equals id order, so "lowest cid" tie-breaks
    // pick the same seed id keys would.
    val seeds = Seeding.kLowestIdRanks(e, idCol, numCentroids, "cid")
      .select(col("cid"), col("cv").as("centroid"))
    // row-local seed assignment (r17): the old e.join(assign(e, seeds),
    // idCol) paid the argmax shuffle + a join-back; the null-id filter
    // replicates the equi-join's drop of null-id rows from the Lloyd means
    val members = withNearest(e, seeds).where(col(idCol).isNotNull)
    dim match {
      // known dimensionality: one partial-aggregated groupBy of d scalar
      // avgs — no per-component explode, no second shuffle
      case Some(d) =>
        members.groupBy(col("cid"))
          .agg(array((0 until d).map(i => avg(col("cv")(i))): _*).as("centroid"))
      // unknown dimensionality: per-(cid, pos) means then re-assembly
      case None =>
        members
          .select(col("cid"), posexplode(col("cv")))
          .groupBy(col("cid"), col("pos")).agg(avg(col("col")).as("m"))
          .groupBy(col("cid"))
          .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> x.m)")
            .as("centroid"))
    }
  }

  /** Inverted lists: (id, cid) under the refined centroids. */
  def index(candidates: DataFrame): DataFrame = {
    val e = corpus(candidates)
    assign(e, centroids(candidates))
  }

  /** One-time index build: the (centroids, inverted-lists) pair that
    * [[search(queries:org\.apache\.spark\.sql\.DataFrame,index:graft\.similarity\.IvfIndex,k:Int)* search]]
    * probes. The corpus is scanned for assignment ONCE here; serving a
    * query batch never rescans it (pre-split, `search` re-derived the
    * centroids and lists per call — three-plus corpus passes per search,
    * defeating IVF's purpose at scale).
    *
    * Centroids are tiny (`numCentroids` rows) and localCheckpoint-ed so
    * the lists job and every probe reuse the materialized result instead
    * of re-running seed-assign-Lloyd. The lists stay a lazy plan: persist
    * them (`index.lists.persist()` / write bucketed by `cid`) when serving
    * many query batches from one build.
    */
  def build(candidates: DataFrame): IvfIndex = {
    val cents = centroids(candidates).localCheckpoint()
    IvfIndex(cents, listRows(candidates, cents))
  }

  /** [[build]] + [[IvfIndex.save]] fused for the offline-train half of a
    * train-then-serve pipeline (r16): the centroids are computed INSIDE
    * their own write action and the lists are assigned against the
    * written copy (parquet round-trips doubles bit-exactly), which drops
    * the separate centroid-localCheckpoint action `build(...).save(...)`
    * pays. One corpus pass for training, one for listing — same passes,
    * one fewer blocking job.
    */
  def buildTo(candidates: DataFrame, path: String): Unit = {
    centroids(candidates).coalesce(1).write.mode("overwrite")
      .parquet(s"$path/centroids")
    val spark = candidates.sparkSession
    val cents = spark.read.parquet(s"$path/centroids").localCheckpoint()
    IvfIndex(cents, listRows(candidates, cents)).saveListsOnly(path)
  }

  /** Index build against EXTERNALLY-trained centroids (cid, centroid) —
    * the [[KMeans]] integration: train real cluster structure with
    * multi-step Lloyd offline, then list the corpus under those cells
    * with the same one-pass assignment. `numCentroids`/`nprobe` keep
    * governing probe width, so construct the index with numCentroids =
    * the trained k.
    */
  def buildWith(candidates: DataFrame, cents: DataFrame): IvfIndex = {
    val c = cents.select(col("cid"), dvec(col("centroid")).as("centroid"))
      .localCheckpoint()
    IvfIndex(c, listRows(candidates, c))
  }

  /** Assignment (id, cid) of NEW vectors to a prebuilt index's centroids —
    * the incremental-append path: a nightly embedding batch joins an
    * existing index with ONE broadcast-centroid pass over the batch, no
    * quantizer re-training, no rescan of the indexed corpus. (Centroids
    * drift as the corpus grows; rebuild cadence is the caller's policy —
    * the standard IVF operational trade.)
    */
  def assignNew(index: IvfIndex, vectors: DataFrame): DataFrame =
    assign(corpus(vectors),
      index.centroids.select(col("cid"), dvec(col("centroid")).as("centroid")))

  /** The index with `vectors`' inverted-list rows appended. (Through
    * [[listRows]], so external centroids get the same array<double>
    * normalization every other assignment path applies.)
    */
  def append(index: IvfIndex, vectors: DataFrame): IvfIndex =
    IvfIndex(index.centroids,
      index.lists.unionByName(listRows(vectors, index.centroids)))

  /** Inverted-list rows (id, cv, cid) of `vectors` under EXISTING
    * centroids — one broadcast-centroid pass, no training. The unit of
    * incremental index growth: [[append]] unions these into a held index,
    * [[graft.streaming.IvfStreamMaintainer]] writes them straight into a
    * saved layout per micro-batch.
    */
  def listRows(vectors: DataFrame, cents: DataFrame): DataFrame = {
    val c = cents.select(col("cid"), dvec(col("centroid")).as("centroid"))
    val e = corpus(vectors)
    // row-local cid (r17) — the old e.join(assign(e, c), idCol) re-keyed
    // the corpus by id just to attach a column computable in place; the
    // null-id filter replicates the equi-join's drop of null-id rows
    withNearest(e, c).where(col(idCol).isNotNull)
      .select(col(idCol), col("cv"), col("cid"))
  }

  /** (query_id, qv, cid): each query's `nprobe` nearest cells — the probe
    * set every IVF-family search starts from (shared by [[search]] and
    * IVF-PQ compositions).
    */
  def probes(queries: DataFrame, index: IvfIndex): DataFrame = {
    val qv = queries.select(col(idCol).as("query_id"), dvec(col(vecCol)).as("qv"))
    // row-local top-nprobe (r17, guide §2.4): the old shape cross-joined
    // every query against the broadcast centroids and ranked the cells
    // with a per-query row_number window — a query-keyed exchange + sort
    // per search — when the whole selection is computable in place
    // against centroid literals with the identical ordering
    qv.withColumn("cid",
        explode(probeCidsCol(col("qv"), index.centroids)))
      .select(col("query_id"), col("qv"), col("cid"))
  }

  /** Top-k cosine neighbors per query over a prebuilt index, searching only
    * the nprobe nearest clusters. Self-pairs excluded.
    */
  def search(queries: DataFrame, index: IvfIndex, k: Int): DataFrame = {
    val lists = index.lists
    val wRank = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col(idCol))
    probes(queries, index).join(lists, "cid")
      .where(col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol),
        cosineSimilarity(col("qv"), col("cv")).as("cosine"))
      .withColumn("rank", row_number().over(wRank))
      .where(col("rank") <= k)
  }

  /** Convenience: [[build]] + the index-taking `search` overload in one
    * call for one-shot queries.
    */
  def search(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame =
    search(queries, build(candidates), k)
}

/** A built IVF index: broadcast-sized refined centroids (cid, centroid)
  * plus the inverted lists (id, cv, cid). Produced by
  * [[IvfCosineIndex.build]]; reusable across query batches.
  *
  * [[save]] persists the true inverted-FILE layout: lists are written
  * `partitionBy("cid")`, one directory per cluster. A literal cid filter
  * over the loaded lists prunes statically at the scan; the probe JOIN in
  * `search` relies on dynamic partition pruning (the probe side is tiny,
  * so DPP's subquery cost is negligible) — either way, build once and
  * serve query batches across jobs without rescanning the corpus. For a
  * fixed probe set, `loaded.lists.where(col("cid").isin(cids: _*))` pins
  * the static-pruning path explicitly.
  */
case class IvfIndex(centroids: DataFrame, lists: DataFrame) {

  /** NOTE: an index whose `lists` lazily READ a saved layout (e.g. the
    * result of `append` on a loaded index) cannot save over that same
    * path — the write would overwrite its own source (Spark rejects it).
    * Save maintenance cycles to versioned directories (`.../v2`), which
    * is the production pattern regardless: atomic cutover + rollback.
    */
  def save(path: String): Unit = {
    centroids.coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    saveListsOnly(path)
  }

  /** The lists half of [[save]] — shared with
    * [[IvfCosineIndex.buildTo]], which writes the centroids itself.
    */
  private[similarity] def saveListsOnly(path: String): Unit = {
    // cluster the write on cid first: without it every task holds rows of
    // every cid and partitionBy fans each task out into every directory
    // (tasks × cids small files — and as many open writers per task);
    // repartitioned, each task writes whole cid directories, giving the
    // one-file-per-inverted-list layout a probe actually wants to scan
    lists.repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$path/lists")
    // a zero-row frame + partitionBy writes no schema-bearing files (only
    // _SUCCESS), leaving a layout load cannot infer a schema from; fall
    // back to a schema-only unpartitioned write so even a (degenerate)
    // empty index round-trips with an actionable downstream error instead
    // of UNABLE_TO_INFER_SCHEMA. Hadoop FS API, not java.io — the path is
    // remote in production.
    val listsPath = new org.apache.hadoop.fs.Path(s"$path/lists")
    val fs = listsPath.getFileSystem(
      lists.sparkSession.sparkContext.hadoopConfiguration)
    val hasPartitions = fs.exists(listsPath) &&
      fs.listStatus(listsPath).exists(_.getPath.getName.startsWith("cid="))
    if (!hasPartitions)
      lists.limit(0).write.mode("overwrite").parquet(s"$path/lists")
  }
}

object IvfIndex {

  /** Reopen a [[save]]d index. `cid` comes back as a partition column —
    * re-cast to long so joins against probe frames stay equi-joins
    * without runtime coercion surprises.
    */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex =
    IvfIndex(
      spark.read.parquet(s"$path/centroids"),
      spark.read.parquet(s"$path/lists")
        .withColumn("cid", col("cid").cast("long")))
}
