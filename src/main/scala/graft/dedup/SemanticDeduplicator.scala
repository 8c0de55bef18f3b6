package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.similarity.IvfCosineIndex
import graft.sql.functions.cosineSimilarity

/** Semantic (embedding-space) deduplication, SemDeDup-shaped: cluster the
  * corpus with a coarse quantizer, then prune above-threshold duplicate
  * pairs WITHIN each cell only — never across the whole corpus.
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief);
  * follows Abbas et al., "SemDeDup: Data-efficient learning at web-scale
  * through semantic deduplication" (arXiv:2303.09540). Complements the two
  * existing near-dup paths: [[MinHashDeduplicator]] buckets by lexical
  * shingles, `RandomHyperplaneLSH` by random signs; SemDeDup buckets by
  * LEARNED clusters, so paraphrases that share no tokens and straddle no
  * hyperplane still land in one cell.
  *
  * Keep rule (the paper's): within a duplicate pair, keep the member with
  * the LOWER cosine similarity to its cell centroid — dedup should retain
  * the cell's edge examples, not its redundant core. A row is dropped iff
  * some same-cell partner has pairwise cosine >= threshold and a smaller
  * (centroid_cos, id) keep-key; the minimal-key member of every duplicate
  * group therefore always survives, and the rule needs no connected-
  * components iteration (contrast [[DedupClusters]]) — one self-join,
  * one semi-join.
  *
  * Scale: the quantizer is [[IvfCosineIndex]]'s (broadcast centroids, one
  * streamed assignment pass); candidate pairs come only from the per-cell
  * equi-join on `cid`, so pair work is Σ|cell|² — bounded by numCells
  * sizing (production: more centroids, or recurse on oversized cells),
  * never the corpus-wide n². The drop set is collected nowhere; the final
  * anti-join streams.
  */
class SemanticDeduplicator(
    numCells: Int,
    threshold: Double,
    idCol: String = "vec_id",
    vecCol: String = "embedding",
    dim: Option[Int] = None) {
  require(numCells > 0, "numCells must be positive")
  require(threshold > 0 && threshold <= 1, "threshold in (0, 1]")

  private def keepKey(centCos: Column, id: Column): Column = struct(centCos, id)

  /** Per-row verdict: (idCol, cid, cent_cos, keep). `keep` is false iff a
    * same-cell duplicate with a smaller keep-key exists.
    *
    * `cent_cos` is snapped to a 1e-6 grid before entering the keep-key:
    * the centroid is a float `avg` whose summation order is engine- and
    * partitioning-dependent at the last ulp, and a raw-double keep-key
    * would let that drift flip a keep decision. On the grid, near-ties
    * resolve identically everywhere (exact ties fall through to the id).
    */
  def verdicts(vectors: DataFrame): DataFrame = {
    val idx = new IvfCosineIndex(numCells, nprobe = 1, idCol, vecCol, dim)
      .build(vectors)
    val cells = idx.lists.join(broadcast(idx.centroids), "cid")
      .select(col(idCol), col("cid"), col("cv"),
        round(cosineSimilarity(col("cv"), col("centroid")), 6).as("cent_cos"))

    val challengers = cells.select(col("cid"), col(idCol).as("cand_id"),
      col("cv").as("cand_cv"), col("cent_cos").as("cand_cc"))
    // dropped = rows with a smaller-keep-key duplicate in their cell. The
    // keep-key filter runs BEFORE the cosine kernel so each unordered pair
    // pays one kernel, not two.
    val dropped = cells.join(challengers, "cid")
      .where(keepKey(col("cand_cc"), col("cand_id")) < keepKey(col("cent_cos"), col(idCol)))
      .where(cosineSimilarity(col("cv"), col("cand_cv")) >= threshold)
      .select(col("cid"), col(idCol)).distinct()

    cells.join(dropped.withColumn("__dropped", lit(true)), Seq("cid", idCol), "left_outer")
      .select(col(idCol), col("cid"), col("cent_cos"),
        not(coalesce(col("__dropped"), lit(false))).as("keep"))
  }

  /** The deduplicated corpus: input rows whose verdict is keep. */
  def dedup(vectors: DataFrame): DataFrame =
    vectors.join(verdicts(vectors).where(col("keep")).select(col(idCol)), idCol)
}
