package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss signed random projection for embedding
  * compression: `y_j = (Σ_k sign(j,k) · v_k) / √outDim` with a
  * deterministic ±1 matrix derived from the engine's md5 coin —
  * `sign(j,k) = +1 iff uniform32(salt, "j:k") < 2^31` (Achlioptas 2003:
  * ±1 entries satisfy the JL distance-preservation bound; no Gaussian
  * sampling needed). The matrix is pseudo-random but data-independent and
  * reproduced bit-identically on every executor, in this class's local
  * [[signs]], and by the SQL oracle (q106) — no fit step, no driver
  * state, nothing to persist.
  *
  * Scale: the matrix is `outDim × inDim` literal sign rows baked into the
  * plan (16×64 here), so projecting a 100 TB embedding column is a pure
  * row-local map — no shuffle, no join, no broadcast beyond the literals.
  * Use it in front of [[CosineTopK]] / [[IvfCosineIndex]] to cut the
  * per-vector arithmetic and index footprint.
  *
  * What compression preserves (ProjectedRecallSpec pins both sides):
  * DISTANCES and cluster structure — projected top-k answers stay in the
  * query's cluster with measured purity 1.0 on separated corpora. What it
  * does NOT preserve: exact top-k IDENTITY when neighbors are weakly
  * separated (gap ≪ the ~1/√outDim distortion) — measured recall@10 of
  * 0.16/0.23/0.29 at outDim 16/32/48 on the barely-clustered test
  * embeddings. Compress when downstream consumes neighborhoods (dedup,
  * clustering, candidate generation with exact re-rank on the original
  * vectors); keep full dimension when exact ranking is the product.
  */
class RandomProjection(val inDim: Int, val outDim: Int, val salt: String = "rp") {
  require(inDim > 0 && outDim > 0, s"dims ($inDim, $outDim) must be positive")
  require(outDim <= inDim, s"outDim ($outDim) must not exceed inDim ($inDim)")

  /** The deterministic sign matrix, derived locally by the same md5
    * formula as [[graft.sql.functions.uniform32]] (first 8 hex chars of
    * `md5("salt:j:k")` as an unsigned 32-bit value) — a spec pins the
    * parity against the SQL expression.
    */
  lazy val signs: Array[Array[Double]] = Array.tabulate(outDim, inDim) { (j, k) =>
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt:$j:$k".getBytes("UTF-8"))
    val u = java.lang.Long.parseLong(md.take(4).map(b => f"$b%02x").mkString, 16)
    if (u < 2147483648L) 1.0 else -1.0
  }

  /** Projects an `array<float|double>` column of length `inDim` to an
    * `array<double>` of length `outDim`. Each output dim is one
    * zip_with/aggregate dot product against a literal sign row.
    */
  def project(vec: Column): Column = {
    val v = vec.cast("array<double>")
    val root = math.sqrt(outDim.toDouble)
    array((0 until outDim).map { j =>
      aggregate(
        zip_with(v, lit(signs(j)), (x, s) => x * s),
        lit(0.0d), (acc, x) => acc + x) / root
    }: _*)
  }
}
