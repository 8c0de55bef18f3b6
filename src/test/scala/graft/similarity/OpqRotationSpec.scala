package graft.similarity

import graft.SparkTestBase

/** OPQ rotation properties: orthogonality of the learned R, quantization
  * error no worse than un-rotated PQ, and a clear win on data whose
  * correlation structure is deliberately misaligned with the subspace
  * split — the case OPQ exists for (Ge et al. CVPR 2013 §1: PQ's
  * independence assumption fails on correlated subspaces).
  */
class OpqRotationSpec extends SparkTestBase {
  import spark.implicits._

  private val d = 8

  /** Deterministic correlated fixture: latent z ∈ R² expanded through a
    * fixed non-axis-aligned map into R⁸ (every output coordinate mixes
    * both latents), plus a small deterministic residue. A coordinate
    * split into two 4-dim halves leaves both halves carrying BOTH
    * latents — exactly what a learned rotation can undo.
    */
  private lazy val correlated = {
    def h(i: Long, s: Int): Double =
      (((i * 2654435761L + s * 40503L) % 1000) / 1000.0) - 0.5
    (0L until 300L).map { i =>
      val z0 = h(i, 1) * 4
      val z1 = h(i, 2) * 4
      val vec = (0 until d).map { j =>
        val a = math.cos(0.7 * (j + 1))
        val b = math.sin(0.9 * (j + 2))
        a * z0 + b * z1 + 0.05 * h(i, 3 + j)
      }
      (i, vec)
    }.toDF("vec_id", "embedding")
  }

  private def opq(iters: Int) =
    new OpqRotation(numSubspaces = 2, codebookSize = 8, dim = d,
      iters = iters, lloydSteps = 2)

  test("learned rotation is orthogonal (RᵀR = I)") {
    val model = opq(2).fit(correlated)
    val r = model.rotation
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(k => r(k)(i) * r(k)(j)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"RtR($i,$j) = $dot")
    }
  }

  test("rotation beats identity on correlated data; more iterations never hurt") {
    val o = opq(1)
    val idModel = OpqRotation.Model(o.eye, {
      val rotated = o.rotate(
        graft.sql.functions.spread(
          correlated.select($"vec_id", $"embedding"), $"vec_id"), o.eye)
      new ProductQuantizer(2, 8, d).fitKMeans(rotated, 2)
    })
    val mse0 = o.mse(correlated, idModel)
    val m1 = opq(1).fit(correlated)
    val mse1 = opq(1).mse(correlated, m1)
    val m3 = opq(3).fit(correlated)
    val mse3 = opq(3).mse(correlated, m3)
    info(f"OPQ mse: identity $mse0%.5f, 1 iter $mse1%.5f, 3 iters $mse3%.5f")
    assert(mse1 <= mse0 + 1e-9, f"1-iter OPQ worse than identity: $mse1%.5f vs $mse0%.5f")
    assert(mse3 <= mse1 + 1e-9, f"3-iter OPQ worse than 1-iter: $mse3%.5f vs $mse1%.5f")
    assert(mse3 < mse0 * 0.9,
      f"rotation should clearly beat identity on correlated data: $mse3%.5f vs $mse0%.5f")
  }

  test("rotate is length-preserving (orthogonality seen from the data side)") {
    val model = opq(2).fit(correlated)
    val norms = correlated
      .select($"vec_id", graft.sql.functions.squaredL2(
        $"embedding", org.apache.spark.sql.functions.expr(
          s"array_repeat(0.0D, $d)")).as("n0"))
    val rotNorms = opq(2).rotate(correlated, model.rotation)
      .select($"vec_id", graft.sql.functions.squaredL2(
        $"embedding", org.apache.spark.sql.functions.expr(
          s"array_repeat(0.0D, $d)")).as("n1"))
    val drift = norms.join(rotNorms, "vec_id")
      .select(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.abs($"n0" - $"n1")))
      .head().getDouble(0)
    assert(drift < 1e-9, s"rotation changed vector norms by $drift")
  }
}
