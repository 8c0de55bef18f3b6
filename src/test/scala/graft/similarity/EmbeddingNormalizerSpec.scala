package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Mean-centering + L2 normalization semantics, and the single-evaluation
  * plan contract (the centering zip_with must not be re-inlined into each
  * of its three consumers).
  */
class EmbeddingNormalizerSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Seq(1.0, 0.0)),
    (2L, Seq(3.0, 4.0)),
    (3L, Seq(2.0, 2.0))).toDF("id", "embedding")

  test("centers on the corpus mean and L2-normalizes") {
    val out = new EmbeddingNormalizer().transform(df)
      .select($"id", $"embedding_norm").as[(Long, Seq[Double])]
      .collect().toMap
    // mean = (2, 2); centered: (-1,-2), (1,2), (0,0)
    val n1 = math.sqrt(5.0)
    assert(out(1L).zip(Seq(-1 / n1, -2 / n1)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(out(2L).zip(Seq(1 / n1, 2 / n1)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // the mean vector itself centers to zero and must stay zero, not NaN
    assert(out(3L) === Seq(0.0, 0.0))
  }

  test("non-zero outputs are unit vectors") {
    val norms = new EmbeddingNormalizer().transform(df)
      .select(sqrt(aggregate($"embedding_norm", lit(0.0), (a, v) => a + v * v)).as("n"))
      .as[Double].collect()
    assert(norms.forall(n => n == 0.0 || math.abs(n - 1.0) < 1e-12))
  }

  test("the centering zip_with is evaluated once per row in the optimized plan") {
    val plan = new EmbeddingNormalizer().transform(df)
      .queryExecution.optimizedPlan.toString
    val hits = "zip_with".r.findAllIn(plan).size
    assert(hits === 1, s"expected 1 zip_with, found $hits:\n$plan")
  }
}
