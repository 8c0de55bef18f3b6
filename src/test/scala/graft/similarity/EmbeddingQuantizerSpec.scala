package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class EmbeddingQuantizerSpec extends SparkTestBase {
  import spark.implicits._

  lazy val vecs = Seq(
    (1L, Seq(3.0, 4.0)),            // norm 5 -> u = (0.6, 0.8)
    (2L, Seq(-1.0, 0.0, 2.0)),
    (3L, Seq(0.0, 0.0)))            // zero vector
    .toDF("vec_id", "embedding")

  lazy val out = new EmbeddingQuantizer().transform(vecs)
    .select($"vec_id", $"scale", $"q")
    .as[(Long, Option[Double], Seq[Int])].collect()
    .map(r => r._1 -> (r._2, r._3)).toMap

  test("quantization follows scale = 127/max|u|, q = round(u*scale)") {
    val (scale1, q1) = out(1L)
    assert(math.abs(scale1.get - 127.0 / 0.8) < 1e-9)
    assert(q1 === Seq(math.round(0.6 * 127.0 / 0.8).toInt, 127))
  }

  test("dequantized components reconstruct within 0.5/scale") {
    val (scale2, q2) = out(2L)
    val n = math.sqrt(1.0 + 4.0)
    val u = Seq(-1.0 / n, 0.0, 2.0 / n)
    q2.zip(u).foreach { case (q, x) =>
      assert(math.abs(q / scale2.get - x) <= 0.5 / scale2.get + 1e-12)
    }
  }

  test("zero vectors pass through as zeros with null scale") {
    val (scale3, q3) = out(3L)
    assert(scale3.isEmpty)
    assert(q3 === Seq(0, 0))
  }

  test("transform is shuffle-free") {
    val plan = new EmbeddingQuantizer().transform(vecs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
