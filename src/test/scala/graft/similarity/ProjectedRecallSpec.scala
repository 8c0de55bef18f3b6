package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Recall@k of brute-force search over JL-PROJECTED vectors against the
  * exact 64-dim scan — the number a user compressing embeddings with
  * [[RandomProjection]] needs before trading arithmetic for accuracy.
  *
  * The two fixtures pin the two sides of the JL story:
  *
  *  - JL preserves DISTANCES (±1/√outDim-ish distortion), not top-k
  *    identity. On the sf0.01 embeddings the true neighbors are barely
  *    separated from the rest (max pairwise cosine ≈ 0.51, top-10 gap ≪
  *    the k=16 distortion), so recall is LOW — measured 0.156 / 0.232 /
  *    0.294 at outDim 16/32/48. The floors guard structure (a broken sign
  *    matrix craters these further), and the docs tell users projection
  *    is NOT for weakly-separated corpora.
  *  - On a corpus with real cluster structure (what embedding spaces that
  *    are worth ANN-serving look like), the separation dwarfs the
  *    distortion: exact top-10 identity still reshuffles among the
  *    near-equidistant cluster mates (≈ 0.6), but the projected answers
  *    stay in the right cluster with measured purity 1.000 — the
  *    property dedup/retrieval actually needs from compression.
  */
class ProjectedRecallSpec extends SparkTestBase {
  import spark.implicits._

  private def top10(q: DataFrame, c: DataFrame): Map[Long, Set[Long]] =
    new CosineTopK(10).search(q, c)
      .select($"query_id".cast("long"), $"vec_id".cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private def recallAt10(base: DataFrame, queries: DataFrame, outDim: Int): Double = {
    val exact = top10(queries, base)
    val rp = new RandomProjection(inDim = 64, outDim = outDim)
    def proj(df: DataFrame): DataFrame =
      df.select($"vec_id", rp.project($"embedding").as("embedding"))
    val got = top10(proj(queries), proj(base))
    val per = exact.map { case (q, want) =>
      got.getOrElse(q, Set.empty).count(want) / want.size.toDouble
    }
    per.sum / per.size
  }

  test("weakly-separated corpus: recall floors hold and grow with outDim") {
    val vecs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val queries = vecs.where($"vec_id" < 50)
    val measured = Seq(16, 32, 48).map { d =>
      val r = recallAt10(vecs, queries, d)
      info(f"outDim=$d%2d recall@10=$r%.3f")
      d -> r
    }.toMap
    // structural floors, below the measured 0.156/0.232/0.294
    assert(measured(16) >= 0.10, f"recall ${measured(16)}%.3f at outDim=16")
    assert(measured(32) >= 0.15, f"recall ${measured(32)}%.3f at outDim=32")
    assert(measured(48) >= 0.20, f"recall ${measured(48)}%.3f at outDim=48")
    assert(measured(48) >= measured(16),
      s"more dims should not hurt recall: $measured")
  }

  test("cluster-separated corpus: outDim=16 keeps the projected top-10 in-cluster") {
    // within a 25-point cluster the mates are near-equidistant, so exact
    // top-10 IDENTITY reshuffles under any distortion (measured ≈ 0.6) —
    // the quantity compression must preserve is cluster membership of the
    // answers, and that stays essentially perfect: the cross-cluster gap
    // (cosine ≈ 0 between clusters vs ≈ 0.95 within) dwarfs the k=16
    // distortion
    val rnd = new scala.util.Random(23)
    val centers = Array.fill(20)(Array.fill(64)(rnd.nextGaussian()))
    val vecs = (0 until 500).map { i =>
      val c = centers(i % 20)
      i.toLong -> c.map(_ + 0.15 * rnd.nextGaussian())
    }.toDF("vec_id", "embedding")
    val queries = vecs.where($"vec_id" < 20) // one per cluster
    val rp = new RandomProjection(inDim = 64, outDim = 16)
    def proj(df: DataFrame): DataFrame =
      df.select($"vec_id", rp.project($"embedding").as("embedding"))
    val got = top10(proj(queries), proj(vecs))
    val purities = got.map { case (q, ids) =>
      ids.count(id => id % 20 == q % 20) / ids.size.toDouble
    }
    val purity = purities.sum / purities.size
    info(f"planted clusters: outDim=16 top-10 cluster purity=$purity%.3f")
    assert(purity >= 0.95, f"cluster purity $purity%.3f under projection")
  }
}
