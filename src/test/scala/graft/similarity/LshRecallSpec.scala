package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Recall@k of the banded-LSH top-k search vs the exact scan — the same
  * contract [[IvfRecallSpec]] and [[PqRecallSpec]] pin for the other two
  * approximate indexes. LSH's knob is the band layout: splitting the same
  * hyperplane bits into MORE bands of FEWER rows raises per-band collision
  * probability (p^r per band, 1-(1-p^r)^bands overall), trading candidate
  * volume for recall. Floors sit below the measured values (SURVEY §8) so
  * the spec catches structural regressions — a broken signature kernel,
  * band split, or candidate join all crater recall — without flaking on
  * the deterministic-but-data-shaped exact numbers.
  */
class LshRecallSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val vecs =
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select($"vec_id", $"embedding")
  private lazy val queries = vecs.where($"vec_id" < 50)

  private lazy val exact10: Map[Long, Set[Long]] =
    new CosineTopK(10).search(queries, vecs)
      .select($"query_id".cast("long"), $"vec_id".cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private def recallAt10(numPlanes: Int, numBands: Int): Double = {
    val got = new RandomHyperplaneLSH(numPlanes, numBands)
      .searchTopK(queries, vecs, 10)
      .select($"query_id".cast("long"), $"vec_id".cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val per = exact10.map { case (q, want) =>
      got.getOrElse(q, Set.empty).count(want) / want.size.toDouble
    }
    per.sum / per.size
  }

  test("recall@10 vs exact top-k clears documented floors as bands widen") {
    val table = Seq(
      (64, 8, 0.15), // measured 0.206: 8-row bands collide only for the closest
      (64, 16, 0.70), // measured 0.778
      (64, 32, 0.95) // measured 0.992: 2-row bands, candidate-heavy
    ).map { case (p, b, floor) =>
      val r = recallAt10(p, b)
      info(f"numPlanes=$p%2d numBands=$b%2d recall@10=$r%.3f (floor $floor)")
      assert(r >= floor,
        f"recall@10 $r%.3f below floor $floor at numPlanes=$p numBands=$b")
      (b, r)
    }.toMap
    // finer bands (more, shorter) never lose recall on this fixture
    assert(table(16) >= table(8))
    assert(table(32) >= table(16))
  }
}
