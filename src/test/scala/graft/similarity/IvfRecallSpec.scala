package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the one number a user of an approximate index needs: recall@k of
  * IVF search against the exact scan. Correctness specs (and the q35 hash)
  * prove the MECHANICS — assignment, probing, ranking — but say nothing
  * about how much of the true top-k a pruned probe keeps. Measured on the
  * sf0.01 embeddings (500 × 64-dim, label-clustered), 50 queries, k=10.
  *
  * Floors are deliberately below the measured values (see table in
  * SURVEY §8) so the spec catches structural regressions — a broken
  * Lloyd step, probe ranking, or list assignment all crater recall —
  * without flaking on the deterministic-but-data-shaped exact numbers.
  */
class IvfRecallSpec extends SparkTestBase {
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

  private def recallAt10(numCentroids: Int, nprobe: Int): Double = {
    val ivf = new IvfCosineIndex(numCentroids, nprobe, dim = Some(64))
    val got = ivf.search(queries, vecs, 10)
      .select($"query_id".cast("long"), $"vec_id".cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val per = exact10.map { case (q, want) =>
      got.getOrElse(q, Set.empty).count(want) / want.size.toDouble
    }
    per.sum / per.size
  }

  test("recall@10 vs exact top-k clears documented floors as nprobe grows") {
    // measured on this fixture: (16,4)=0.662 (16,8)=0.836 (32,8)=0.784
    // (32,16)=0.906 (16,16)=1.000 — these embeddings are only weakly
    // clustered, so recall tracks the probed fraction (a quarter of the
    // cells keeps ~two-thirds of the true top-10, half keeps ~0.8-0.9).
    // On genuinely clustered corpora the locality gain is what IVF banks
    // on; raise numCentroids / Lloyd steps there, not nprobe.
    val table = Seq(
      (16, 4, 0.60), // quarter of the cells
      (16, 8, 0.78), // half
      (32, 8, 0.72), // finer cells, same quarter fraction
      (32, 16, 0.85), // finer cells, half
      (16, 16, 0.999) // probing everything IS the exact scan
    ).map { case (c, p, floor) =>
      val r = recallAt10(c, p)
      info(f"numCentroids=$c%2d nprobe=$p%2d recall@10=$r%.3f (floor $floor)")
      assert(r >= floor,
        f"recall@10 $r%.3f below floor $floor at numCentroids=$c nprobe=$p")
      (c, p, r)
    }
    // more probes never hurt recall (same quantizer, strictly more cells)
    val r4 = table.find(t => t._1 == 16 && t._2 == 4).get._3
    val r8 = table.find(t => t._1 == 16 && t._2 == 8).get._3
    assert(r8 >= r4)
  }
}
