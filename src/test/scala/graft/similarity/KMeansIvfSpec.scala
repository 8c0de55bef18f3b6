package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The KMeans -> IVF integration: an index listed under multi-step-Lloyd
  * centroids via `buildWith` must (a) keep the search mechanics intact
  * and (b) beat the internal 1-step quantizer's recall when the data has
  * real cluster structure that lowest-id seeding starts blind to.
  *
  * The fixture is adversarial for lowest-id seeding ON PURPOSE: 8 tight,
  * well-separated clusters with ids laid out so the 8 lowest ids all sit
  * in cluster 0 — the internal quantizer's seeds start degenerate, while
  * k-means iterations can migrate centroids out.
  */
class KMeansIvfSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 16
  // cluster c centered at 10 * e_{2c} (orthogonal ⇒ cosine between
  // clusters ~0, within clusters ~1): 40 members each, deterministic
  // per-member jitter
  private lazy val vecs = (0 until 8).flatMap { c =>
    (0 until 40).map { i =>
      val id = (c * 40 + i).toLong
      val v = Array.tabulate(dim) { d =>
        val base = if (d == 2 * c) 10.0 else 0.0
        base + 0.1 * (((id * 131 + d * 7) % 17) / 17.0 - 0.5)
      }
      (id, v)
    }
  }.toDF("vec_id", "embedding")

  private lazy val queries = vecs.where($"vec_id" % 40 === 3) // one per cluster

  private lazy val exact10: Map[Long, Set[Long]] =
    new CosineTopK(10).search(queries, vecs)
      .select($"query_id".cast("long"), $"vec_id".cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private def recall(idx: IvfIndex, ivf: IvfCosineIndex): Double = {
    val got = ivf.search(queries, idx, 10)
      .select($"query_id".cast("long"), $"vec_id".cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val per = exact10.map { case (q, want) =>
      got.getOrElse(q, Set.empty).count(want) / want.size.toDouble
    }
    per.sum / per.size
  }

  private def cellSizes(idx: IvfIndex): Seq[Long] =
    idx.lists.groupBy($"cid").count()
      .select($"count").as[Long].collect().toSeq.sorted

  test("farthest-point-seeded centroids balance the inverted lists; lowest-id seeding cannot") {
    // recall survives either way on this fixture (even blended centroids
    // route each whole cluster to one cell), but probe COST does not:
    // skewed cells are the thing a better quantizer buys down at scale.
    // Lloyd alone does NOT fix degenerate seeds — measured here, 5 steps
    // from the all-in-cluster-0 lowest-id seeds still converge to a local
    // optimum with a doubled-up 80-member cell — seeding is the lever.
    val ivf = new IvfCosineIndex(numCentroids = 8, nprobe = 1, dim = Some(dim))
    val km = new KMeans(k = 8, iters = 5, dim = dim)
    val trainedIdx = ivf.buildWith(vecs, km.fitFarthest(vecs))
    val internalSizes = cellSizes(ivf.build(vecs))
    val lloydOnlySizes = cellSizes(ivf.buildWith(vecs, km.fit(vecs)))
    val trainedSizes = cellSizes(trainedIdx)
    info(s"cell sizes — internal 1-step: $internalSizes, " +
      s"lowest-id 5-step: $lloydOnlySizes, farthest 5-step: $trainedSizes")
    // k-center seeds land one per planted cluster, Lloyd keeps them there:
    // every cluster owns exactly its own cell
    assert(trainedSizes === Seq.fill(8)(40L))
    // both lowest-id variants leave a cell holding 2+ planted clusters
    assert(internalSizes.max > 40L)
    assert(lloydOnlySizes.max > 40L)
    // and the balanced index still answers exactly at nprobe=1 here
    assert(recall(trainedIdx, ivf) >= 0.99)
  }

  test("buildWith keeps the search contract: probing every cell is exact") {
    val ivf = new IvfCosineIndex(numCentroids = 8, nprobe = 8, dim = Some(dim))
    val km = new KMeans(k = 8, iters = 3, dim = dim)
    assert(recall(ivf.buildWith(vecs, km.fit(vecs)), ivf) === 1.0)
  }
}
