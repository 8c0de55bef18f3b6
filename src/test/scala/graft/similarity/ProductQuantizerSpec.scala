package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ProductQuantizerSpec extends SparkTestBase {
  import spark.implicits._

  // 4-dim vectors, 2 subspaces of 2 dims, 2 codes per subspace. Each
  // subspace has two tight value clusters; ids 1-2 (the seeds) sit one in
  // each cluster of each subspace so the codebook spans both.
  lazy val vecs = Seq(
    (1L, Array(0.0, 0.0, 9.0, 9.0)),
    (2L, Array(9.0, 9.0, 0.0, 0.0)),
    (3L, Array(0.1, 0.1, 9.1, 9.1)), // near 1 in both subspaces
    (4L, Array(9.1, 9.1, 0.1, 0.1)), // near 2 in both subspaces
    (5L, Array(0.2, 0.1, 0.2, 0.1))) // low cluster in BOTH subspaces
    .toDF("vec_id", "embedding")

  lazy val pq = new ProductQuantizer(numSubspaces = 2, codebookSize = 2, dim = 4)

  test("codebook has one centroid per (subspace, code), codes dense from 0") {
    val cb = pq.fit(vecs)
    assert(cb.count() === 4)
    assert(cb.select("sub").distinct().count() === 2)
    assert(cb.select("code").as[Long].collect().toSet === Set(0L, 1L))
  }

  test("empty-cluster guard: duplicate seed vectors keep codes dense 0..k-1") {
    // ids 1 and 2 are EXACT duplicates -> in every subspace both seed
    // slices are identical, every member ties to the LOWER code, and
    // code 1 wins zero members. Without the coalesce-to-seed guard the
    // (sub, code=1) rows vanish from fit's groupBy, silently shrinking
    // forCodebook's countDistinct-derived k.
    val dup = Seq(
      (1L, Array(0.0, 0.0, 9.0, 9.0)),
      (2L, Array(0.0, 0.0, 9.0, 9.0)), // exact dup of seed 1
      (3L, Array(5.0, 5.0, 5.0, 5.0)),
      (4L, Array(1.0, 1.0, 8.0, 8.0))).toDF("vec_id", "embedding")
    val cb = pq.fit(dup)
    assert(cb.count() === 4, "one centroid per (sub, code) even with empty clusters")
    assert(cb.select("code").as[Long].collect().toSet === Set(0L, 1L))
    // the starved code keeps its seed slice (ids 1/2's identical slice)
    val kept = cb.where($"sub" === 0 && $"code" === 1)
      .select($"centroid").as[Seq[Double]].head()
    assert(kept === Seq(0.0, 0.0))
  }

  test("encode groups cluster members onto the same code, one row per (vec, sub)") {
    val codes = pq.encode(vecs, pq.fit(vecs))
      .as[(Long, Int, Long)].collect()
      .map { case (id, sub, code) => (id, sub) -> code }.toMap
    assert(codes.size === 10)
    // 3 follows 1, 4 follows 2, in both subspaces
    assert(codes((3L, 0)) === codes((1L, 0)))
    assert(codes((3L, 1)) === codes((1L, 1)))
    assert(codes((4L, 0)) === codes((2L, 0)))
    assert(codes((4L, 1)) === codes((2L, 1)))
    // 5 mixes: low in sub 0 (like 1) and low in sub 1 (like 2) — the
    // product structure PQ exists for
    assert(codes((5L, 0)) === codes((1L, 0)))
    assert(codes((5L, 1)) === codes((2L, 1)))
  }

  test("encode is partitioning-invariant") {
    val cb = pq.fit(vecs)
    val a = pq.encode(vecs, cb).collect().toSet
    val b = pq.encode(vecs.repartition(7), cb).collect().toSet
    assert(a === b)
  }

  test("ADC search ranks the true near-copy first without touching raw vectors") {
    val cb = pq.fit(vecs)
    val codes = pq.encode(vecs, cb)
    val got = new ProductQuantizer(2, 2, 4)
      .adcSearch(vecs.where($"vec_id" === 1), codes, cb, k = 2)
      .orderBy("rank")
      .select("vec_id", "adc").as[(Long, Double)].collect()
    assert(got.head._1 === 3L, got.mkString(","))
    assert(got.head._2 <= got(1)._2)
  }

  test("adcSearchIn only scores the given candidate pairs (IVF-PQ pruning)") {
    val cb = pq.fit(vecs)
    val codes = pq.encode(vecs, cb)
    // candidate set deliberately omits the true near-copy (3)
    val cands = Seq((1L, 4L), (1L, 5L)).toDF("query_id", "vec_id")
    val got = pq.adcSearchIn(vecs.where($"vec_id" === 1), cands, codes, cb, k = 5)
      .select("vec_id").as[Long].collect().toSet
    assert(got === Set(4L, 5L))
  }

  test("native squared_l2 kernel is bit-identical to the HOF fold") {
    val pairs = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 6.0, 8.0)),
      (Array(0.1, -0.2), Array(0.3, 0.05)),
      (Array.empty[Double], Array.empty[Double]))
      .toDF("a", "b")
    val got = pairs.select(
      graft.sql.functions.squaredL2($"a", $"b").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0.0d, (acc, v) -> acc + v)")
        .as("hof"))
      .as[(Double, Double)].collect()
    got.foreach { case (n, h) => assert(n === h) } // exact, not approximate
    // length mismatch and null input -> null
    val bad = Seq((Array(1.0), Array(1.0, 2.0))).toDF("a", "b")
      .select(graft.sql.functions.squaredL2($"a", $"b"))
    assert(bad.collect().head.isNullAt(0))
  }

  test("ADC distances are nonnegative and self-row is excluded") {
    val cb = pq.fit(vecs)
    val codes = pq.encode(vecs, cb)
    val out = pq.adcSearch(vecs.where($"vec_id" <= 2), codes, cb, k = 4)
    assert(out.where($"query_id" === $"vec_id").count() === 0)
    assert(out.where($"adc" < 0).count() === 0)
  }
}
