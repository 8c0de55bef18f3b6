package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class KMeansSpec extends SparkTestBase {
  import spark.implicits._

  // two tight 2-dim clusters; ids 1-2 (the seeds) start both INSIDE
  // cluster A, so only refinement iterations can pull centroid 1 over to
  // cluster B — the case where 1-step visibly under-fits.
  lazy val vecs = Seq(
    (1L, Array(0.0, 0.0)),
    (2L, Array(1.0, 0.0)),
    (3L, Array(0.1, 0.1)),
    (4L, Array(0.2, 0.0)),
    (5L, Array(9.0, 9.0)),
    (6L, Array(9.1, 9.1)),
    (7L, Array(8.9, 9.2)))
    .toDF("vec_id", "embedding")

  private def inertia(km: KMeans, cents: org.apache.spark.sql.DataFrame): Double =
    km.summary(vecs, cents).agg(sum("inertia")).as[Double].head()

  test("seeds are the k lowest ids with dense 0-based cids") {
    val s = new KMeans(k = 2, iters = 0, dim = 2).seeds(vecs)
      .orderBy("cid").as[(Long, Array[Double])].collect()
    assert(s.map(_._1).toSeq === Seq(0L, 1L))
    assert(s(0)._2.toSeq === Seq(0.0, 0.0)) // id 1's vector
    assert(s(1)._2.toSeq === Seq(1.0, 0.0)) // id 2's vector
  }

  test("total inertia never increases with more Lloyd iterations") {
    val by = (0 to 3).map { i =>
      val km = new KMeans(k = 2, iters = i, dim = 2)
      inertia(km, km.fit(vecs))
    }
    by.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-12) }
    // and on this under-fitted seeding refinement strictly helps
    assert(by(2) < by(0))
  }

  test("converged fit separates the two planted clusters") {
    val km = new KMeans(k = 2, iters = 3, dim = 2)
    val a = km.assign(vecs, km.fit(vecs))
      .select("vec_id", "cid").as[(Long, Long)].collect().toMap
    assert(Set(a(1L), a(3L), a(4L)).size === 1)
    assert(Set(a(5L), a(6L), a(7L)).size === 1)
    assert(a(1L) !== a(5L))
    // both planted clusters contain a seed-adjacent point, so both cids live
    assert(a.values.toSet.size === 2)
  }

  test("a cluster that loses all members keeps its previous centroid") {
    // both seeds identical: every point tie-breaks to cid 0, cluster 1
    // empties on iteration 1 — the guard must keep its centroid (and k
    // stays 2) instead of dropping the cid or averaging zero rows
    val dup = Seq(
      (1L, Array(5.0, 5.0)),
      (2L, Array(5.0, 5.0)),
      (3L, Array(6.0, 5.0)))
      .toDF("vec_id", "embedding")
    val km = new KMeans(k = 2, iters = 1, dim = 2)
    val cents = km.fit(dup).orderBy("cid")
      .as[(Long, Array[Double])].collect()
    assert(cents.length === 2)
    assert(cents(1)._2.toSeq === Seq(5.0, 5.0)) // cid 1 froze at its seed
    assert(cents(0)._2(0) === 16.0 / 3) // cid 0 moved to the member mean
    // with the frozen centroid sitting exactly on the duplicate points,
    // the next assignment legitimately re-captures them — Lloyd with a
    // live (not dropped) empty cluster
    val sizes = km.assign(dup, km.fit(dup))
      .groupBy("cid").count().as[(Long, Long)].collect().toMap
    assert(sizes === Map(0L -> 1L, 1L -> 2L))
  }

  test("fit on an empty corpus fails loudly (estimator contract)") {
    val empty = Seq.empty[(Long, Array[Double])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      new KMeans(k = 2, iters = 1, dim = 2).fit(empty)
    }
    assert(e.getMessage.contains("empty"))
  }

  test("assignment is exhaustive and unique per vector") {
    val km = new KMeans(k = 3, iters = 2, dim = 2)
    val a = km.assign(vecs, km.fit(vecs))
    assert(a.count() === 7)
    assert(a.select("vec_id").distinct().count() === 7)
    assert(a.agg(min("d2")).as[Double].head() >= 0.0)
  }
}
