package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SemanticDedupSpec extends SparkTestBase {
  import spark.implicits._

  // two tight clusters on orthogonal axes plus an isolated point; 1/2/3
  // are mutual near-dups (cos > 0.99), 10/11 likewise, 20 is alone
  private def vec(axis: Int, eps: Double): Array[Double] = {
    val v = Array.fill(4)(eps)
    v(axis) = 1.0
    v
  }

  // ids 1..3 are the quantizer seeds (lowest ids) — one per cluster by
  // construction, so cells form around the true clusters
  lazy val vecs = Seq(
    (1L, vec(0, 0.00)), (4L, vec(0, 0.01)), (5L, vec(0, 0.02)),
    (2L, vec(1, 0.00)), (6L, vec(1, 0.01)),
    (3L, vec(2, 0.40))) // cos ~0.34 to everything else: stays alone
    .toDF("vec_id", "embedding")

  lazy val dedup = new SemanticDeduplicator(numCells = 3, threshold = 0.99, dim = Some(4))

  test("keeps exactly one member per duplicate group, all singletons") {
    val v = dedup.verdicts(vecs)
    val kept = v.where($"keep").select("vec_id").as[Long].collect().sorted
    // groups {1,4,5} and {2,6} collapse to one member each; 3 survives
    assert(kept.length === 3)
    assert(kept.contains(3L))
    assert(kept.count(id => Set(1L, 4L, 5L).contains(id)) === 1)
    assert(kept.count(id => Set(2L, 6L).contains(id)) === 1)
  }

  test("keep rule prefers the member farthest from its cell centroid") {
    val v = dedup.verdicts(vecs).where($"keep")
      .select($"vec_id", $"cent_cos").as[(Long, Double)].collect().toMap
    val all = dedup.verdicts(vecs)
      .select($"vec_id", $"cent_cos").as[(Long, Double)].collect().toMap
    // the kept axis-0 member has the group-minimal (cent_cos, id) key
    val keptA = v.keys.find(Set(1L, 4L, 5L).contains).get
    val minKey = Seq(1L, 4L, 5L).map(id => (all(id), id)).min
    assert((all(keptA), keptA) === minKey)
  }

  test("dedup returns the kept input rows with original columns") {
    val out = dedup.dedup(vecs)
    assert(out.columns.toSet === Set("vec_id", "embedding"))
    assert(out.count() === 3)
  }

  test("verdicts are partitioning-invariant") {
    val a = dedup.verdicts(vecs).select("vec_id", "keep").collect().toSet
    val b = dedup.verdicts(vecs.repartition(7)).select("vec_id", "keep")
      .collect().toSet
    assert(a === b)
  }

  test("threshold 1-epsilon only collapses the tightest pairs") {
    // with a very high bar nothing is similar enough — everything kept
    val strict = new SemanticDeduplicator(numCells = 3, threshold = 0.999999, dim = Some(4))
    assert(strict.verdicts(vecs).where($"keep").count() === 6)
  }
}
