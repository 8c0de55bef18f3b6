package graft.graph

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase
import graft.dedup.DedupClusters

class StarContractionSpec extends SparkTestBase {
  import spark.implicits._

  private def run(nodeIds: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    StarContraction.components(
      nodeIds.toDF("doc_id"), edges.toDF("id_a", "id_b"), "doc_id")
      .as[(Long, Long)].collect().toMap

  private def expected(nodeIds: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    // reference union-find on the driver (test-only)
    val parent = scala.collection.mutable.Map(nodeIds.map(n => n -> n): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra max rb) = ra min rb
    }
    nodeIds.map(n => n -> find(n)).toMap
  }

  test("deep chain: O(log n) rounds where label propagation would need O(n) hops") {
    val n = 300L
    val ids = (0L until n)
    val chain = (0L until n - 1).map(i => (i, i + 1))
    // default maxRounds = 25 << 300: only logarithmic convergence passes
    assert(run(ids, chain) === ids.map(_ -> 0L).toMap)
  }

  test("matches union-find and DedupClusters on a mixed graph") {
    val ids = (0L to 30L)
    // two cliques, a chain bridging into one of them, isolated nodes, and
    // reversed/duplicate/self edges the canonicalization must absorb
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L), (12L, 10L), (10L, 10L),
      (3L, 4L), (5L, 4L), (5L, 6L),
      (20L, 21L), (22L, 21L))
    val got = run(ids, edges)
    val want = expected(ids, edges)
    assert(got === want)
    val viaLabels = DedupClusters.components(
      ids.toDF("doc_id"), edges.toDF("id_a", "id_b"), "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(got === viaLabels)
  }

  test("isolated nodes are their own cluster; empty edge set is a no-op") {
    val got = run(Seq(7L, 8L, 9L), Seq.empty)
    assert(got === Map(7L -> 7L, 8L -> 8L, 9L -> 9L))
  }

  test("star fixpoint is reached immediately on already-star input") {
    val got = run(Seq(1L, 2L, 3L, 4L), Seq((2L, 1L), (3L, 1L), (4L, 1L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }
}
