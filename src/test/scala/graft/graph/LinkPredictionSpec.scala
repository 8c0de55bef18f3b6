package graft.graph

import graft.SparkTestBase

/** Hand graphs (path, square, triangle), a brute-force reference on a
  * random graph, and degenerate inputs.
  */
class LinkPredictionSpec extends SparkTestBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)])
      : Map[(Long, Long), (Long, Double, Double)] =
    LinkPrediction.scores(edges.toDF("src", "dst"))
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap

  /** Brute force over all non-adjacent pairs. */
  private def ref(edges: Seq[(Long, Long)])
      : Map[(Long, Long), (Long, Double, Double)] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (e._1 min e._2, e._1 max e._2)).distinct
    val adj = und.flatMap(e => Seq(e, e.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keys.toSeq.sorted
    (for {
      a <- nodes; b <- nodes if a < b && !adj(a).contains(b)
      common = adj(a).intersect(adj(b)) if common.nonEmpty
    } yield (a, b) -> ((common.size.toLong,
      common.toSeq.map(wn => 1.0 / adj(wn).size).sum,
      common.size.toDouble / (adj(a).size + adj(b).size - common.size)))).toMap
  }

  test("path 1-2-3: endpoints predicted via the middle node") {
    val got = run(Seq((1L, 2L), (2L, 3L)))
    assert(got.keySet === Set((1L, 3L)))
    val (cn, ra, j) = got((1L, 3L))
    assert(cn === 1L)
    assert(ra === 0.5) // deg(2) = 2
    assert(j === 1.0) // N(1) = N(3) = {2}
  }

  test("square 1-2-3-4: both diagonals, two common neighbors each") {
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(got.keySet === Set((1L, 3L), (2L, 4L)))
    assert(got((1L, 3L)) === ((2L, 1.0, 1.0)))
  }

  test("triangle: every pair adjacent, nothing to predict") {
    assert(run(Seq((1L, 2L), (2L, 3L), (1L, 3L))).isEmpty)
  }

  test("matches brute force on a random graph") {
    val rnd = new scala.util.Random(23)
    val edges = (1 to 80).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter(e => e._1 != e._2)
    val got = run(edges)
    val want = ref(edges)
    assert(got.keySet === want.keySet)
    for ((k, (cn, ra, j)) <- want) {
      assert(got(k)._1 === cn, s"cn $k")
      assert(math.abs(got(k)._2 - ra) < 1e-12, s"ra $k")
      assert(math.abs(got(k)._3 - j) < 1e-12, s"jaccard $k")
    }
  }

  test("self-loops and duplicate edges collapse; empty input is clean") {
    val got = run(Seq((1L, 2L), (2L, 1L), (2L, 2L), (2L, 3L)))
    assert(got === run(Seq((1L, 2L), (2L, 3L))))
    assert(run(Seq.empty).isEmpty)
  }
}
