package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  /** In-memory reference: same fixed-iteration, leak-accepting contract. */
  private def ref(edges: Seq[(Long, Long)], iters: Int, d: Double): Map[Long, Double] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val out = e.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => rank(s) / out(s) }.sum).toMap
      rank = nodes.map(v => v -> ((1 - d) / n + d * in.getOrElse(v, 0.0))).toMap
    }
    rank
  }

  private val cyclic = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))

  test("matches the in-memory reference on a small cyclic graph") {
    val got = new PageRank(iterations = 3).run(cyclic.toDF("src", "dst"))
      .as[(Long, Double)].collect().toMap
    val want = ref(cyclic, 3, 0.85)
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, s"node $k") }
  }

  test("no-out-edge node absorbs rank (documented leak policy)") {
    val dangling = cyclic :+ (3L, 4L) // node 4 has no out-edges
    val got = new PageRank(iterations = 3).run(dangling.toDF("src", "dst"))
      .as[(Long, Double)].collect().toMap
    val want = ref(dangling, 3, 0.85)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, s"node $k") }
    assert(got.values.sum < 1.0 - 1e-6)
  }

  test("symmetric graph conserves total rank = 1") {
    val sym = cyclic.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val got = new PageRank(iterations = 4).run(sym.toDF("src", "dst"))
      .as[(Long, Double)].collect()
    assert(math.abs(got.map(_._2).sum - 1.0) < 1e-9)
  }

  test("duplicate edges count once") {
    val got = new PageRank(iterations = 2)
      .run((cyclic ++ cyclic).toDF("src", "dst"))
      .as[(Long, Double)].collect().toMap
    val want = ref(cyclic, 2, 0.85)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12) }
  }

  test("long horizon crosses the every-8 checkpoint and still matches ref") {
    // 17 iterations -> two localCheckpoint boundaries (i=8, i=16); the
    // checkpoint must be value-transparent and the plan must not blow up
    val got = new PageRank(iterations = 17).run(cyclic.toDF("src", "dst"))
      .as[(Long, Double)].collect().toMap
    val want = ref(cyclic, 17, 0.85)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, s"node $k") }
  }

  test("result is partitioning-invariant at the 1e-9 grid") {
    val df = cyclic.toDF("src", "dst")
    val a = new PageRank(3).run(df)
      .select($"node", round($"rank", 9)).as[(Long, Double)].collect().toSet
    val b = new PageRank(3).run(df.repartition(7))
      .select($"node", round($"rank", 9)).as[(Long, Double)].collect().toSet
    assert(a === b)
  }
}
