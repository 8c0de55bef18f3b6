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

  /** In-memory personalized reference: seeded teleport, same contract. */
  private def refP(
      edges: Seq[(Long, Long)], seeds: Seq[Long], iters: Int,
      d: Double): Map[Long, Double] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val s = seeds.distinct.filter(nodes.contains)
    val t = nodes.map(v => v -> (if (s.contains(v)) 1.0 / s.size else 0.0)).toMap
    val out = e.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var rank = t
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => rank(u) / out(u) }.sum).toMap
      rank = nodes.map(v => v -> ((1 - d) * t(v) + d * in.getOrElse(v, 0.0))).toMap
    }
    rank
  }

  test("personalized: matches the in-memory seeded-teleport reference") {
    val got = new PageRank(iterations = 3)
      .runPersonalized(cyclic.toDF("src", "dst"), Seq(1L).toDF("node"))
      .as[(Long, Double)].collect().toMap
    val want = refP(cyclic, Seq(1L), 3, 0.85)
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, s"node $k") }
  }

  test("personalized: nodes unreachable from the seeds read exactly 0") {
    // 1->2 reachable from seed 1; 10->11 is a separate component
    val edges = Seq((1L, 2L), (10L, 11L))
    val got = new PageRank(iterations = 4)
      .runPersonalized(edges.toDF("src", "dst"), Seq(1L).toDF("node"))
      .as[(Long, Double)].collect().toMap
    assert(got(10L) === 0.0)
    assert(got(11L) === 0.0)
    assert(got(1L) > 0.0 && got(2L) > 0.0)
  }

  test("personalized: seed ids off the graph are dropped before |S|") {
    // seed 99 is not in the graph: teleport mass splits over {1} only,
    // so the result equals seeding {1} alone
    val a = new PageRank(3)
      .runPersonalized(cyclic.toDF("src", "dst"), Seq(1L, 99L).toDF("node"))
      .as[(Long, Double)].collect().toMap
    val b = refP(cyclic, Seq(1L), 3, 0.85)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12, s"node $k") }
  }

  test("personalized: NO seed in a nonempty graph fails loudly; empty graph is clean") {
    val e = intercept[IllegalArgumentException] {
      new PageRank(3)
        .runPersonalized(cyclic.toDF("src", "dst"), Seq(99L).toDF("node"))
    }
    assert(e.getMessage.contains("seed"))
    val empty = new PageRank(3).runPersonalized(
      Seq.empty[(Long, Long)].toDF("src", "dst"), Seq(1L).toDF("node"))
    assert(empty.count() === 0L)
  }
}
