package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.streaming.StreamingTopK.{ItemEvent, TopKRow}

/** SpaceSaving invariants vs exact counts, cross-batch state carry, the
  * exact batch degenerate path (the q179-gated surface), and the
  * null-item / null-group contracts.
  */
class StreamingTopKSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    new Timestamp(1700000000000L + minute * 60000L)

  private def ev(items: Seq[String], startMin: Int, group: String = "g"): Seq[ItemEvent] =
    items.zipWithIndex.map { case (it, i) => ItemEvent(group, it, ts(startMin + i)) }

  private def runStream(batches: Seq[Seq[ItemEvent]], capacity: Int, k: Int): Seq[TopKRow] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ItemEvent]
    val q = StreamingTopK.monitor(input.toDS(), capacity = capacity, k = k)
      .as[TopKRow].writeStream
      .format("memory").queryName("topk_stream_out").outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table("topk_stream_out").as[TopKRow].collect().toSeq
    } finally q.stop()
  }

  /** The documented consumer rule: keep the emission set with the largest
    * (as_of, n_group) per group.
    */
  private def finalSnapshot(rows: Seq[TopKRow]): Map[String, Seq[TopKRow]] =
    rows.groupBy(_.group).map { case (g, rs) =>
      val latest = rs.map(r => (r.as_of, r.n_group)).max
      g -> rs.filter(r => (r.as_of, r.n_group) == latest).sortBy(_.rank)
    }

  test("capacity >= distinct items: estimates are exact across micro-batches, err 0") {
    val b1 = ev(Seq("a", "b", "a", "c", "a"), 0)
    val b2 = ev(Seq("b", "a", "d", "b", "b"), 10)
    val snap = finalSnapshot(runStream(Seq(b1, b2), capacity = 8, k = 4))("g")
    assert(snap.map(r => r.item -> r.est) ===
      Seq("a" -> 4L, "b" -> 4L, "c" -> 1L, "d" -> 1L)) // ties: item asc
    assert(snap.forall(_.err === 0L))
    assert(snap.head.n_group === 10L)
    assert(snap.head.as_of === ts(14).getTime) // the event-time frontier
  }

  test("capacity-constrained: SpaceSaving bounds hold against exact counts") {
    // skewed feed: x dominates, y second, long tail of singletons
    val items = Seq.fill(30)("x") ++ Seq.fill(12)("y") ++
      (1 to 18).map(i => f"t$i%02d")
    val exact = items.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }
    val n = items.size.toLong
    val capacity = 6
    val snap = finalSnapshot(
      runStream(Seq(ev(items, 0)), capacity = capacity, k = capacity))("g")
    assert(snap.head.n_group === n)
    // completeness: every item with true count > n/capacity is present
    val mustHave = exact.filter(_._2 > n / capacity).keySet
    assert(mustHave.subsetOf(snap.map(_.item).toSet), s"missing from $snap")
    // overestimation band: est >= true >= est - err; err <= n/capacity
    snap.foreach { r =>
      val t = exact.getOrElse(r.item, 0L)
      assert(r.est >= t, s"${r.item} underestimated")
      assert(r.est - r.err <= t, s"${r.item} band broken")
      assert(r.err <= n / capacity, s"${r.item} err bound broken")
    }
    // the dominant items rank by exact count at the top
    assert(snap.head.item === "x" && snap(1).item === "y")
  }

  test("groups are independent; idle-key state carries between batches") {
    val b1 = ev(Seq("a", "a", "b"), 0, "g1") ++ ev(Seq("z"), 0, "g2")
    val b2 = ev(Seq("a"), 10, "g1") // g2 silent: no new emission for it
    val rows = runStream(Seq(b1, b2), capacity = 4, k = 2)
    val snap = finalSnapshot(rows)
    assert(snap("g1").map(r => r.item -> r.est) === Seq("a" -> 3L, "b" -> 1L))
    assert(snap("g2").map(r => r.item -> r.est) === Seq("z" -> 1L))
    // per-batch emission: g1 emitted in both batches, g2 only in the first
    assert(rows.count(_.group == "g1") === 2 + 2)
    assert(rows.count(_.group == "g2") === 1)
  }

  test("batch path is the exact top-k with err 0 (the q179 oracle surface)") {
    val items = Seq("a", "a", "a", "b", "b", "c", "d", "d", "d", "d")
    val df = StreamingTopK.monitor(ev(items, 0).toDS(), capacity = 4, k = 3)
    val got = df.as[TopKRow].collect().sortBy(_.rank)
    val asOf = ts(9).getTime
    assert(got.map(r => (r.item, r.est, r.err, r.rank, r.n_group, r.as_of)).toSeq ===
      Seq(("d", 4L, 0L, 1, 10L, asOf), ("a", 3L, 0L, 2, 10L, asOf),
        ("b", 2L, 0L, 3, 10L, asOf)))
  }

  test("k > capacity refuses at wiring time") {
    val e = intercept[IllegalArgumentException] {
      StreamingTopK.monitor(ev(Seq("a"), 0).toDS(), capacity = 2, k = 3)
    }
    assert(e.getMessage.contains("capacity"))
  }

  test("deterministic eviction: reference fold replays the stream exactly") {
    // force evictions with capacity 2 and interleaved novel items
    val items = Seq("a", "b", "c", "a", "d", "c", "e", "a")
    val snap = finalSnapshot(
      runStream(Seq(ev(items, 0)), capacity = 2, k = 2))("g")
    val ref = StreamingTopK.fold(2, Nil, items)
      .sortBy(c => (-c.cnt, c.err, c.item)).take(2)
    assert(snap.map(r => (r.item, r.est, r.err)) ===
      ref.map(c => (c.item, c.cnt, c.err)))
  }

  test("a null item is a real item in both modes (nulls-first tie order)") {
    val items = Seq[String]("a", null, "a", null, null)
    val want = Seq[(String, Long)]((null, 3L), ("a", 2L))
    // streaming: null folds, sorts first among count ties, survives eviction
    val snap = finalSnapshot(
      runStream(Seq(ev(items, 0)), capacity = 4, k = 4))("g")
    assert(snap.map(r => (r.item, r.est)) === want)
    // batch: groupBy counts null as a value, same order
    val got = StreamingTopK.monitor(ev(items, 0).toDS(), capacity = 4, k = 4)
      .as[TopKRow].collect().sortBy(_.rank)
    assert(got.map(r => (r.item, r.est)).toSeq === want)
    // eviction under pressure with a null present does not NPE
    val churn = Seq[String](null, "b", "c", "d", null, "e", "f", null)
    val pressured = finalSnapshot(
      runStream(Seq(ev(churn, 0)), capacity = 2, k = 2))
    assert(pressured("g").nonEmpty)
  }

  test("batch path executes its input once: totals derive from the shared counts exchange") {
    // both aggregation consumers (rank and totals) must read the SAME
    // (group, item) counts exchange so the input plan runs once — the r14
    // ADVICE double-scan re-executed an expensive upstream frame. The
    // executed plan carries the proof: a ReusedExchange node, and exactly
    // one scan of the input.
    val events = Seq(
      ItemEvent("g", "a", ts(0)), ItemEvent("g", "b", ts(1)),
      ItemEvent("h", "a", ts(2))).toDS()
    val df = StreamingTopK.monitor(events, capacity = 4, k = 2)
    df.collect() // AQE finalizes the plan on execution
    // AdaptiveSparkPlan.toString appends the pre-AQE "== Initial Plan =="
    // (where nothing is reused yet) — count nodes in the FINAL section only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("ReusedExchange"),
      s"expected the counts exchange to be reused, plan:\n$plan")
    // two scans, pinned: the live one under the shared counts exchange,
    // plus rankByValue's internal bucket-prefix branch (re-partitioned by
    // (group, bucket) — not exchange-identical, pre-existing machinery).
    // Pre-fix this was THREE: the totals groupBy scanned raw events again.
    assert("LocalTableScan".r.findAllIn(plan).size <= 2,
      s"expected at most two input scans (counts + rank's prefix branch), plan:\n$plan")
  }

  test("a null group refuses loudly in the live mode (batch already does)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ItemEvent]
    val q = StreamingTopK.monitor(input.toDS(), capacity = 4, k = 2)
      .writeStream.format("memory").queryName("topk_nullg_out")
      .outputMode("append").start()
    try {
      input.addData(ItemEvent(null, "a", ts(0)))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage != null)
    } finally q.stop()
  }
}
