package graft.temporal

import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  lazy val points = Seq(
    (1L, "A", 100L),
    (2L, "A", 150L),
    (3L, "A", 500L),  // in no interval
    (4L, "B", 100L))
    .toDF("pid", "key", "t")

  lazy val intervals = Seq(
    (10L, "A", 90L, 160L),   // catches points 1 and 2
    (11L, "A", 140L, 200L),  // catches point 2 (multi-match fan-out)
    (12L, "B", 100L, 100L))  // degenerate [100,100] catches point 4 (inclusive)
    .toDF("iid", "key", "lo", "hi")

  private def joined(width: Long) =
    new RangeJoin(Seq("key"), "t", "lo", "hi", width)
      .join(points, intervals)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet

  test("points match every covering interval, boundaries inclusive") {
    val expected = Set((1L, 10L), (2L, 10L), (2L, 11L), (4L, 12L))
    assert(joined(width = 50L) === expected)
  }

  test("inverted and null-bounded intervals are dropped BEFORE the bucket explode") {
    // sequence() DESCENDS for end < start, so one dirty inverted interval
    // would explode into start/width garbage rows before the residual
    // filters them — the guard must kill it pre-explode (results already
    // could not include it: BETWEEN never matches an inverted interval)
    val dirty = intervals.unionByName(Seq(
      (13L, "A", Some(1000000000L), Some(0L)), // inverted: 2e7 rows at width 50 pre-guard
      (14L, "A", None, Some(200L)),
      (15L, "B", Some(100L), None))
      .toDF("iid", "key", "lo", "hi"))
    val out = new RangeJoin(Seq("key"), "t", "lo", "hi", 50L)
      .join(points, dirty)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 10L), (2L, 10L), (2L, 11L), (4L, 12L)))
  }

  test("bucket width does not change results (only the plan)") {
    val expected = joined(width = 50L)
    assert(joined(width = 1L) === expected)
    assert(joined(width = 1000L) === expected)
  }

  test("clashing non-key columns are rejected") {
    intercept[IllegalArgumentException] {
      new RangeJoin(Seq("key"), "t", "lo", "hi", 10L)
        .join(points, intervals.withColumnRenamed("iid", "pid"))
    }
  }

  test("plan is a hash equi-join on (key, bucket), not a nested loop") {
    val plan = new RangeJoin(Seq("key"), "t", "lo", "hi", 50L)
      .join(points, intervals).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
    assert(!plan.toLowerCase.contains("cartesian"), s"cartesian in:\n$plan")
  }
}
