package graft.temporal

import graft.SparkTestBase

class IntervalCoverageSpec extends SparkTestBase {
  import spark.implicits._

  lazy val iv = Seq(
    // key a: [0,10) ∪ [5,20) merge -> [0,20); [20,30) touches -> merges too;
    // [40,50) is a second island
    ("a", 0L, 10L), ("a", 5L, 20L), ("a", 20L, 30L), ("a", 40L, 50L),
    // key b: one interval fully inside another
    ("b", 100L, 200L), ("b", 120L, 150L),
    // key c: malformed rows only -> key disappears
    ("c", 5L, 5L), ("c", 9L, 3L))
    .toDF("user_id", "start_us", "end_us")

  private lazy val out = new IntervalCoverage().coverage(iv)
    .as[(String, Long, Long, Long, Long)].collect()
    .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap

  test("overlapping and touching intervals merge; disjoint ones don't") {
    assert(out("a") === ((40L, 2L, 0L, 50L))) // [0,30)+[40,50) = 30+10
  }

  test("contained intervals add nothing") {
    assert(out("b") === ((100L, 1L, 100L, 200L)))
  }

  test("zero-length and inverted intervals are dropped") {
    assert(!out.contains("c"))
  }

  test("coverage never exceeds the naive sum and never undercounts an island") {
    val naive = 10 + 15 + 10 + 10
    assert(out("a")._1 <= naive)
    assert(out("a")._1 >= 10) // at least the largest single interval
  }
}
