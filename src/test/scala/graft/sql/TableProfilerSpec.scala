package graft.sql

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** Single-pass profiler vs hand-counted statistics. */
class TableProfilerSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq[(java.lang.Double, String)](
    (1.0, "a"), (2.0, "b"), (2.0, null), (null, "a"))
    .toDF("x", "s")

  private lazy val rows =
    new TableProfiler().profile(df, Seq("x", "s"))
      .collect().map(r => r.getString(0) -> r).toMap

  test("numeric column: nulls, distinct, min/max as doubles") {
    val r = rows("x")
    assert(r.getLong(1) === 4L)          // n_rows
    assert(r.getLong(2) === 1L)          // n_nulls
    assert(r.getLong(3) === 2L)          // n_distinct (nulls excluded)
    assert(r.getDouble(4) === 1.0 && r.getDouble(5) === 2.0)
    assert(r.isNullAt(6) && r.isNullAt(7)) // string slots empty
  }

  test("string column: min/max route to the string slots") {
    val r = rows("s")
    assert(r.getLong(2) === 1L && r.getLong(3) === 2L)
    assert(r.isNullAt(4) && r.isNullAt(5))
    assert(r.getString(6) === "a" && r.getString(7) === "b")
  }

  test("one aggregation job produces the whole profile") {
    val prof = new TableProfiler().profile(df, Seq("x", "s"))
    // single-row aggregate exploded to long format -> exactly one Aggregate
    // over the scan (two with the partial), and no join/shuffle-exchange
    // beyond the final single-partition agg
    val plan = prof.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("approx mode still reports exact-ish counts on tiny data") {
    val r = new TableProfiler(approx = true).profile(df, Seq("x"))
      .collect().head
    assert(r.getLong(3) === 2L) // HLL++ is exact at this cardinality
  }
}
