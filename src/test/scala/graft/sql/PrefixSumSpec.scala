package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Grouped two-phase prefix sum: exclusiveBy must equal a per-group
  * scanLeft for every bucket count, including the degenerate group shapes
  * (singleton groups, constant-order groups, NULL group keys, negative
  * order values) where the bucket arithmetic has edge cases.
  */
class PrefixSumSpec extends SparkTestBase {
  import spark.implicits._

  // (group, order, value) — group "a" interleaved over a wide order range,
  // "b" negative orders, "c" singleton, NULL group with two rows
  lazy val rows: Seq[(Option[String], Double, Long)] = Seq(
    (Some("a"), 1.0, 10L), (Some("a"), 2.5, 20L), (Some("a"), 100.0, 5L),
    (Some("a"), -3.0, 7L), (Some("a"), 50.0, 1L),
    (Some("b"), -10.0, 3L), (Some("b"), -5.0, 4L), (Some("b"), -1.0, 2L),
    (Some("c"), 42.0, 9L),
    (None, 0.0, 11L), (None, 1.0, 13L))

  private def expected: Map[(Option[String], Double), Long] =
    rows.groupBy(_._1).flatMap { case (g, rs) =>
      val sorted = rs.sortBy(_._2)
      sorted.map(r => (g, r._2))
        .zip(sorted.map(_._3).scanLeft(0L)(_ + _).dropRight(1))
    }

  for (buckets <- Seq(1, 2, 64, 1000)) {
    test(s"exclusiveBy equals per-group scanLeft with $buckets buckets") {
      val got = PrefixSum.exclusiveBy(
        rows.toDF("g", "o", "v"), Seq("g"), "o", "v", "p", buckets)
        .select($"g", $"o", $"p")
        .collect().map(r => (Option(r.getString(0)), r.getDouble(1)) -> r.getLong(2))
        .toMap
      assert(got === expected)
    }
  }

  test("NULL order values fail LOUDLY, never land silently in the top bucket") {
    // least() skips nulls, so an unguarded bucket expression turned a NULL
    // order value into bucket numBuckets-1 — silently corrupting every
    // last-bucket prefix. The contract is a runtime error instead.
    val bad = Seq((Some(1.0), 10L), (Option.empty[Double], 20L), (Some(3.0), 5L))
      .toDF("o", "v")
    val e1 = intercept[Exception] {
      PrefixSum.exclusive(bad, "o", "v", "p").collect()
    }
    assert(e1.getMessage.contains("null order value")
      || Option(e1.getCause).exists(_.getMessage.contains("null order value")))
    val badBy = bad.withColumn("g", lit("x"))
    val e2 = intercept[Exception] {
      PrefixSum.exclusiveBy(badBy, Seq("g"), "o", "v", "p").collect()
    }
    assert(e2.getMessage.contains("null order value")
      || Option(e2.getCause).exists(_.getMessage.contains("null order value")))
  }

  test("multi-column group keys") {
    val df = Seq(
      ("x", 1, 1.0, 2L), ("x", 1, 2.0, 3L),
      ("x", 2, 1.0, 5L), ("y", 1, 1.0, 7L), ("y", 1, 3.0, 11L))
      .toDF("g1", "g2", "o", "v")
    val got = PrefixSum.exclusiveBy(df, Seq("g1", "g2"), "o", "v", "p", 4)
      .select($"g1", $"g2", $"o", $"p")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)) -> r.getLong(3))
      .toMap
    assert(got === Map(
      ("x", 1, 1.0) -> 0L, ("x", 1, 2.0) -> 2L,
      ("x", 2, 1.0) -> 0L, ("y", 1, 1.0) -> 0L, ("y", 1, 3.0) -> 7L))
  }

  test("plan has no unpartitioned window and exactly one scan of the input") {
    val df = rows.toDF("g", "o", "v")
    val plan = PrefixSum.exclusiveBy(df, Seq("g"), "o", "v", "p")
      .queryExecution.optimizedPlan
    var emptySpec = 0
    plan.foreach {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => emptySpec += 1
      case _ =>
    }
    assert(emptySpec === 0)
    // row-preserving: every input row appears exactly once
    val n = PrefixSum.exclusiveBy(df, Seq("g"), "o", "v", "p").count()
    assert(n === rows.size)
  }

  test("output columns: input schema plus the prefix column, no helpers") {
    val out = PrefixSum.exclusiveBy(rows.toDF("g", "o", "v"), Seq("g"), "o", "v", "p")
    assert(out.columns.toSeq === Seq("g", "o", "v", "p"))
  }
}
