package graft.sql

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** GroupedNtile must equal the single-window ntile exactly — the whole
  * point is swapping the one-task-per-group sort for a parallel plan
  * WITHOUT changing a single tile assignment.
  */
class GroupedNtileSpec extends SparkTestBase {
  import spark.implicits._

  private def reference(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy($"g").orderBy($"v", $"id")
    df.withColumn("tile", ntile(k).over(w).cast("long"))
  }

  private def check(rows: Seq[(String, Double, Long)], k: Int): Unit = {
    val df = rows.toDF("g", "v", "id").repartition(8)
    val got = GroupedNtile.ntile(df, k, "g", "v", Seq($"id"), "tile")
      .select($"g", $"id", $"tile").as[(String, Long, Long)].collect().toMap2
    val want = reference(df, k)
      .select($"g", $"id", $"tile").as[(String, Long, Long)].collect().toMap2
    assert(got === want)
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[(A, B), C] = rows.map { case (a, b, c) => (a, b) -> c }.toMap
  }

  test("matches window ntile on skewed groups with ties") {
    val rnd = new Random(7)
    val rows = (0L until 2000L).map { i =>
      val g = if (i % 10 < 7) "en" else if (i % 10 < 9) "fr" else "de"
      // coarse quantization forces heavy ties; doc-id tiebreak must decide
      (g, math.floor(rnd.nextGaussian() * 4) / 2.0, i)
    }
    for (k <- Seq(2, 3, 7)) check(rows, k)
  }

  test("matches window ntile when a group is smaller than k") {
    val rows = Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("b", 5.0, 3L))
    check(rows, 3)
    check(rows, 5)
  }

  test("matches window ntile when all values tie (single value bucket)") {
    val rows = (0L until 50L).map(i => ("x", 3.25, i))
    check(rows, 3)
  }

  test("tile sizes follow the NTile contract (first n mod k tiles get one extra)") {
    val rows = (0L until 100L).map(i => ("g", i.toDouble, i))
    val sizes = GroupedNtile.ntile(rows.toDF("g", "v", "id"), 3, "g", "v", Seq($"id"), "tile")
      .groupBy($"tile").count().as[(Long, Long)].collect().toMap
    assert(sizes === Map(1L -> 34L, 2L -> 33L, 3L -> 33L))
  }

  test("rankByValue matches the window row_number, asc and desc") {
    val rnd = new Random(11)
    val rows = (0L until 2000L).map { i =>
      val g = if (i % 10 < 7) "en" else if (i % 10 < 9) "fr" else "de"
      (g, math.floor(rnd.nextGaussian() * 4) / 2.0, i)
    } ++ (0L until 40L).map(i => ("const", 9.5, 10000L + i)) // degenerate group
    val df = rows.toDF("g", "v", "id").repartition(8)
    for (desc <- Seq(true, false)) {
      val ord = if (desc) Seq($"v".desc, $"id") else Seq($"v".asc, $"id")
      val w = Window.partitionBy($"g").orderBy(ord: _*)
      val want = df.withColumn("rnk", row_number().over(w).cast("long"))
        .select($"g", $"id", $"rnk").as[(String, Long, Long)].collect().toMap2
      val got = GroupedNtile.rankByValue(df, "g", "v", desc, Seq($"id"), "rnk")
        .select($"g", $"id", $"rnk").as[(String, Long, Long)].collect().toMap2
      assert(got === want)
    }
  }

  test("null group keys and null order values fail LOUDLY (contract), never vanish") {
    // the USING stats join used to drop null-group rows BEFORE rank()'s
    // guard could fire, and least() turned a null order value into a
    // valid last bucket — both silent where the doc promises an error
    val nullGroup = Seq((Some("a"), 1.0, 1L), (Option.empty[String], 2.0, 2L))
      .toDF("g", "v", "id")
    val e1 = intercept[Exception] {
      GroupedNtile.rankByValue(nullGroup, "g", "v", descending = false,
        Seq($"id"), "r").collect()
    }
    assert((e1.getMessage + Option(e1.getCause).map(_.getMessage).getOrElse(""))
      .contains("null group key or order value"))
    val nullOrder = Seq(("a", Some(1.0), 1L), ("a", Option.empty[Double], 2L))
      .toDF("g", "v", "id")
    val e2 = intercept[Exception] {
      GroupedNtile.ntile(nullOrder, 2, "g", "v", Seq($"id"), "t").collect()
    }
    assert((e2.getMessage + Option(e2.getCause).map(_.getMessage).getOrElse(""))
      .contains("null group key or order value"))
  }

  test("every physical window partitions by the bucket, never the group alone") {
    // the whole point: no window may sort an entire group in one task
    val rows = (0L until 500L).map(i => ("g" + i % 3, i.toDouble, i))
    for (df <- Seq(
      GroupedNtile.ntile(rows.toDF("g", "v", "id"), 3, "g", "v", Seq($"id"), "tile"),
      GroupedNtile.rank(rows.toDF("g", "v", "id"), "g", Seq($"v", $"id"),
        floor($"v" / 100.0).cast("long"), "rnk"))) {
      val windows = df.queryExecution.executedPlan.toString
        .linesIterator.filter(_.contains(" Window [")).toSeq
      assert(windows.nonEmpty)
      windows.foreach(w => assert(w.contains("__bkt"), s"window without bucket: $w"))
    }
  }
}
