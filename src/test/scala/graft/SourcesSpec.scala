package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink coverage beyond the parquet test tables: CSV with explicit
  * schema (the reference hand-parsed CSVs into typed Rows — our engine uses
  * the built-in reader), JSON lines, and a partitioned parquet sink with
  * partition-pruned readback.
  */
class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("csv source with explicit schema round-trips typed rows") {
    val dir = tmpDir("graft_csv")
    Seq((1L, "google.com", 10.5), (2L, "cnn.com", 3.0), (3L, "bbc.com", 7.25))
      .toDF("cookie_id", "site", "impressions")
      .write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("cookie_id", LongType),
      StructField("site", StringType),
      StructField("impressions", DoubleType)))
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(back.schema === schema)
    assert(back.count() === 3)
    assert(back.agg(sum($"impressions")).first().getDouble(0) === 20.75)
  }

  test("json lines source infers and reads nested values") {
    val dir = tmpDir("graft_json")
    Seq((1L, Seq("a", "b")), (2L, Seq("c")))
      .toDF("id", "tags")
      .write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() === 2)
    assert(back.select(explode($"tags")).count() === 3)
  }

  test("orc source round-trips with predicate pushdown") {
    val dir = tmpDir("graft_orc")
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v")
      .write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir).where($"v" > 15.0)
    assert(back.count() === 2)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("GreaterThan(v,15.0)"),
      s"expected ORC filter pushdown in:\n$plan")
  }

  test("partitioned parquet sink prunes partitions on readback") {
    val dir = tmpDir("graft_part")
    Seq((1L, "en", 1.0), (2L, "de", 2.0), (3L, "en", 3.0))
      .toDF("id", "lang", "v")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val back = spark.read.parquet(dir).where($"lang" === "en")
    assert(back.count() === 2)
    // partition filter must prune, not scan-and-filter
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"),
      s"expected partition pruning in:\n$scan")
  }
}
