package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** LayoutWriter: lossless round trip, disjoint per-file key ranges (the
  * property file/row-group stats prune on), and file-size bounding.
  */
class LayoutWriterSpec extends SparkTestBase {
  import spark.implicits._

  test("clustered write produces disjoint per-file key ranges, losslessly") {
    val dir = Files.createTempDirectory("layout_spec").toFile.getAbsolutePath + "/t"
    val df = (1 to 10000).map(i => ((i * 2654435761L) % 100000, s"row$i")).toDF("k", "v")
    new LayoutWriter().write(df, $"k", numRanges = 8, path = dir)

    val back = spark.read.parquet(dir)
    assert(back.count() === 10000)
    assert(back.columns.sorted.toSeq === Seq("k", "v")) // synthesized key dropped
    assert(back.as[(Long, String)].collect().toSet ===
      df.as[(Long, String)].collect().toSet)

    val ranges = back
      .select(input_file_name().as("f"), $"k")
      .groupBy($"f").agg(min($"k").as("lo"), max($"k").as("hi"))
      .orderBy($"lo")
      .as[(String, Long, Long)].collect()
    assert(ranges.length >= 2, "expected multiple files")
    ranges.sliding(2).foreach { case Array((_, _, hi1), (_, lo2, _)) =>
      assert(hi1 <= lo2, s"file ranges overlap: hi=$hi1 vs next lo=$lo2")
    }
  }

  test("maxRecordsPerFile bounds file size") {
    val dir = Files.createTempDirectory("layout_spec").toFile.getAbsolutePath + "/t"
    val df = (1 to 5000).map(i => (i.toLong, i)).toDF("k", "n")
    new LayoutWriter(maxRecordsPerFile = 1000).write(df, $"k", numRanges = 2, path = dir)
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name()).count().as[(String, Long)].collect()
    assert(perFile.forall(_._2 <= 1000), s"oversized file: ${perFile.maxBy(_._2)}")
  }

  test("an existing key column is clustered on and kept") {
    val dir = Files.createTempDirectory("layout_spec").toFile.getAbsolutePath + "/t"
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF(LayoutWriter.KeyCol, "v")
    new LayoutWriter().write(df, col(LayoutWriter.KeyCol), numRanges = 2, path = dir)
    assert(spark.read.parquet(dir).columns.contains(LayoutWriter.KeyCol))
  }
}
