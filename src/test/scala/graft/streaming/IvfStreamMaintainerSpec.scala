package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.similarity.IvfCosineIndex

case class MaintVec(vec_id: Long, embedding: Seq[Double])

class IvfStreamMaintainerSpec extends SparkTestBase {
  import spark.implicits._

  private type Vec = MaintVec
  private val Vec = MaintVec

  private val dim = 8

  private def h(i: Long, s: Int): Double =
    (((i * 2654435761L + s * 40503L) % 1000) / 1000.0) - 0.5

  private def vec(i: Long): Vec =
    Vec(i, (0 until dim).map(j => h(i, j + 1) * 3 + (i % 4).toDouble))

  private def ivf = new IvfCosineIndex(numCentroids = 4, nprobe = 2, dim = Some(dim))

  test("streamed micro-batches grow the saved index; search matches in-session append") {
    implicit val sqlCtx = spark.sqlContext
    val path = Files.createTempDirectory("graft-ivf-stream").toString
    val base = (0L until 120L).map(vec).toDF()
    val m = new IvfStreamMaintainer(ivf, path)
    m.bootstrap(base)

    val input = MemoryStream[Vec]
    val query = m.start(input.toDF(),
      Files.createTempDirectory("graft-ivf-ckpt").toString)
    try {
      input.addData((120L until 160L).map(vec): _*)
      query.processAllAvailable()
      input.addData((160L until 200L).map(vec): _*)
      query.processAllAvailable()
    } finally query.stop()

    val loaded = m.load(spark)
    assert(loaded.lists.count() === 200L)
    // every vector listed exactly once (no duplicate candidates possible)
    assert(loaded.lists.select("vec_id").distinct().count() === 200L)

    // search over the streamed layout == search over the equivalent
    // in-session appends against the same bootstrap centroids
    val b1 = (120L until 160L).map(vec).toDF()
    val b2 = (160L until 200L).map(vec).toDF()
    val direct = ivf.append(ivf.append(
      graft.similarity.IvfIndex(loaded.centroids, ivf.build(base).lists), b1), b2)
    val queries = base.where(col("vec_id") < 3)
    val got = ivf.search(queries, loaded, k = 3).collect().map(_.toString).sorted
    val want = ivf.search(queries, direct, k = 3).collect().map(_.toString).sorted
    assert(got.toSeq === want.toSeq)
  }

  test("compaction rewrites the accrued batches into one, search-identical") {
    val path = Files.createTempDirectory("graft-ivf-compact").toString
    val m = new IvfStreamMaintainer(ivf, path)
    m.bootstrap((0L until 100L).map(vec).toDF())
    m.appendBatch((100L until 140L).map(vec).toDF(), batchId = 1L)
    m.appendBatch((140L until 180L).map(vec).toDF(), batchId = 2L)

    val m2 = m.compactTo(spark,
      Files.createTempDirectory("graft-ivf-compact2").toString)
    val before = m.load(spark)
    val after = m2.load(spark)
    assert(after.lists.count() === 180L)
    val queries = (0L until 3L).map(vec).toDF()
    assert(ivf.search(queries, after, k = 3).collect().map(_.toString).sorted.toSeq
      === ivf.search(queries, before, k = 3).collect().map(_.toString).sorted.toSeq)
  }

  test("bootstrap on an empty corpus fails loudly; empty micro-batches are no-ops") {
    val path = Files.createTempDirectory("graft-ivf-guard").toString
    val m = new IvfStreamMaintainer(ivf, path)
    val e = intercept[IllegalArgumentException] {
      m.bootstrap((0L until 100L).map(vec).toDF().limit(0))
    }
    assert(e.getMessage.contains("empty corpus"))

    m.bootstrap((0L until 100L).map(vec).toDF())
    m.appendBatch((0L until 100L).map(vec).toDF().limit(0), batchId = 1L)
    assert(m.load(spark).lists.count() === 100L)
  }

  test("a replayed batch id overwrites its own partition — no duplicate list rows") {
    val path = Files.createTempDirectory("graft-ivf-replay").toString
    val m = new IvfStreamMaintainer(ivf, path)
    m.bootstrap((0L until 100L).map(vec).toDF())

    val batch = (100L until 140L).map(vec).toDF()
    m.appendBatch(batch, batchId = 1L)
    m.appendBatch(batch, batchId = 1L) // at-least-once replay

    val loaded = m.load(spark)
    assert(loaded.lists.count() === 140L)
    assert(loaded.lists.select("vec_id").distinct().count() === 140L)
  }
}
