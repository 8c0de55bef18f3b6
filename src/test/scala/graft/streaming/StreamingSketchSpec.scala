package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sql.{functions => gf}

/** The mergeable-sketch family under Structured Streaming: a streaming
  * `groupBy().agg(hll_sketch / kmin_values / cms_sketch)` carries the
  * custom TypedImperativeAggregate BUFFER through the state store across
  * micro-batches (serialize → store → merge on the next trigger), so this
  * pins the end-to-end property the 100 TB ingest design leans on:
  * **streamed registers are bit-identical to batch-sketching the same
  * rows** — max/min/sum merges are order-insensitive, and the state-store
  * round-trip must not perturb them. With that identity, a streaming
  * ingest can maintain per-scope sketches continuously and any coarser
  * rollup stays an element-wise merge (`hllMerge`/`cmsMerge` — the batch
  * specs), never a rescan.
  */
class StreamingSketchSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming sketch aggregation == batch sketch over the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq.tabulate(400)(i => (s"src${i % 3}", s"tok${i % 53}"))

    val input = MemoryStream[(String, String)]
    val agg = input.toDF().toDF("source", "tok")
      .groupBy($"source")
      .agg(
        gf.hllSketch($"tok", 4).as("hll"),
        gf.kMinValues($"tok", 8).as("kmv"),
        gf.countMinSketch($"tok", 3, 16).as("cms"))
    val q = agg.writeStream
      .format("memory").queryName("sketch_stream")
      .outputMode("complete")
      .start()
    try {
      // three uneven micro-batches: state-store merge runs twice per group
      input.addData(rows.take(100): _*)
      q.processAllAvailable()
      input.addData(rows.slice(100, 150): _*)
      q.processAllAvailable()
      input.addData(rows.drop(150): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("sketch_stream")
      .collect().map(_.toString).sorted.toSeq
    val batch = rows.toDF("source", "tok")
      .groupBy($"source")
      .agg(
        gf.hllSketch($"tok", 4).as("hll"),
        gf.kMinValues($"tok", 8).as("kmv"),
        gf.countMinSketch($"tok", 3, 16).as("cms"))
      .collect().map(_.toString).sorted.toSeq

    assert(streamed === batch)
    assert(streamed.size === 3)
  }
}
