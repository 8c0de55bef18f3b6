package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

case class StreamEv(ts: Timestamp, user_id: Long, value: Double)

/** Stream-static enrichment join — the remaining Structured Streaming join
  * surface (stateful aggs, dedup, sessionization, and windowed monitoring
  * are covered by the sibling specs): a streaming fact joins a static
  * dimension per micro-batch with no state, the standard dimension-lookup
  * shape at any scale (broadcast the dimension, never shuffle the stream).
  */
class StreamStaticJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    new Timestamp(1700000000000L + minute * 60000L)

  test("streaming facts enrich against a static dimension; unmatched rows survive a left join") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[StreamEv]
    val enriched = input.toDF()
      .join(broadcast(dim), Seq("user_id"), "left")
      .select(col("user_id"), col("value"), coalesce(col("tier"), lit("unknown")).as("tier"))

    val query = enriched.writeStream
      .format("memory").queryName("enriched_out").outputMode("append").start()
    try {
      input.addData(
        StreamEv(ts(0), 1L, 10.0),
        StreamEv(ts(1), 2L, 20.0),
        StreamEv(ts(2), 99L, 5.0)) // no dimension row
      query.processAllAvailable()
      val got = spark.table("enriched_out")
        .as[(Long, Double, String)].collect().toSet
      assert(got === Set((1L, 10.0, "gold"), (2L, 20.0, "basic"), (99L, 5.0, "unknown")))
    } finally query.stop()
  }
}
