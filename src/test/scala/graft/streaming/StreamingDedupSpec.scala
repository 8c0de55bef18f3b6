package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  case class Doc(doc_id: Long, ts: Timestamp, text: String)

  private def ts(minute: Int): Timestamp =
    new Timestamp(1700000000000L + minute * 60000L)

  test("in-window duplicates are dropped, normalization-equal texts collide") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val out = StreamingDedup.dedup(input.toDF(), "text", "ts", "30 minutes")

    val query = out.writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      input.addData(
        Doc(1L, ts(0), "The quick brown fox"),
        Doc(2L, ts(1), "the QUICK  brown fox!"), // same after normalization
        Doc(3L, ts(2), "something else entirely"))
      query.processAllAvailable()
      input.addData(Doc(4L, ts(5), "The quick brown fox")) // in-window dup
      query.processAllAvailable()

      val kept = spark.table("dedup_out").select("doc_id").as[Long].collect().toSet
      assert(kept.contains(3L))
      // exactly one of the three fox variants survives
      assert(kept.intersect(Set(1L, 2L, 4L)).size === 1)
    } finally query.stop()
  }

  test("fingerprint matches the batch deduplicator's identity") {
    val df = Seq((1L, "A  b! c"), (2L, "a b C")).toDF("doc_id", "text")
    val fps = df.select(StreamingDedup.fingerprint($"text").as("fp"))
      .as[String].collect()
    assert(fps(0) === fps(1)) // same normalized text -> same fingerprint
    val batch = new graft.dedup.ExactDeduplicator()
      .setIdCol("doc_id").setTextCol("text").setFingerprintCol("fingerprint")
      .transform(df).select("fingerprint").as[String].collect()
    assert(batch.toSet === fps.toSet)
  }
}
