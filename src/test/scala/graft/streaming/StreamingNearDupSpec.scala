package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

case class NearDupDoc(doc_id: Long, ts: Timestamp, text: String)

class StreamingNearDupSpec extends SparkTestBase {
  import spark.implicits._

  private type Doc = NearDupDoc
  private def Doc(id: Long, ts: Timestamp, text: String): NearDupDoc =
    NearDupDoc(id, ts, text)

  private def ts(minute: Int): Timestamp =
    new Timestamp(1700000000000L + minute * 60000L)

  private val docs = Seq(
    Doc(1L, ts(0), "the quick brown fox jumps over the lazy dog again and again"),
    Doc(2L, ts(1), "The quick brown fox jumps over the lazy dog again and again!"),
    Doc(3L, ts(2), "completely different content about distributed query engines"),
    Doc(4L, ts(3), "the quick brown fox jumps over the lazy dog again & again"))

  test("streaming pairs match the batch deduplicator within the window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val out = StreamingNearDup.pairs(input.toDF(), "doc_id", "text", "ts",
      delay = "30 minutes", k = 8, numHashes = 12, numBands = 4, threshold = 0.5)

    val query = out.writeStream
      .format("memory").queryName("neardup_out").outputMode("append").start()
    try {
      input.addData(docs: _*)
      query.processAllAvailable()
      // advance the watermark far enough to flush the join + dedup state
      input.addData(Doc(99L, ts(120), "watermark advancing row xyz"))
      query.processAllAvailable()

      val streamed = spark.table("neardup_out")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet

      val batch = new graft.dedup.MinHashDeduplicator()
        .setIdCol("doc_id").setTextCol("text")
        .setShingleSize(8).setNumHashes(12).setNumBands(4).setThreshold(0.5)
        .transform(docs.toDF("doc_id", "ts", "text"))
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet

      assert(batch.nonEmpty, "fixture must contain near-dups")
      assert(streamed === batch,
        s"streamed $streamed != batch $batch")
    } finally query.stop()
  }

  test("batch route: same pairs as the live stream, one arbitrary row per pair") {
    // the q183 oracle surface — pairs() on a non-streaming frame takes the
    // dropDuplicates branch (dropDuplicatesWithinWatermark refuses batch)
    // and must produce the identical (id_a, id_b, jaccard) set the
    // MemoryStream run emits
    implicit val sqlCtx = spark.sqlContext
    val batchPairs = StreamingNearDup.pairs(docs.toDS().toDF(),
      "doc_id", "text", "ts", delay = "30 minutes",
      k = 8, numHashes = 12, numBands = 4, threshold = 0.5)
    assert(!batchPairs.isStreaming)
    val got = batchPairs.select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().sorted

    val input = MemoryStream[Doc]
    val out = StreamingNearDup.pairs(input.toDF(), "doc_id", "text", "ts",
      delay = "30 minutes", k = 8, numHashes = 12, numBands = 4, threshold = 0.5)
    val query = out.writeStream
      .format("memory").queryName("neardup_batch_parity").outputMode("append").start()
    try {
      input.addData(docs: _*)
      query.processAllAvailable()
      input.addData(Doc(99L, ts(120), "watermark advancing row xyz"))
      query.processAllAvailable()
      val streamed = spark.table("neardup_batch_parity")
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
        .collect().sorted
      assert(got.nonEmpty && got.toSeq === streamed.toSeq)
      // exactly one row per pair key in the batch route
      assert(got.map(p => (p._1, p._2)).distinct.length === got.length)
    } finally query.stop()
  }

  test("batch route: the time bound prunes band-colliding true near-dups") {
    // identical text 60 min apart with a 10 min bound: band collision and
    // jaccard = 1, yet no pair — the q183 planted +45 min shift relies on
    // exactly this pruning
    val far = Seq(docs.head, Doc(50L, ts(60), docs.head.text))
    val got = StreamingNearDup.pairs(far.toDS().toDF(),
      "doc_id", "text", "ts", delay = "10 minutes", numBands = 4, threshold = 0.5)
    assert(got.count() === 0L)
  }

  test("rows outside the watermark window do not pair") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val out = StreamingNearDup.pairs(input.toDF(), "doc_id", "text", "ts",
      delay = "10 minutes", numBands = 4, threshold = 0.5)

    val query = out.writeStream
      .format("memory").queryName("neardup_window").outputMode("append").start()
    try {
      input.addData(docs.head)
      query.processAllAvailable()
      // identical text, but 60 min later — outside the 10 min join bound
      input.addData(Doc(50L, ts(60), docs.head.text))
      query.processAllAvailable()
      input.addData(Doc(99L, ts(600), "watermark advancing row xyz"))
      query.processAllAvailable()

      val pairs = spark.table("neardup_window")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(pairs.isEmpty, s"unexpected cross-window pairs: $pairs")
    } finally query.stop()
  }
}
