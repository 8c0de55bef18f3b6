package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Segment-level (line) dedup: first occurrence wins, docs reassemble in
  * order, exact copies collapse to empty.
  */
class SegmentDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def words(a: Int, b: Int) = (a until b).map(i => s"w$i").mkString(" ")

  test("exact duplicate document collapses to empty clean_text") {
    val docs = Seq(
      (1L, words(0, 32)),  // two 16-token segments
      (2L, words(0, 32)),  // exact copy, higher id -> fully removed
      (3L, words(100, 116)) // unique
    ).toDF("doc_id", "text")
    val out = new SegmentDeduplicator(blockTokens = 16).transform(docs)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) === ((2L, 2L, words(0, 32))))
    assert(out(2L) === ((2L, 0L, "")))
    assert(out(3L) === ((1L, 1L, words(100, 116))))
  }

  test("shared boilerplate block is kept only at its first occurrence") {
    val header = words(0, 16)
    val docs = Seq(
      (1L, header + " " + words(20, 36)),
      (2L, header + " " + words(40, 56)), // same header, unique tail
      (3L, words(60, 76) + " " + header)  // header later in doc, still dropped
    ).toDF("doc_id", "text")
    val out = new SegmentDeduplicator(blockTokens = 16).transform(docs)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    assert(out(1L) === ((2L, header + " " + words(20, 36))))
    assert(out(2L) === ((1L, words(40, 56))))
    assert(out(3L) === ((1L, words(60, 76))))
  }

  test("partial trailing segment dedups independently of full blocks") {
    val docs = Seq(
      (1L, words(0, 20)), // 16-token block + 4-token tail
      (2L, words(16, 20)) // equals doc 1's tail segment -> removed
    ).toDF("doc_id", "text")
    val out = new SegmentDeduplicator(blockTokens = 16).transform(docs)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) === ((2L, 2L)))
    assert(out(2L) === ((1L, 0L)))
  }

  test("blank and punctuation-only docs contribute zero segments") {
    // tokens("") = [] so lastSeg = -1, and sequence(0, -1) DESCENDS in
    // Spark ([0, -1]) — before the guard this fabricated two phantom
    // segments (seg_idx 0 and -1) per blank doc. The oracle's range
    // semantics (i in 0..lastSeg, empty when lastSeg < 0) emit none.
    val docs = Seq(
      (1L, words(0, 16)),
      (2L, "   "),      // whitespace-only
      (3L, "!!! ... ??!"), // normalizes to ""
      (4L, words(20, 24))
    ).toDF("doc_id", "text")
    val dedup = new SegmentDeduplicator(blockTokens = 16)
    val segs = dedup.segments(docs)
    assert(segs.where(col("doc_id").isin(2L, 3L)).count() === 0L)
    assert(segs.where(col("seg_idx") < 0).count() === 0L)
    val out = dedup.transform(docs).select("doc_id")
      .as[Long].collect().toSet
    assert(out === Set(1L, 4L)) // blank docs absent, real docs intact
  }

  test("window key is the md5 fingerprint, not raw text (scale shape)") {
    val docs = Seq((1L, words(0, 16))).toDF("doc_id", "text")
    val plan = new SegmentDeduplicator().transform(docs)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("md5"), s"fingerprint missing from plan:\n$plan")
    assert(!plan.contains("partitionBy [segment"), s"raw-text window key:\n$plan")
  }
}
