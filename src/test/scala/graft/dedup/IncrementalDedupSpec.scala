package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Incremental ingest dedup: known-corpus drops + within-batch canonical. */
class IncrementalDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def fps(texts: String*) =
    texts.toDF("text")
      .select(sha2(TextNormalizer.normalize(col("text")), 256).as("fingerprint"))

  test("drops known content, keeps one canonical row per new fingerprint") {
    val incoming = Seq(
      (1L, "already in the corpus"),
      (2L, "Already IN the corpus!"), // normalization-equal to known
      (3L, "brand new document"),
      (4L, "brand new document"),     // within-batch duplicate of 3
      (5L, "another new one"))
      .toDF("doc_id", "text")
    val known = fps("already in the corpus")

    val kept = ExactDeduplicator.incremental(incoming, known)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(3L, 5L))
  }

  test("empty known corpus reduces to plain batch dedup") {
    val incoming = Seq((10L, "x y"), (11L, "x  Y"), (12L, "z")).toDF("doc_id", "text")
    val kept = ExactDeduplicator.incremental(
      incoming, fps().where(lit(false)))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(10L, 12L))
  }
}
