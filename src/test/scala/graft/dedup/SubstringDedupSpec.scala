package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Substring-level (overlapping k-shingle) dedup: duplicated windows merge
  * into maximal spans, offsets don't matter (unlike block dedup), clean()
  * cuts exactly the covered tokens.
  */
class SubstringDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def words(a: Int, b: Int) = (a until b).map(i => s"w$i").mkString(" ")

  private def stats(docs: org.apache.spark.sql.DataFrame, k: Int = 8) =
    new SubstringDeduplicator(k = k).transform(docs)
      .as[(Long, Int, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("overlapping duplicated windows merge into one maximal span") {
    // docs share tokens 0..15 (9 duplicated 8-windows, pairwise overlapping)
    val docs = Seq(
      (1L, words(0, 16) + " " + words(100, 110)),
      (2L, words(0, 16) + " " + words(200, 210))
    ).toDF("doc_id", "text")
    val out = stats(docs)
    assert(out(1L) === ((26, 1L, 16L, 10L)))
    assert(out(2L) === ((26, 1L, 16L, 10L)))
  }

  test("duplication at unaligned offsets is caught (the block-dedup gap)") {
    // doc 2 carries doc 1's run shifted 3 tokens in — a 16-block segment
    // dedup at these sizes would see no identical block
    val shared = words(0, 12)
    val docs = Seq(
      (1L, shared + " " + words(50, 60)),
      (2L, words(80, 83) + " " + shared + " " + words(90, 100))
    ).toDF("doc_id", "text")
    val out = stats(docs)
    assert(out(1L)._2 === 1L, "doc 1 must report the shared span")
    assert(out(1L)._3 === 12L)
    assert(out(2L)._3 === 12L, "shifted occurrence must cover the same 12 tokens")
  }

  test("two separated duplicated runs stay two spans") {
    val a = words(0, 10)
    val b = words(300, 310)
    val docs = Seq(
      (1L, a + " " + words(50, 70) + " " + b),
      (2L, a + " " + words(100, 120) + " " + b)
    ).toDF("doc_id", "text")
    val out = stats(docs)
    assert(out(1L) === ((40, 2L, 20L, 20L)))
    assert(out(2L) === ((40, 2L, 20L, 20L)))
  }

  test("within-document repetition is duplication too") {
    val run = words(0, 10)
    val docs = Seq((1L, run + " " + words(40, 50) + " " + run)).toDF("doc_id", "text")
    val out = stats(docs)
    assert(out(1L)._2 === 2L)
    assert(out(1L)._3 === 20L)
  }

  test("docs shorter than k and unique docs report zeros") {
    val docs = Seq(
      (1L, "tiny doc"),
      (2L, ""),
      (3L, words(0, 20)),
      (4L, words(100, 120))
    ).toDF("doc_id", "text")
    val out = stats(docs)
    assert(out(1L) === ((2, 0L, 0L, 2L)))
    assert(out(2L) === ((0, 0L, 0L, 0L)))
    assert(out(3L) === ((20, 0L, 0L, 20L)))
    assert(out(4L) === ((20, 0L, 0L, 20L)))
  }

  test("clean() cuts exactly the duplicated spans, keeps the rest in order") {
    val docs = Seq(
      (1L, words(0, 16) + " " + words(100, 110)),
      (2L, words(0, 16) + " " + words(200, 210)),
      (3L, "short unique")
    ).toDF("doc_id", "text")
    val out = new SubstringDeduplicator(k = 8).clean(docs)
      .as[(Long, String)].collect().toMap
    assert(out(1L) === words(100, 110))
    assert(out(2L) === words(200, 210))
    assert(out(3L) === "short unique")
  }

  test("join/window keys are fingerprints and the high-card doc id (scale shape)") {
    val docs = Seq((1L, words(0, 16))).toDF("doc_id", "text")
    val plan = new SubstringDeduplicator().transform(docs)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("md5"), s"fingerprint missing from plan:\n$plan")
    assert(!plan.toLowerCase.contains("cartesian"), s"cartesian in plan:\n$plan")
  }
}
