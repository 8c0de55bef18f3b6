package graft.text

import graft.SparkTestBase

/** Coverage-cutoff semantics vs hand-computed cumulative masses. */
class VocabBuilderSpec extends SparkTestBase {
  import spark.implicits._

  // counts: aa=6, bb=4, cc=4, dd=2  (total 16; desc-count, asc-term order:
  // aa(6) excl 0 | bb(4) excl 6 | cc(4) excl 10 | dd(2) excl 14)
  private val docs = Seq(
    (1L, "aa aa aa bb bb cc"),
    (2L, "aa aa aa bb bb cc"),
    (3L, "cc cc dd dd")).toDF("doc_id", "text")

  private def vocabSet(cover: Double): Set[(String, Long)] =
    new VocabBuilder(cover).vocab(docs).as[(String, Long)].collect().toSet

  test("strict-< coverage keeps a term only while prior mass is under the threshold") {
    // thresh = 0.5 * 16 = 8: aa (excl 0 < 8), bb (excl 6 < 8); cc excl 10 stops
    assert(vocabSet(0.5) === Set("aa" -> 6L, "bb" -> 4L))
  }

  test("boundary frequency group admits its alphabetic prefix only") {
    // thresh = 0.65 * 16 = 10.4: cc (excl 10 < 10.4) enters, dd (14) does not;
    // bb and cc tie at count 4 — bb precedes cc alphabetically
    assert(vocabSet(0.65) === Set("aa" -> 6L, "bb" -> 4L, "cc" -> 4L))
  }

  test("cover=1.0 returns the whole vocabulary") {
    assert(vocabSet(1.0).map(_._1) === Set("aa", "bb", "cc", "dd"))
  }

  test("threshold exactly at a group boundary excludes the next term (strict <)") {
    // thresh = 0.375 * 16 = 6.0: bb excl 6 is NOT < 6 -> only aa
    assert(vocabSet(0.375) === Set("aa" -> 6L))
  }
}
