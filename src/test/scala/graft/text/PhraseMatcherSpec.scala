package graft.text

import graft.SparkTestBase

class PhraseMatcherSpec extends SparkTestBase {
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "Free Money!! claim your FREE money now"), // 2 hits of one phrase
    (2L, "free lunch and money"),                   // split -> no phrase hit
    (3L, "totally clean text"),
    (4L, "free money and a free money-back offer"), // punctuation folds away
    (5L, "money"),                                  // shorter than the phrase
    (6L, "act now"))                                // 1-token phrase "now"
    .toDF("doc_id", "text")

  lazy val m = new PhraseMatcher(Seq("Free Money", "now"))

  private lazy val out = m.counts(docs)
    .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("counts occurrences, multiple per document") {
    // doc 1: 'free money' x2 + 'now' x1
    assert(out(1L) === ((3L, 2L)))
    // doc 4: 'free money' twice ('money-back' normalizes to 'moneyback',
    // so the second 'free money' needs the hyphen fold... 'free money-back'
    // -> tokens 'free moneyback' -> NOT a hit; only the leading one is
    assert(out(4L) === ((1L, 1L)))
  }

  test("no partial or split matches; row-preserving zeros") {
    assert(out(2L) === ((0L, 0L)))
    assert(out(3L) === ((0L, 0L)))
    assert(out(5L) === ((0L, 0L)))
    assert(out(6L) === ((1L, 1L)))
    assert(out.size === 6)
  }

  test("phrases that normalize to nothing are rejected loudly") {
    intercept[IllegalArgumentException] { new PhraseMatcher(Seq("!!!")) }
    intercept[IllegalArgumentException] { new PhraseMatcher(Seq.empty) }
  }
}
