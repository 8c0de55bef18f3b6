package graft.text

import java.util.Locale

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dedup.TextNormalizer

/** The text family under a tr-TR DEFAULT locale — the classic JVM trap:
  * `"WIN".toLowerCase` becomes `"wın"` (dotless ı) and `"i".toUpperCase`
  * becomes `"İ"` (dotted İ), so any driver-side case-fold that forgot
  * `Locale.ROOT` silently changes tokens, and `String.format`-based
  * number rendering (the f-interpolator) switches to comma decimals.
  * Every test here first proves the trap is REAL in this JVM (so a
  * future JDK change can't make the suite vacuous), then asserts the
  * operator produces the Locale.ROOT behavior anyway.
  *
  * The default locale is flipped in beforeAll and restored in afterAll.
  * Suites can run concurrently in this JVM; the only cross-suite effect
  * is cosmetic (comma decimals in failure MESSAGES of other suites built
  * with the f-interpolator) — nothing in the product or test harness
  * parses locale-formatted numbers.
  */
class TrLocaleSpec extends SparkTestBase
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private var saved: Locale = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    saved = Locale.getDefault
    Locale.setDefault(new Locale("tr"))
  }

  override def afterAll(): Unit = {
    Locale.setDefault(saved)
    super.afterAll()
  }

  test("the tr-TR case-fold trap is real, and normalize/tokens ignore it") {
    assert("WIN".toLowerCase === "wın") // default-locale fold IS turkish
    val docs = Seq((1L, "you can WIN BIG prizes"), (2L, "nothing here"))
      .toDF("doc_id", "text")
    // Spark's lower() is locale-independent; the whole normalize chain
    // must yield ASCII tokens regardless of the JVM default
    val toks = docs.select($"doc_id", TextNormalizer.tokens($"text").as("tl"))
      .as[(Long, Seq[String])].collect().toMap
    assert(toks(1L) === Seq("you", "can", "win", "big", "prizes"))
  }

  test("PhraseMatcher matches an upper-case phrase under tr defaults") {
    // the phrase table is normalized DRIVER-side: a default-locale fold
    // would turn "WIN" into w-dotless-ı-n, strip the ı, and never match
    val docs = Seq((1L, "you can WIN big"), (2L, "no luck")).toDF("doc_id", "text")
    val hits = new PhraseMatcher(Seq("WIN", "Free Money")).counts(docs)
      .select($"doc_id", $"n_hits").as[(Long, Long)].collect().toMap
    assert(hits.getOrElse(1L, 0L) === 1L)
    assert(hits.getOrElse(2L, 0L) === 0L)
  }

  test("BPE training and segmentation are locale-stable") {
    val docs = Seq((1L, "III III III"), (2L, "Inn Inn inn")).toDF("doc_id", "text")
    val trainer = new BpeTrainer(numMerges = 3)
    val merges = trainer.fit(docs)
    // tokens reaching the trainer are Spark-lowercased ASCII — under a
    // leaked default-locale fold "III" would have become ı-runs and the
    // learned pairs non-ASCII
    val pairs = merges.select("left", "right").as[(String, String)].collect()
    pairs.foreach { case (l, r) =>
      assert((l + r).forall(c => c >= 'a' && c <= 'z'), s"non-ASCII merge ($l,$r)")
    }
    val seg = trainer.segment(docs, merges)
      .select("subwords").as[Seq[String]].collect()
    assert(seg.flatten.forall(_.forall(c => c >= 'a' && c <= 'z')))
  }

  test("TextRedactor's explicit ASCII classes redact identically under tr") {
    val docs = Seq((1L, "mail WIN@EXAMPLE.COM or call 5551234567"))
      .toDF("doc_id", "text")
    val out = new TextRedactor().transform(docs)
      .select("redacted").as[String].head()
    assert(out === "mail <email> or call <num>")
  }

  test("bench/verify JSON numbers stay dot-decimal under comma-decimal defaults") {
    assert(f"${1.5}%.1f" === "1,5") // the f-interpolator trap IS live
    assert(graft.Bench.jsonNum(1.5, 1) === "1.5")
    assert(graft.Bench.jsonNum(134.8664, 3) === "134.866")
    assert(graft.Bench.jsonNum(7.0, 0) === "7")
  }
}
