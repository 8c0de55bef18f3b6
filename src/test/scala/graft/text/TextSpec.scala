package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TextSpec extends SparkTestBase {
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "The quick brown fox, and the lazy dog!"),
    (2L, "der Hund und die Katze sind nicht da"),
    (3L, "xyzzy plugh qwerty"),
    (4L, "a b c 123 !!!"))
    .toDF("doc_id", "text")

  private def profiled = new TextProfiler().setTextCol("text").transform(docs)
    .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("token and char counts") {
    val p = profiled
    assert(p(1L).getAs[Int]("n_tokens") === 8)
    assert(p(3L).getAs[Int]("n_tokens") === 3)
    assert(p(1L).getAs[Int]("n_chars") === 38)
  }

  test("punctuation ratio counts non-alphanumeric-space chars") {
    val p = profiled
    assert(p(3L).getAs[Double]("punct_ratio") === 0.0)
    assert(p(1L).getAs[Double]("punct_ratio") === 2.0 / 38)
    assert(p(4L).getAs[Double]("punct_ratio") === 3.0 / 13)
  }

  test("language ID picks the max-stopword-hit language") {
    val p = profiled
    assert(p(1L).getAs[String]("lang_guess") === "en") // the×2, and
    assert(p(2L).getAs[String]("lang_guess") === "de") // der, und, die, nicht
    assert(p(3L).getAs[String]("lang_guess") === "und") // no hits anywhere
  }

  test("stopword ratio is english hits over tokens") {
    assert(profiled(1L).getAs[Double]("stopword_ratio") === 3.0 / 8)
  }

  test("bpe estimate counts alpha runs, digit runs, symbols") {
    // "a b c 123 !!!" → a, b, c, 123, !, !, ! = 7
    assert(profiled(4L).getAs[Int]("bpe_tokens") === 7)
  }

  test("fingerprint is order-sensitive and deterministic") {
    val fp = udf((s: String) => s) // no-op to force two plans
    val f1 = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val f2 = Seq((1L, "gamma beta alpha")).toDF("doc_id", "text")
    def fpOf(df: org.apache.spark.sql.DataFrame): Long =
      df.select(TextFunctions.fingerprint($"text")).as[Long].head()
    assert(fpOf(f1) !== fpOf(f2))
    assert(fpOf(f1) === fpOf(f1))
    assert(fpOf(f1) >= 0L && fpOf(f1) < 1000000007L)
  }

  test("quality score stays in [0,1] and favors natural text") {
    val p = profiled
    val q1 = p(1L).getAs[Double]("quality")
    val q3 = p(3L).getAs[Double]("quality")
    assert(q1 >= 0.0 && q1 <= 1.0 && q3 >= 0.0 && q3 <= 1.0)
    assert(q1 > q3) // english sentence beats nonsense tokens
  }

  test("profiler is shuffle-free (no exchange in the plan)") {
    val plan = new TextProfiler().setTextCol("text").transform(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("redactor masks emails, urls, digit runs; counts spans once each") {
    val df = Seq(
      (1L, "mail me at jane.doe+x@corp.example.org or visit https://a.example/b?q=1 ref 123456789"),
      (2L, "short 12345 stays, 123456 goes"),
      (3L, "nothing to hide"))
      .toDF("doc_id", "text")
    val out = new TextRedactor().transform(df)
      .select($"doc_id", $"redacted", $"n_redactions")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L)._1 === "mail me at <email> or visit <url> ref <num>")
    assert(out(1L)._2 === 3L)
    assert(out(2L)._1 === "short 12345 stays, <num> goes")
    assert(out(2L)._2 === 1L)
    assert(out(3L) === (("nothing to hide", 0L)))
  }

  test("redactor is shuffle-free") {
    val df = Seq((1L, "a@b.co")).toDF("doc_id", "text")
    val plan = new TextRedactor().transform(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("contamination: full overlap for benchmark members, zero for disjoint") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),   // benchmark member
      (2L, "alpha beta gamma delta epsilon other"),  // shares 2 of its 5-grams? no: 1 of 2
      (3L, "one two three four five six seven"),     // disjoint
      (4L, "tiny doc"))                              // < 5 tokens -> no grams
      .toDF("doc_id", "text")
    val bench = corpus.where($"doc_id" === 1L)
    val out = new ContaminationChecker(n = 5).check(corpus, bench)
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getAs[Double]("overlap_ratio") === 1.0)
    // doc 2's 5-grams: [alpha..epsilon] (hit), [beta..other] (miss)
    assert(out(2L).getAs[Long]("n_grams") === 2L)
    assert(out(2L).getAs[Long]("hit_grams") === 1L)
    assert(out(2L).getAs[Double]("overlap_ratio") === 0.5)
    assert(out(3L).getAs[Long]("hit_grams") === 0L)
    assert(out(4L).getAs[Long]("n_grams") === 0L)
    assert(out(4L).getAs[Double]("overlap_ratio") === 0.0)
  }

  test("contamination plan broadcasts the benchmark gram set") {
    val corpus = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val plan = new ContaminationChecker(n = 5).check(corpus, corpus)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"benchmark side not broadcast:\n$plan")
  }

  test("repetition stats: hand-computed duplicate and bigram dominance") {
    val reps = Seq(
      (1L, "spam spam spam spam"),      // 4 tokens, 1 distinct; bigrams all "spam spam"
      (2L, "one two three four"),       // all distinct, 3 distinct bigrams
      (3L, "solo"))                     // single token -> no bigrams
      .toDF("doc_id", "text")
    val out = new RepetitionStats().setIdCol("doc_id").setTextCol("text")
      .transform(reps).collect().map(r => r.getLong(0) -> r).toMap

    val r1 = out(1L)
    assert(r1.getAs[Long]("n_tokens") === 4L)
    assert(r1.getAs[Long]("n_distinct_tokens") === 1L)
    assert(r1.getAs[Double]("dup_token_ratio") === 0.75)
    assert(r1.getAs[Long]("top_bigram_count") === 3L)
    assert(r1.getAs[Long]("n_bigrams") === 3L)
    assert(r1.getAs[Double]("top_bigram_frac") === 1.0)

    val r2 = out(2L)
    assert(r2.getAs[Double]("dup_token_ratio") === 0.0)
    assert(r2.getAs[Long]("top_bigram_count") === 1L)
    assert(r2.getAs[Long]("n_bigrams") === 3L)
    assert(r2.getAs[Double]("top_bigram_frac") === 0.333333)

    val r3 = out(3L)
    assert(r3.getAs[Long]("n_tokens") === 1L)
    assert(r3.getAs[Long]("top_bigram_count") === 0L)
    assert(r3.getAs[Long]("n_bigrams") === 0L)
    assert(r3.getAs[Double]("top_bigram_frac") === 0.0)
  }
}
