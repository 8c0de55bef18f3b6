package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LinkageScorerSpec extends SparkTestBase {
  import spark.implicits._

  lazy val pairs = Seq(
    (1L, true, true),   // both agree
    (2L, true, false),
    (3L, false, true),
    (4L, false, false)) // both disagree
    .toDF("id", "a1", "a2")

  private val f1 = LinkageField(col("a1"), 0.9, 0.1)  // w: +log2(9) / -log2(9)
  private val f2 = LinkageField(col("a2"), 0.8, 0.2)  // w: +2 / -2

  test("weights sum per the Fellegi-Sunter formula; verdicts by threshold") {
    val w9 = math.log(9.0) / math.log(2.0)
    val out = new LinkageScorer(Seq(f1, f2), upper = 4.0, lower = 0.0)
      .score(pairs)
      .select($"id", $"weight", $"verdict")
      .as[(Long, Double, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-12
    assert(close(out(1L)._1, w9 + 2.0) && out(1L)._2 === "match")
    assert(close(out(2L)._1, w9 - 2.0) && out(2L)._2 === "possible")
    assert(close(out(3L)._1, -w9 + 2.0) && out(3L)._2 === "non_match")
    assert(close(out(4L)._1, -w9 - 2.0) && out(4L)._2 === "non_match")
  }

  test("degenerate fields are rejected loudly") {
    intercept[IllegalArgumentException] { LinkageField(col("a1"), 0.1, 0.9) }
    intercept[IllegalArgumentException] { LinkageField(col("a1"), 1.0, 0.5) }
    intercept[IllegalArgumentException] {
      new LinkageScorer(Seq(f1), upper = 0.0, lower = 1.0)
    }
    intercept[IllegalArgumentException] {
      new LinkageScorer(Seq.empty, 1.0, 0.0)
    }
  }
}
