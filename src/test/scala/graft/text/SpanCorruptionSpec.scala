package graft.text

import graft.SparkTestBase

class SpanCorruptionSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "Case IS preserved, and punctuation! too?  double  spaces collapse"),
    (3L, "one"),
    (4L, ""),
    (5L, (0 until 200).map(i => s"w$i").mkString(" ")))
    .toDF("doc_id", "text")

  private lazy val out =
    SpanCorruption.corrupt(docs, ratePercent = 25, salt = "spec")
      .select("doc_id", "text", "corrupted_input", "target")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)

  /** Merge input and target at matching sentinels — must reconstruct the
    * original whitespace-split token stream exactly.
    */
  private def reconstruct(input: String, target: String): Seq[String] = {
    val sentinel = "<extra_id_(\\d+)>".r
    val spans: Map[Int, Seq[String]] = {
      val parts = sentinel.split(target).map(_.trim)
      val ids = sentinel.findAllMatchIn(target).map(_.group(1).toInt).toSeq
      // parts(0) is the (empty) prefix before the first sentinel; span k's
      // tokens sit between sentinel k and the next sentinel
      ids.zip(parts.drop(1).map(p =>
        if (p.isEmpty) Seq.empty[String] else p.split("\\s+").toSeq)).toMap
    }
    input.split("\\s+").filter(_.nonEmpty).toSeq.flatMap {
      case s if sentinel.matches(s) =>
        spans(sentinel.findFirstMatchIn(s).get.group(1).toInt)
      case t => Seq(t)
    }
  }

  test("reconstruction: input + target merge back to the original tokens") {
    out.foreach { case (id, text, input, target) =>
      val orig = text.split("\\s+").filter(_.nonEmpty).toSeq
      assert(reconstruct(input, target) === orig, s"doc $id")
    }
  }

  test("sentinels are dense 0..n in both input and target; target ends with the terminal") {
    val sentinel = "<extra_id_(\\d+)>".r
    out.foreach { case (id, _, input, target) =>
      val inIds = sentinel.findAllMatchIn(input).map(_.group(1).toInt).toSeq
      val tgtIds = sentinel.findAllMatchIn(target).map(_.group(1).toInt).toSeq
      assert(inIds === (0 until inIds.size), s"doc $id input sentinels not dense")
      assert(tgtIds === (0 to inIds.size), s"doc $id target missing terminal sentinel")
      assert(target.endsWith(s"<extra_id_${inIds.size}>"), s"doc $id")
    }
  }

  test("empty text yields empty input and the bare terminal sentinel") {
    val (_, _, input, target) = out.find(_._1 == 4L).get
    assert(input === "")
    assert(target === "<extra_id_0>")
  }

  test("masking is salt- and id-deterministic, case/punct preserved") {
    val again = SpanCorruption.corrupt(docs, ratePercent = 25, salt = "spec")
      .select("doc_id", "corrupted_input", "target").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(again.toSeq === out.map(t => (t._1, t._3, t._4)).toSeq)

    val other = SpanCorruption.corrupt(docs, ratePercent = 25, salt = "other")
      .select("corrupted_input").as[String].collect().sorted
    assert(other.toSeq !== out.map(_._3).sorted.toSeq, "salt must change the masks")

    // the long doc keeps case-sensitive tokens intact outside masks
    val (_, _, input2, _) = out.find(_._1 == 2L).get
    assert(input2.split("\\s+").filter(!_.startsWith("<extra_id_"))
      .forall(t => Seq("Case", "IS", "preserved,", "and", "punctuation!",
        "too?", "double", "spaces", "collapse").contains(t)))
  }

  test("rate 0 masks nothing; rate 100 masks everything into one span") {
    val none = SpanCorruption.corrupt(docs.where($"doc_id" === 1L), ratePercent = 0)
      .select("corrupted_input", "target").head()
    assert(none.getString(0) ===
      "the quick brown fox jumps over the lazy dog near the river bank today")
    assert(none.getString(1) === "<extra_id_0>")

    val all = SpanCorruption.corrupt(docs.where($"doc_id" === 1L), ratePercent = 100)
      .select("corrupted_input", "target").head()
    assert(all.getString(0) === "<extra_id_0>")
    assert(all.getString(1) ===
      "<extra_id_0> the quick brown fox jumps over the lazy dog near the river bank today <extra_id_1>")
  }
}
