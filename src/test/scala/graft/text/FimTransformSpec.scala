package graft.text

import graft.SparkTestBase

class FimTransformSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "one two three"),
    (3L, "solo"),
    (4L, ""),
    (5L, (0 until 50).map(i => s"t$i").mkString(" ")))
    .toDF("doc_id", "text")

  private lazy val out =
    FimTransform.transform(docs, ratePercent = 100, salt = "spec")
      .select("doc_id", "text", "fim_text", "fim_applied")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3)))
      .sortBy(_._1)

  test("PSM rearrangement preserves the exact token multiset and order") {
    out.foreach { case (id, text, fim, applied) =>
      assert(applied, s"doc $id should be selected at rate 100")
      val toks = fim.split("\\s+").filter(_.nonEmpty).toSeq
      val iPre = toks.indexOf("<fim_prefix>")
      val iSuf = toks.indexOf("<fim_suffix>")
      val iMid = toks.indexOf("<fim_middle>")
      assert(iPre === 0 && iSuf > iPre && iMid > iSuf, s"doc $id marker order")
      val prefix = toks.slice(iPre + 1, iSuf)
      val suffix = toks.slice(iSuf + 1, iMid)
      val middle = toks.drop(iMid + 1)
      val orig = text.split("\\s+").filter(_.nonEmpty).toSeq
      // reassembling P + M + S in document order recovers the original
      assert(prefix ++ middle ++ suffix === orig, s"doc $id")
    }
  }

  test("empty doc yields just the three markers; determinism holds") {
    val (_, _, fim, _) = out.find(_._1 == 4L).get
    assert(fim === "<fim_prefix> <fim_suffix> <fim_middle>")
    val again = FimTransform.transform(docs, ratePercent = 100, salt = "spec")
      .select("fim_text").as[String].collect().sorted
    assert(again.toSeq === out.map(_._3).sorted.toSeq)
  }

  test("rate 0 passes every doc through space-normalized, unflagged") {
    val none = FimTransform.transform(docs, ratePercent = 0, salt = "spec")
      .select("doc_id", "fim_text", "fim_applied").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).sortBy(_._1)
    none.foreach { case (id, fim, applied) =>
      assert(!applied, s"doc $id")
      val orig = docs.where($"doc_id" === id).select("text").head().getString(0)
      assert(fim === orig.split("\\s+").filter(_.nonEmpty).mkString(" "), s"doc $id")
    }
  }

  test("selection rate splits the corpus deterministically by doc id") {
    val half = FimTransform.transform(docs, ratePercent = 50, salt = "spec")
      .select("doc_id", "fim_applied").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    // membership must equal the coin computed INDEPENDENTLY here — pins
    // the exact md5 string, the 32-bit slice, and the strict-< threshold
    val expected = (1L to 5L).map { id =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"spec:$id:sel".getBytes("UTF-8"))
      val hex = md.take(4).map(b => f"$b%02x").mkString
      id -> (java.lang.Long.parseLong(hex, 16) % 100 < 50)
    }.toMap
    assert(half === expected)
  }
}
