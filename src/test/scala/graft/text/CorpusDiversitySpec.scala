package graft.text

import graft.SparkTestBase

/** Entropy/TTR vs hand-computed values. */
class CorpusDiversitySpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    // uniform: 4 types x 1 -> H = ln(4), norm = 1
    ("u", "aa bb cc dd"),
    // skewed: aa=3, bb=1 -> H = ln(4) - (3 ln 3)/4
    ("s", "aa aa aa bb"),
    // degenerate: single type -> H = 0, norm 0 (guarded ln(1) division)
    ("d", "aa aa aa")).toDF("source", "text")

  private lazy val got =
    new CorpusDiversity().stats(docs)
      .as[(String, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap

  test("uniform distribution has maximal normalized entropy") {
    val (_, n, types, ttr, h, nh) = got("u")
    assert(n === 4L && types === 4L)
    assert(math.abs(ttr - 1.0) < 1e-9)
    assert(math.abs(h - math.log(4)) < 1e-6)
    assert(math.abs(nh - 1.0) < 1e-6)
  }

  test("skewed distribution matches the closed form") {
    val (_, n, types, ttr, h, nh) = got("s")
    val expH = math.log(4) - 3 * math.log(3) / 4
    assert(n === 4L && types === 2L && math.abs(ttr - 0.5) < 1e-9)
    assert(math.abs(h - expH) < 1e-6)
    assert(math.abs(nh - expH / math.log(2)) < 1e-6)
  }

  test("single-type group reports zero entropy without dividing by ln(1)") {
    val (_, n, types, _, h, nh) = got("d")
    assert(n === 3L && types === 1L)
    assert(h === 0.0 && nh === 0.0)
  }
}
