package graft.text

import graft.SparkTestBase

/** Deletion-neighborhood join vs the naive edit-distance definition. */
class EditDistanceJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def pairs(strs: Seq[String], maxLen: Int = 64, k: Int = 1): Set[(String, String, Long)] =
    new EditDistanceJoin(k = k, maxLen = maxLen).pairs(strs.toDF("s"), "s")
      .as[(String, String, Long)].collect().toSet

  test("finds substitution, insertion, and deletion pairs") {
    val got = pairs(Seq("cat", "cut", "cart", "ca", "dog"))
    assert(got === Set(
      ("cat", "cut", 1L),   // substitution
      ("cart", "cat", 1L),  // deletion
      ("ca", "cat", 1L)))   // insertion ("ca"/"cut" is 2, "ca"/"cart" is 2)
  }

  test("deletion-key collisions at distance 2 are verified away") {
    // "x12" and "x21" share the deletion variant "x1"/"x2" path but are
    // distance 2 (one substitution each side) -> must not appear
    assert(pairs(Seq("x12", "x21")) === Set.empty)
  }

  test("matches the naive all-pairs definition on a digit-neighbor set") {
    val strs = for (i <- 0 until 40) yield f"Customer#$i%03d"
    val naive = (for {
      a <- strs; b <- strs if a < b
      if levenshtein(a, b) == 1
    } yield (a, b, 1L)).toSet
    assert(pairs(strs) === naive)
    assert(naive.nonEmpty)
  }

  test("duplicate input strings collapse and never self-pair") {
    assert(pairs(Seq("aa", "aa", "ab")) === Set(("aa", "ab", 1L)))
  }

  test("strings over maxLen are excluded") {
    assert(pairs(Seq("short", "shorty", "x" * 100, "x" * 101), maxLen = 64) ===
      Set(("short", "shorty", 1L)))
  }

  test("k=2 finds two-edit pairs: double substitution, transposition, 2-indel") {
    val got = pairs(Seq("abcdef", "azcdez", "acbdef", "abcdefgh", "zzzzzz"), k = 2)
    assert(got.contains(("abcdef", "azcdez", 2L)))   // two substitutions
    assert(got.contains(("abcdef", "acbdef", 2L)))   // adjacent transposition
    assert(got.contains(("abcdef", "abcdefgh", 2L))) // two insertions
    assert(!got.exists(p => p._1 == "zzzzzz" || p._2 == "zzzzzz")) // far from all
    assert(got.forall(p => p._3 >= 1L && p._3 <= 2L))
  }

  test("k=2 matches the naive all-pairs definition on a random-ish set") {
    val strs = for (i <- 0 until 30) yield f"Customer#$i%03d"
    val naive = (for {
      a <- strs; b <- strs if a < b
      d = levenshtein(a, b) if d <= 2
    } yield (a, b, d.toLong)).toSet
    assert(pairs(strs, k = 2) === naive)
    assert(naive.exists(_._3 == 2L) && naive.exists(_._3 == 1L))
  }

  // reference implementation for the property check
  private def levenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
