package graft.sql

import graft.SparkTestBase

class Scd2MergeSpec extends SparkTestBase {
  import spark.implicits._

  // k1: open 'a' since 0; k2: open 'x' since 5 plus a CLOSED historical
  // row; k3 has no updates
  lazy val dim = Seq(
    (1L, "a", 0L, Option.empty[Long]),
    (2L, "x", 5L, Option.empty[Long]),
    (2L, "w", 0L, Some(5L)),
    (3L, "z", 0L, Option.empty[Long]))
    .toDF("k", "segment", "valid_from", "valid_to")

  // k1: a->a (no-op) at 10, a->b at 20, b->a at 30; k2: x->y at 50
  lazy val ups = Seq(
    (1L, "a", 10L), (1L, "b", 20L), (1L, "a", 30L),
    (2L, "y", 50L))
    .toDF("k", "segment", "ts")

  private lazy val out = new Scd2Merge("k").apply(dim, ups, "segment", "ts")
    .as[(Long, String, Long, Option[Long])].collect().toSet

  test("changes open new versions and close the old ones") {
    assert(out.filter(_._1 == 1L) === Set(
      (1L, "a", 0L, Some(20L)),   // the t=10 'a' update was a no-op
      (1L, "b", 20L, Some(30L)),
      (1L, "a", 30L, None)))      // back to 'a' IS a new version
  }

  test("closed history passes through untouched; updates chain off the open row") {
    assert(out.filter(_._1 == 2L) === Set(
      (2L, "w", 0L, Some(5L)),
      (2L, "x", 5L, Some(50L)),
      (2L, "y", 50L, None)))
  }

  test("keys with no updates keep their open row") {
    assert(out.filter(_._1 == 3L) === Set((3L, "z", 0L, None)))
  }

  test("re-ingesting current values later is a no-op (no version bloat)") {
    val once = new Scd2Merge("k").apply(dim, ups, "segment", "ts")
    val noop = Seq((1L, "a", 40L), (2L, "y", 60L), (3L, "z", 45L))
      .toDF("k", "segment", "ts")
    val twice = new Scd2Merge("k").apply(once, noop, "segment", "ts")
      .as[(Long, String, Long, Option[Long])].collect().toSet
    assert(twice === out)
  }

  test("update at the open row's exact valid_from deterministically supersedes") {
    // k2's open row starts at t=5; an update at the SAME t=5 with a new
    // payload must sort AFTER the dim row (side tiebreak), closing it as a
    // zero-length version — not nondeterministically before it
    val sameT = Seq((2L, "q", 5L)).toDF("k", "segment", "ts")
    val res = new Scd2Merge("k").apply(dim, sameT, "segment", "ts")
      .as[(Long, String, Long, Option[Long])].collect().toSet
    assert(res.filter(_._1 == 2L) === Set(
      (2L, "w", 0L, Some(5L)),
      (2L, "x", 5L, Some(5L)),    // superseded immediately: [5, 5)
      (2L, "q", 5L, None)))
    // and a same-time DUPLICATE payload is suppressed, leaving the open row
    val dup = Seq((2L, "x", 5L)).toDF("k", "segment", "ts")
    val res2 = new Scd2Merge("k").apply(dim, dup, "segment", "ts")
      .as[(Long, String, Long, Option[Long])].collect().toSet
    assert(res2.filter(_._1 == 2L) === Set(
      (2L, "w", 0L, Some(5L)),
      (2L, "x", 5L, None)))
  }

  test("an update older than the open version start fails loudly (no overlapping history)") {
    // merging (2L, t=2) under k2's open row (valid_from=5) would fabricate
    // a version overlapping the closed [0,5) row — silent corruption the
    // old code happily produced; must raise instead
    val stale = Seq((2L, "q", 2L)).toDF("k", "segment", "ts")
    val e = intercept[Exception] {
      new Scd2Merge("k").apply(dim, stale, "segment", "ts").collect()
    }
    assert(e.getMessage.contains("precedes the open version"))
    // a key with NO open row (pure insert) is unaffected by the guard
    val insert = Seq((9L, "n", 1L)).toDF("k", "segment", "ts")
    val res = new Scd2Merge("k").apply(dim, insert, "segment", "ts")
      .as[(Long, String, Long, Option[Long])].collect().toSet
    assert(res.filter(_._1 == 9L) === Set((9L, "n", 1L, None)))
  }
}
