package graft.sql

import graft.SparkTestBase

/** Four-way diff classification on a hand-built pair of snapshots. */
class SnapshotDiffSpec extends SparkTestBase {
  import spark.implicits._

  test("classifies added, removed, changed, unchanged") {
    val v1 = Seq((1L, "same"), (2L, "old text"), (3L, "goes away")).toDF("id", "body")
    val v2 = Seq((1L, "same"), (2L, "new text"), (4L, "brand new")).toDF("id", "body")
    val got = SnapshotDiff.byKey(v1, v2, "id", "body")
      .select("id", "status").as[(Long, String)].collect().toMap
    assert(got === Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("null-to-content transitions read as changed, not unchanged") {
    val v1 = Seq[(Long, String)]((1L, null), (2L, "x")).toDF("id", "body")
    val v2 = Seq[(Long, String)]((1L, "now real"), (2L, null)).toDF("id", "body")
    val got = SnapshotDiff.byKey(v1, v2, "id", "body")
      .select("id", "status").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "changed", 2L -> "changed"))
  }

  test("identical snapshots report everything unchanged") {
    val v = Seq((1L, "a"), (2L, "b")).toDF("id", "body")
    val statuses = SnapshotDiff.byKey(v, v, "id", "body")
      .select("status").as[String].collect().toSet
    assert(statuses === Set("unchanged"))
  }
}
