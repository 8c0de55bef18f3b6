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

  test("identical snapshots report everything unchanged") {
    val v = Seq((1L, "a"), (2L, "b")).toDF("id", "body")
    val statuses = SnapshotDiff.byKey(v, v, "id", "body")
      .select("status").as[String].collect().toSet
    assert(statuses === Set("unchanged"))
  }
}
