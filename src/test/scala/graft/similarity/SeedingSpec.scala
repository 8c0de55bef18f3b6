package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SeedingSpec extends SparkTestBase {
  import spark.implicits._

  test("k lowest ids ranked dense 0-based, payload carried, one corpus pass") {
    val df = Seq((30L, "c"), (10L, "a"), (20L, "b"), (40L, "d"))
      .toDF("id", "payload")
    val out = Seeding.kLowestIdRanks(df, "id", 3, "rank")
      .select($"id", $"rank", $"payload").as[(Long, Long, String)]
      .collect().sortBy(_._1)
    assert(out.toSeq === Seq((10L, 0L, "a"), (20L, 1L, "b"), (30L, 2L, "c")))
  }

  test("NULL ids are excluded instead of silently consuming a seed slot") {
    // a NULL would win the ordering, then vanish from every downstream
    // equi-join — a silently missing seed/cell
    val df = Seq((Some(5L), "x"), (None, "n"), (Some(1L), "y"), (Some(9L), "z"))
      .toDF("id", "payload")
    val out = Seeding.kLowestIdRanks(df, "id", 2, "rank")
      .select($"id", $"rank").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, 0L), (5L, 1L)))
  }

  test("string ids rank by lexicographic order (no numeric cast anywhere)") {
    val df = Seq(("doc-b", 2), ("doc-a", 1), ("doc-c", 3)).toDF("id", "v")
    val out = Seeding.kLowestIdRanks(df, "id", 2, "rank")
      .select($"id", $"rank").as[(String, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(("doc-a", 0L), ("doc-b", 1L)))
  }

  test("duplicate ids share a rank; ranks stay dense over distinct ids") {
    val df = Seq((1L, "a"), (1L, "a2"), (2L, "b")).toDF("id", "payload")
    val out = Seeding.kLowestIdRanks(df, "id", 3, "rank")
      .select($"id", $"rank").as[(Long, Long)].collect()
    assert(out.filter(_._1 == 1L).map(_._2).toSet === Set(0L))
    assert(out.filter(_._1 == 2L).map(_._2).toSet === Set(1L))
  }
}
