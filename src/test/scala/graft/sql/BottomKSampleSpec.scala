package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sql.expressions.KMinValues
import graft.sql.{functions => gf}

class BottomKSampleSpec extends SparkTestBase {
  import spark.implicits._

  lazy val vals = (0 until 200).map(i => (s"g${i % 4}", s"v$i"))
    .toDF("g", "v")

  test("sample is the k distinct values with the smallest md5 hashes, in hash order") {
    val out = vals.where($"g" === "g0")
      .agg(gf.bottomKSample($"v", 5).as("s"))
      .as[Seq[String]].head()
    val expected = (0 until 200).filter(_ % 4 == 0).map(i => s"v$i")
      .sortBy(v => (KMinValues.hash56(v), v)).take(5)
    assert(out === expected)
  }

  test("duplicates never bias membership: the sample is over distinct values") {
    val dup = vals.unionByName(vals).unionByName(vals)
    val a = vals.groupBy($"g").agg(gf.bottomKSample($"v", 7).as("s"))
      .as[(String, Seq[String])].collect().toMap
    val b = dup.groupBy($"g").agg(gf.bottomKSample($"v", 7).as("s"))
      .as[(String, Seq[String])].collect().toMap
    assert(a === b)
  }

  test("fewer than k distinct values -> the whole set, still hash-ordered") {
    val out = Seq("a", "b", "a").toDF("v")
      .agg(gf.bottomKSample($"v", 10).as("s")).as[Seq[String]].head()
    assert(out.toSet === Set("a", "b"))
    assert(out === out.sortBy(v => (KMinValues.hash56(v), v)))
  }

  test("merge of per-group sketches equals sampling the union directly") {
    val perGroup = vals.groupBy($"g").agg(gf.bottomKSample($"v", 9).as("s"))
    val merged = perGroup.agg(gf.bottomKMerge($"s", 9).as("s"))
      .as[Seq[String]].head()
    val direct = vals.agg(gf.bottomKSample($"v", 9).as("s"))
      .as[Seq[String]].head()
    assert(merged === direct)
  }

  test("partitioning never changes the sample (mergeable across splits)") {
    val one = vals.repartition(1).agg(gf.bottomKSample($"v", 11).as("s"))
      .as[Seq[String]].head()
    val many = vals.repartition(13).agg(gf.bottomKSample($"v", 11).as("s"))
      .as[Seq[String]].head()
    assert(one === many)
  }

  test("nulls are skipped, not sampled") {
    val withNull = Seq(Some("a"), None, Some("b")).toDF("v")
    val out = withNull.agg(gf.bottomKSample($"v", 10).as("s"))
      .as[Seq[String]].head()
    assert(out.toSet === Set("a", "b"))
  }
}
