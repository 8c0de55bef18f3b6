package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sql.expressions.WeightedBottomK
import graft.sql.{functions => gf}

class WeightedBottomKSpec extends SparkTestBase {
  import spark.implicits._

  lazy val vals = (0 until 120).map(i => (s"g${i % 3}", s"v$i", 1.0 + (i % 7)))
    .toDF("g", "v", "w")

  private def expected(vs: Seq[(String, Double)], k: Int): Seq[(String, Double)] =
    vs.sortBy { case (v, w) => (WeightedBottomK.key(v, w), v) }.take(k)

  test("sample is the k smallest Efraimidis-Spirakis keys") {
    val out = vals.where($"g" === "g0")
      .agg(gf.weightedBottomK($"v", $"w", 5).as("s"))
      .select(expr("transform(s, e -> struct(e.v, e.w))"))
      .as[Seq[(String, Double)]].head()
    val in = (0 until 120).filter(_ % 3 == 0).map(i => (s"v$i", 1.0 + (i % 7)))
    assert(out === expected(in, 5))
  }

  test("higher weight raises selection probability (statistical sanity)") {
    // two classes of 500 values, weight 10 vs 1: the heavy class should
    // dominate a k=50 sample (deterministically, given the fixed coins)
    val big = (0 until 1000).map(i =>
      (s"x$i", if (i < 500) 10.0 else 1.0)).toDF("v", "w")
    val picked = big.agg(gf.weightedBottomK($"v", $"w", 50).as("s"))
      .select(expr("transform(s, e -> e.v)")).as[Seq[String]].head()
    val heavy = picked.count(_.drop(1).toInt < 500)
    assert(heavy > 35, s"only $heavy/50 from the weight-10 class")
  }

  test("zero/negative/null weights and null values are skipped") {
    val mixed = Seq(
      (Some("a"), Some(1.0)), (Some("b"), Some(0.0)), (Some("c"), Some(-2.0)),
      (Some("d"), None), (None, Some(3.0)), (Some("e"), Some(2.0)))
      .toDF("v", "w")
    val out = mixed.agg(gf.weightedBottomK($"v", $"w", 10).as("s"))
      .select(expr("transform(s, e -> e.v)")).as[Seq[String]].head()
    assert(out.toSet === Set("a", "e"))
  }

  test("partitioning never changes the sample") {
    val one = vals.repartition(1).agg(gf.weightedBottomK($"v", $"w", 9).as("s"))
      .select(expr("transform(s, e -> e.v)")).as[Seq[String]].head()
    val many = vals.repartition(13).agg(gf.weightedBottomK($"v", $"w", 9).as("s"))
      .select(expr("transform(s, e -> e.v)")).as[Seq[String]].head()
    assert(one === many)
  }

  test("merge of per-group sketches equals sampling the union directly") {
    val perGroup = vals.groupBy($"g").agg(gf.weightedBottomK($"v", $"w", 7).as("s"))
    val merged = perGroup.agg(gf.weightedBottomKMerge($"s", 7).as("s"))
      .select(expr("transform(s, e -> struct(e.v, e.w))"))
      .as[Seq[(String, Double)]].head()
    val direct = vals.agg(gf.weightedBottomK($"v", $"w", 7).as("s"))
      .select(expr("transform(s, e -> struct(e.v, e.w))"))
      .as[Seq[(String, Double)]].head()
    assert(merged === direct)
  }

  test("duplicate values contribute once") {
    val dup = vals.unionByName(vals)
    val a = vals.agg(gf.weightedBottomK($"v", $"w", 8).as("s"))
      .select(expr("transform(s, e -> e.v)")).as[Seq[String]].head()
    val b = dup.agg(gf.weightedBottomK($"v", $"w", 8).as("s"))
      .select(expr("transform(s, e -> e.v)")).as[Seq[String]].head()
    assert(a === b)
  }
}
