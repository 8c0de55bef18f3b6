package graft.feature

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class WinsorizerSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq(
    ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0),
    ("b", -50.0), ("b", 10.0), ("b", 11.0), ("b", 12.0), ("b", 13.0)
  ).toDF("g", "v")

  test("clamps to per-group quantile bounds") {
    val out = new Winsorizer(0.25, 0.75).transform(df, "g", "v")
      .select($"g", $"v", $"v_wins").as[(String, Double, Double)].collect().toSet
    // group a: p25 = 2.0, p75 = 4.0 -> 1.0 clamps up, 100.0 clamps down
    assert(out.contains(("a", 1.0, 2.0)) && out.contains(("a", 100.0, 4.0)))
    assert(out.contains(("a", 3.0, 3.0)))
    // group b: p25 = 10.0, p75 = 12.0
    assert(out.contains(("b", -50.0, 10.0)) && out.contains(("b", 13.0, 12.0)))
  }

  test("interior values and row count are preserved") {
    val out = new Winsorizer(0.05, 0.95).transform(df, "g", "v")
    assert(out.count() === df.count())
    val untouched = out.where($"v" === $"v_wins").count()
    assert(untouched >= 6) // only the extremes move at [5%, 95%]
  }

  test("bounds table is one row per group") {
    val b = new Winsorizer().bounds(df, "g", "v")
    assert(b.count() === 2)
    assert(b.columns.toSeq === Seq("g", "lo", "hi"))
  }

  test("rejects inverted quantiles") {
    intercept[IllegalArgumentException](new Winsorizer(0.9, 0.1))
  }

  test("null group keys are clamped, not dropped") {
    import spark.implicits._
    val d = Seq[(String, Double)]((null, 1.0), (null, 100.0), ("g", 5.0))
      .toDF("g", "v")
    val out = new Winsorizer(0.25, 0.75).transform(d, "g", "v")
    assert(out.count() === 3L) // row-preserving incl. the null group
  }
}
