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

  test("NULL values stay NULL — never fabricated to a bound") {
    // greatest/least skip nulls, so the unguarded clamp turned a missing
    // observation into the learned lo — fabricated data in training
    val withNulls = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", None), ("a", Some(100.0))).toDF("g", "v")
    val out = new Winsorizer(0.25, 0.75).transform(withNulls, "g", "v")
    assert(out.count() === 5) // row-preserving
    assert(out.where($"v".isNull && $"v_wins".isNotNull).count() === 0,
      "a NULL input must not be clamped into a real value")
    assert(out.where($"v".isNull).count() === 1)
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

  test("approx bounds stay within tolerance of exact on real-cardinality data") {
    // the 100 TB path: KLL-sketch percentiles vs the exact aggregate on
    // the sf0.01 events table; rank error <= 1/accuracy, so at accuracy
    // 10000 the bounds should land within a fraction of a percent of the
    // value range per group
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    val exact = new Winsorizer(0.05, 0.95).bounds(ev, "event_type", "value")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = new Winsorizer(0.05, 0.95, approx = true).bounds(ev, "event_type", "value")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val spans = ev.groupBy(col("event_type"))
      .agg((max(col("value")) - min(col("value"))).as("span"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(exact.keySet === approx.keySet)
    for (g <- exact.keys) {
      val span = spans(g)
      assert(math.abs(exact(g)._1 - approx(g)._1) <= 0.02 * span,
        s"group $g lo: exact=${exact(g)._1} approx=${approx(g)._1}")
      assert(math.abs(exact(g)._2 - approx(g)._2) <= 0.02 * span,
        s"group $g hi: exact=${exact(g)._2} approx=${approx(g)._2}")
    }
  }

  test("null group keys are clamped, not dropped") {
    import spark.implicits._
    val d = Seq[(String, Double)]((null, 1.0), (null, 100.0), ("g", 5.0))
      .toDF("g", "v")
    val out = new Winsorizer(0.25, 0.75).transform(d, "g", "v")
    assert(out.count() === 3L) // row-preserving incl. the null group
  }
}
