package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class HistogramSketchSpec extends SparkTestBase {
  import spark.implicits._

  // 10 bins over [0, 100): values land mid-bin
  lazy val hs = new HistogramSketch(0.0, 100.0, 10)

  lazy val df = Seq(
    ("a", 5.0), ("a", 15.0), ("a", 15.0), ("a", 35.0),
    ("b", 95.0), ("b", -3.0), ("b", 250.0))  // out-of-range clamps to edges
    .toDF("g", "v")

  test("sketch: dense per-group count arrays with edge clamping") {
    val m = hs.sketch(df, "g", "v").as[(String, Seq[Long])].collect().toMap
    assert(m("a") === Seq(1L, 2L, 0L, 1L, 0L, 0L, 0L, 0L, 0L, 0L))
    assert(m("b") === Seq(1L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 2L))
  }

  test("merge identity: summed sub-sketches equal the direct sketch") {
    val sub = hs.sketch(df, "g", "v")
    val merged = sub.agg(hs.merge($"hist").as("hist"))
      .as[Seq[Long]].head()
    val direct = hs.sketch(df.withColumn("g", lit("all")), "g", "v")
      .as[(String, Seq[Long])].head()._2
    assert(merged === direct)
  }

  test("quantile interpolates inside the crossing bin") {
    // 4 values in bins 0,1,1,3 -> p=0.5 target 2.0: bin 1 (cum 1 before,
    // count 2) -> 10 + (2-1)/2 * 10 = 15
    val h = hs.sketch(df.where($"g" === "a"), "g", "v")
    val q = h.select(hs.quantile($"hist", 0.5).as("q")).as[Double].head()
    assert(q === 15.0)
  }

  test("p=0 and p=1 hit the first and last occupied bins") {
    val h = hs.sketch(df.where($"g" === "a"), "g", "v")
    val q0 = h.select(hs.quantile($"hist", 0.0)).as[Double].head()
    val q1 = h.select(hs.quantile($"hist", 1.0)).as[Double].head()
    assert(q0 === 0.0)   // lower edge of bin 0 (frac 0 of its first value)
    assert(q1 === 40.0)  // upper edge of bin 3 (frac 1 through it)
  }

  test("quantile agrees with exact percentile within one bin width on uniform data") {
    val wide = new HistogramSketch(0.0, 1000.0, 50)
    val u = (0 until 1000).map(i => ("g", i.toDouble)).toDF("g", "v")
    val h = wide.sketch(u, "g", "v")
    val exact = u.agg(expr("percentile(v, 0.9)")).as[Double].head()
    val est = h.select(wide.quantile($"hist", 0.9)).as[Double].head()
    assert(math.abs(est - exact) <= 20.0, s"est $est vs exact $exact")
  }

  test("empty histogram estimates NULL") {
    val empty = df.where(lit(false))
    val h = hs.sketch(empty.withColumn("g", lit("x")), "g", "v")
    assert(h.count() === 0)
    // an all-zero array (mergeable identity element) also returns NULL
    val z = spark.sql("SELECT 1").select(
      hs.quantile(array_repeat(lit(0L), 10), 0.5).as("q"))
    assert(z.collect().head.isNullAt(0))
  }
}
