package graft.stats

import graft.SparkTestBase

/** Exactness against a sorted reference at the ceil(q·n) convention,
  * duplicate/skew structure, narrowing-loop engagement, null/NaN
  * exclusion, and degenerate inputs for the distributed selection.
  */
class ExactQuantileSpec extends SparkTestBase {
  import spark.implicits._

  /** reference: k-th smallest with k = max(1, ceil(q·n)) */
  private def ref(values: Seq[Double], q: Double): Double = {
    val s = values.sorted
    s(math.max(1L, math.ceil(q * s.size).toLong).toInt - 1)
  }

  private val qs = Seq(0.01, 0.25, 0.5, 0.9, 0.99, 0.999, 1.0)

  test("exact at every tested quantile on a deterministic skewed fixture") {
    // heavy-tail-ish deterministic mix: squares, a dense duplicate block,
    // and a handful of extreme outliers
    val values = (1 to 5000).map(i => (i % 71).toDouble * (i % 71)) ++
      Seq.fill(800)(42.0) ++ Seq(1e9, 2e9, -5e8)
    val df = values.toDF("x")
    // maxFinal far below n so the narrowing loop must actually run
    val got = ExactQuantile.compute(df, "x", qs, numBuckets = 16, maxFinal = 50L)
    qs.foreach { q =>
      assert(got(q) === Some(ref(values, q)), s"q=$q")
    }
  }

  test("all-duplicate column collapses without a final sort") {
    val df = Seq.fill(10000)(7.25).toDF("x")
    val got = ExactQuantile.compute(df, "x", Seq(0.5, 0.999), maxFinal = 10L)
    assert(got(0.5) === Some(7.25) && got(0.999) === Some(7.25))
  }

  test("nulls and NaN are not observations; empty input yields None") {
    val vals: Seq[java.lang.Double] = Seq(1.0, null, Double.NaN, 3.0, 2.0)
    val got = ExactQuantile.compute(vals.toDF("x"), "x", Seq(0.5))
    assert(got(0.5) === Some(2.0)) // ceil(0.5*3) = 2nd of (1, 2, 3)
    val empty = ExactQuantile.compute(
      Seq.empty[java.lang.Double].toDF("x"), "x", Seq(0.5, 0.9))
    assert(empty(0.5) === None && empty(0.9) === None)
  }

  test("convention matches DuckDB quantile_disc on its pinned examples") {
    // quantile_disc((1,2,3,4), .5/.25/.999/.01) = 2/1/4/1 and
    // quantile_disc((1..5), .5) = 3 — verified against DuckDB directly
    val four = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val g4 = ExactQuantile.compute(four, "x", Seq(0.5, 0.25, 0.999, 0.01))
    assert(g4(0.5) === Some(2.0) && g4(0.25) === Some(1.0) &&
      g4(0.999) === Some(4.0) && g4(0.01) === Some(1.0))
    val five = (1 to 5).map(_.toDouble).toDF("x")
    assert(ExactQuantile.compute(five, "x", Seq(0.5))(0.5) === Some(3.0))
  }

  test("narrowing engages and stays exact when every level is forced") {
    // 20k distinct values, maxFinal=10: needs multiple 8-bucket levels
    val values = (1 to 20000).map(i => math.sin(i.toDouble) * 1000.0)
    val got = ExactQuantile.compute(values.toDF("x"), "x", Seq(0.5, 0.99),
      numBuckets = 8, maxFinal = 10L)
    assert(got(0.5) === Some(ref(values, 0.5)))
    assert(got(0.99) === Some(ref(values, 0.99)))
  }

  test("wiring refuses bad parameters") {
    val df = Seq(1.0).toDF("x")
    intercept[IllegalArgumentException](ExactQuantile.compute(df, "x", Seq(0.0)))
    intercept[IllegalArgumentException](ExactQuantile.compute(df, "x", Seq(1.1)))
    intercept[IllegalArgumentException](ExactQuantile.compute(df, "x", Seq(0.5, 0.5)))
    intercept[IllegalArgumentException](
      ExactQuantile.compute(df, "x", Seq(0.5), numBuckets = 1))
  }
}
