package graft.stats

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Delete-one-bucket jackknife against an in-memory leave-one-out loop,
  * the zero-variance clamp, partial bucket coverage, and empties.
  */
class JackknifeSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Double)]) =
    Jackknife.ratioCI(
      rows.toDF("grp", "bkt", "v"), Seq("grp"), col("v"), lit(1.0), col("bkt"))
      .collect().map(r => r.getString(0) -> r).toMap

  /** In-memory leave-one-out reference (literal B recomputations). */
  private def ref(rows: Seq[(Long, Double)]): (Double, Double) = {
    val byB = rows.groupBy(_._1).view
      .mapValues(rs => (rs.map(_._2).sum, rs.size.toDouble)).toMap
    val tn = byB.values.map(_._1).sum
    val td = byB.values.map(_._2).sum
    val b = byB.size.toDouble
    val loo = byB.values.map { case (bn, bd) => (tn - bn) / (td - bd) }.toSeq
    val m = loo.sum / b
    val v = (b - 1) / b * loo.map(t => (t - m) * (t - m)).sum
    (tn / td, math.sqrt(math.max(v, 0.0)))
  }

  test("matches the literal leave-one-out loop per group") {
    val rows = for (b <- 0L until 5L; i <- 0 until 4) yield
      ("g" + (i % 2), b, (b * 7 + i * 3 + 1).toDouble)
    val got = run(rows)
    for (g <- Seq("g0", "g1")) {
      val (theta, se) = ref(rows.filter(_._1 == g).map(r => (r._2, r._3)))
      val r = got(g)
      assert(math.abs(r.getDouble(1) - theta) < 1e-12, s"$g theta")
      assert(math.abs(r.getDouble(2) - se) < 1e-10, s"$g se")
      assert(math.abs(r.getDouble(3) - (theta - 1.959963984540054 * se)) < 1e-9)
      assert(math.abs(r.getDouble(4) - (theta + 1.959963984540054 * se)) < 1e-9)
      assert(r.getLong(5) === 5L)
    }
  }

  test("identical buckets give se = 0 (clamped, never NaN)") {
    val rows = for (b <- 0L until 4L) yield ("g", b, 10.0)
    val r = run(rows)("g")
    assert(r.getDouble(1) === 10.0)
    assert(r.getDouble(2) === 0.0)
    assert(r.getDouble(3) === r.getDouble(4))
  }

  test("a group present in a SUBSET of buckets jackknifes over those only") {
    val rows = Seq(("g", 0L, 4.0), ("g", 3L, 8.0), ("h", 0L, 1.0),
      ("h", 1L, 2.0), ("h", 2L, 3.0))
    val got = run(rows)
    assert(got("g").getLong(5) === 2L)
    assert(got("h").getLong(5) === 3L)
    val (theta, se) = ref(Seq((0L, 4.0), (3L, 8.0)))
    assert(math.abs(got("g").getDouble(1) - theta) < 1e-12)
    assert(math.abs(got("g").getDouble(2) - se) < 1e-10)
  }

  test("ratio semantics: weighted num over den, not mean of ratios") {
    // num = value, den = weight: theta must be sum(v)/sum(w)
    val df = Seq(("g", 0L, 10.0, 1.0), ("g", 1L, 30.0, 3.0))
      .toDF("grp", "bkt", "v", "w")
    val r = Jackknife.ratioCI(df, Seq("grp"), col("v"), col("w"), col("bkt"))
      .collect().head
    assert(math.abs(r.getDouble(1) - 10.0) < 1e-12) // 40/4
  }

  test("empty input is clean") {
    assert(run(Seq.empty).isEmpty)
  }
}
