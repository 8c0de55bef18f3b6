package graft.feature

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TargetEncoderSpec extends SparkTestBase {
  import spark.implicits._

  // key a: 3 rows, 2 positive; key b: 2 rows, 0 positive; key c: 1 row, 1
  // positive; one NULL key row. prior = 3/7.
  lazy val df = Seq(
    (1L, Some("a"), 1.0), (2L, Some("a"), 1.0), (3L, Some("a"), 0.0),
    (4L, Some("b"), 0.0), (5L, Some("b"), 0.0),
    (6L, Some("c"), 1.0),
    (7L, None, 0.0))
    .toDF("id", "k", "y")

  private val prior = 3.0 / 7.0

  test("encodings: smoothed per-key stats with NULL as a real key") {
    val e = new TargetEncoder(smoothing = 2.0).encodings(df, "k", "y")
      .select($"k", $"cnt", $"enc")
      .collect().map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(e(Some("a"))._1 === 3L)
    assert(e(Some("a"))._2 === (2.0 + 2.0 * prior) / 5.0)
    assert(e(Some("b"))._2 === (0.0 + 2.0 * prior) / 4.0)
    assert(e(Some("c"))._2 === (1.0 + 2.0 * prior) / 3.0)
    assert(e(None)._2 === (0.0 + 2.0 * prior) / 3.0)
    assert(e.size === 4)
  }

  test("smoothing 0 is the raw mean; large smoothing pulls to the prior") {
    val raw = new TargetEncoder(0.0).encodings(df, "k", "y")
      .where($"k" === "a").select($"enc").as[Double].head()
    assert(raw === 2.0 / 3.0)
    val heavy = new TargetEncoder(1e9).encodings(df, "k", "y")
      .where($"k" === "a").select($"enc").as[Double].head()
    assert(math.abs(heavy - prior) < 1e-6)
  }

  test("transform scores new rows; unseen keys fall back to the prior") {
    val te = new TargetEncoder(2.0)
    val stats = te.encodings(df, "k", "y")
    val scored = te.transform(
      Seq((10L, Some("a")), (11L, Some("zz")), (12L, None)).toDF("id", "k"),
      stats, "k")
      .select($"id", $"k_enc", $"k_cnt")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(scored(10L) === (((2.0 + 2.0 * prior) / 5.0, 3L)))
    assert(scored(11L) === ((prior, 0L)))           // unseen -> prior, cnt 0
    assert(scored(12L)._2 === 1L)                   // NULL key joined null-safe
  }

  test("NULL labels are excluded from the mean, not counted as implicit 0s") {
    // key d: 2 observed 1.0s + 2 NULL labels. Dividing by count(*) would
    // bias enc(d) toward 0.5·mean; n_y keeps the true mean 1.0 (m=0).
    // prior = avg over OBSERVED labels only (null-excluding), same rule.
    val withNulls = Seq(
      (1L, "d", Some(1.0)), (2L, "d", Some(1.0)),
      (3L, "d", Option.empty[Double]), (4L, "d", Option.empty[Double]),
      (5L, "e", Some(0.0)))
      .toDF("id", "k", "y")
    val e = new TargetEncoder(0.0).encodings(withNulls, "k", "y")
      .select($"k", $"cnt", $"n_y", $"enc")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(e("d") === ((4L, 2L, 1.0))) // cnt = frequency, mean over observed only
    // LOO: a null-label row removes NOTHING and gets the full-key encoding
    val loo = new TargetEncoder(0.0).transformLoo(withNulls, "k", "y")
      .select($"id", $"k_enc").as[(Long, Double)].collect().toMap
    assert(loo(3L) === 1.0)
    assert(loo(1L) === 1.0) // (2 - 1) / (2 - 1)
  }

  test("leave-one-out removes each row's own label; singletons get the prior") {
    val out = new TargetEncoder(2.0).transformLoo(df, "k", "y")
      .select($"id", $"k_enc").as[(Long, Double)].collect().toMap
    // key a row 1 (y=1): (2 - 1 + 2*prior) / (3 - 1 + 2)
    assert(out(1L) === (1.0 + 2.0 * prior) / 4.0)
    // key a row 3 (y=0): (2 - 0 + 2*prior) / 4
    assert(out(3L) === (2.0 + 2.0 * prior) / 4.0)
    // singleton key c with m=2: (1 - 1 + 2*prior) / (0 + 2)
    assert(out(6L) === (2.0 * prior) / 2.0)
    assert(out.size === 7)                          // row-preserving
  }

  test("loo with zero smoothing on a singleton key yields the prior, not NaN") {
    val out = new TargetEncoder(0.0).transformLoo(df, "k", "y")
      .where($"id" === 6L).select($"k_enc").as[Double].head()
    assert(out === prior)
  }

  test("input columns named cnt/enc/prior/sum_y survive both transforms") {
    val te = new TargetEncoder(2.0)
    val stats = te.encodings(df, "k", "y")
    // scoring frame that already carries every former helper name
    val clash = Seq((10L, Some("a"), 7L, 0.3, 0.4, 9.9))
      .toDF("id", "k", "cnt", "enc", "prior", "sum_y")
    val scored = te.transform(clash, stats, "k")
    assert(Seq("cnt", "enc", "prior", "sum_y").forall(scored.columns.contains))
    val r = scored.select($"cnt", $"enc", $"prior", $"sum_y", $"k_enc", $"k_cnt")
      .head()
    assert((r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)) ===
      ((7L, 0.3, 0.4, 9.9)))                        // caller's columns intact
    assert(r.getDouble(4) === (2.0 + 2.0 * prior) / 5.0)
    assert(r.getLong(5) === 3L)
    val looClash = df.withColumn("cnt", lit(42L)).withColumn("prior", lit(0.9))
    val loo = te.transformLoo(looClash, "k", "y")
      .where($"id" === 1L).select($"cnt", $"prior", $"k_enc").head()
    assert((loo.getLong(0), loo.getDouble(1)) === ((42L, 0.9)))
    assert(loo.getDouble(2) === (1.0 + 2.0 * prior) / 4.0)
  }
}
