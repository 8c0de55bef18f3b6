package graft.sampling

import graft.SparkTestBase

/** Mirrors FIXTURES.md A7 (reference DownsamplingSpec.scala:15-69). */
class DownsamplingSpec extends SparkTestBase {
  import spark.implicits._

  def data(pos: Int, neg: Int) =
    ((1 to pos).map(i => (s"p$i", 1.0)) ++ (1 to neg).map(i => (s"n$i", 0.0)))
      .toDF("cookie_id", "label")

  test("ratio below max: no sampling, all weights 1.0") {
    val df = data(100, 900) // ratio 9 < default 30
    val model = new Downsampling().setLabelCol("label").setOutputCol("w").fit(df)
    assert(model.sampleFraction.isEmpty)
    val out = model.transform(df)
    assert(out.count() === 1000)
    assert(out.filter($"w" === 1.0).count() === 1000)
  }

  test("ratio above max: secondary sampled, weight = 1/fraction") {
    val df = data(100, 9000)
    val model = new Downsampling().setLabelCol("label").setOutputCol("w")
      .setMaxClassRatio(29.0).fit(df)
    val fraction = model.sampleFraction.get
    assert(math.abs(fraction - 2900.0 / 9000.0) < 1e-9)
    val out = model.transform(df).cache()
    val positives = out.filter($"label" === 1.0)
    assert(positives.count() === 100)
    assert(positives.filter($"w" === 1.0).count() === 100)
    val negatives = out.filter($"label" === 0.0)
    val negCount = negatives.count()
    assert(negCount > 2600 && negCount < 3200, s"sampled count $negCount out of range")
    val w = negatives.select("w").first().getDouble(0)
    assert(math.abs(w - 1.0 / fraction) < 1e-9)
    out.unpersist()
  }

  test("NULL-label rows survive BOTH branches with weight 1.0") {
    // === primary and =!= primary are both null-false, so the sampling
    // branch used to silently drop null-label rows while the no-op branch
    // kept them — membership flip-flopping with the learned class ratio
    val withNulls = (data(100, 9000).as[(String, Double)].collect().toSeq
      .map { case (id, l) => (id, Option(l)) } ++
      (1 to 50).map(i => (s"u$i", Option.empty[Double])))
      .toDF("cookie_id", "label")
    // sampling branch (ratio 90 > cap 29)
    val sampled = new Downsampling().setLabelCol("label").setOutputCol("w")
      .setMaxClassRatio(29.0).fit(withNulls).transform(withNulls)
    assert(sampled.filter($"label".isNull).count() === 50)
    assert(sampled.filter($"label".isNull && $"w" === 1.0).count() === 50)
    // no-op branch (cap high enough)
    val noop = new Downsampling().setLabelCol("label").setOutputCol("w")
      .setMaxClassRatio(1000.0).fit(withNulls).transform(withNulls)
    assert(noop.filter($"label".isNull).count() === 50)
  }

  test("deterministic mode: stable membership, partitioning-independent") {
    val df = data(100, 9000)
    val model = new Downsampling().setLabelCol("label").setOutputCol("w")
      .setMaxClassRatio(29.0).setDeterministicIdCol("cookie_id").fit(df)
    val fraction = model.sampleFraction.get
    val a = model.transform(df).filter($"label" === 0.0)
      .select("cookie_id").as[String].collect().toSet
    val b = model.transform(df.repartition(7)).filter($"label" === 0.0)
      .select("cookie_id").as[String].collect().toSet
    assert(a === b, "membership must not depend on partitioning")
    // md5 is uniform: kept count within ±5% absolute of expectation
    assert(math.abs(a.size - fraction * 9000) < 0.05 * 9000,
      s"kept ${a.size}, expected ~${fraction * 9000}")
    val w = model.transform(df).filter($"label" === 0.0)
      .select("w").distinct().as[Double].collect()
    assert(w.length === 1 && math.abs(w.head - 1.0 / fraction) < 1e-12)
  }

  test("primary class must be present") {
    val df = data(0, 100)
    intercept[IllegalArgumentException] {
      new Downsampling().setLabelCol("label").fit(df)
    }
  }

  test("non-double label rejected") {
    val df = Seq((1, 1), (2, 0)).toDF("id", "label")
    intercept[IllegalArgumentException] {
      new Downsampling().setLabelCol("label").fit(df)
    }
  }
}
