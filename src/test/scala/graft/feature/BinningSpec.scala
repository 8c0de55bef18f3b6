package graft.feature

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Mirrors FIXTURES.md A4 (reference BinningSpec.scala:13-111). */
class BinningSpec extends SparkTestBase {

  val schema = StructType(Seq(
    StructField("cookie_id", StringType),
    StructField("num_days", IntegerType),
    StructField("ctr", DoubleType),
    StructField("actions", DoubleType, nullable = true)))

  lazy val rnd = new scala.util.Random(31337)
  lazy val rows: Seq[Row] = (1 to 2000).map { i =>
    Row(s"c$i", i, rnd.nextDouble(),
      if (i % 2 == 0) null else rnd.nextDouble() * 10)
  }
  lazy val df = spark.createDataFrame(sc.parallelize(rows), schema)

  test("optimal 5-bin splits on uniform ctr are near {0.2,0.4,0.6,0.8} (quantile)") {
    val model = new OptimalBinning().setInputCol("ctr").setOutputCol("ctr_bins")
      .setNumBins(5).fit(df)
    val inner = model.getSplits.drop(1).dropRight(1)
    assert(inner.length === 4)
    inner.zip(Seq(0.2, 0.4, 0.6, 0.8)).foreach { case (got, want) =>
      assert(math.abs(got - want) < 0.05, s"split $got too far from $want")
    }
  }

  test("lbfgs method (reference parity) also yields near-uniform splits") {
    val model = new OptimalBinning().setInputCol("ctr").setOutputCol("ctr_bins")
      .setNumBins(5).setMethod("lbfgs").fit(df)
    val inner = model.getSplits.drop(1).dropRight(1)
    assert(inner.length === 4)
    inner.zip(Seq(0.2, 0.4, 0.6, 0.8)).foreach { case (got, want) =>
      assert(math.abs(got - want) < 0.08, s"split $got too far from $want")
    }
  }

  test("one-hot bin vectors match manual range checks") {
    val model = new Binning().setInputCol("ctr").setOutputCol("ctr_bins")
      .setSplits(Array(Double.NegativeInfinity, 0.25, 0.5, 0.75, Double.PositiveInfinity))
    val out = model.transform(df).select("ctr", "ctr_bins").collect()
    out.foreach { r =>
      val ctr = r.getDouble(0)
      val v = r.getAs[Vector](1)
      val expected = if (ctr < 0.25) 0 else if (ctr < 0.5) 1 else if (ctr < 0.75) 2 else 3
      assert(v.size === 4)
      assert(v.toArray(expected) === 1.0)
      assert(v.toArray.sum === 1.0)
    }
  }

  test("StringType input rejected") {
    intercept[IllegalArgumentException] {
      new OptimalBinning().setInputCol("cookie_id").setOutputCol("out").fit(df)
    }
  }

  test("nulls tolerated in fit (dropped before quantiles)") {
    val model = new OptimalBinning().setInputCol("actions").setOutputCol("a_bins")
      .setNumBins(4).fit(df)
    assert(model.getSplits.length === 5)
  }

  test("bin AttributeGroup carries [lo, hi) labels") {
    val model = new Binning().setInputCol("ctr").setOutputCol("ctr_bins")
      .setSplits(Array(Double.NegativeInfinity, 0.5, Double.PositiveInfinity))
    val out = model.transform(df)
    val group = org.apache.spark.ml.attribute.AttributeGroup
      .fromStructField(out.schema("ctr_bins"))
    assert(group.attributes.get.map(_.name.get).toSeq ===
      Seq("[-Infinity, 0.5)", "[0.5, Infinity)"))
  }
}

/** Pure-math fixture (reference SplitOptimizerSpec.scala:17-45). */
class SplitOptimizerSpec extends SparkTestBase with SplitOptimizer {

  test("uniform 0..99 + noise: 9 near-perfect splits") {
    val rnd = new scala.util.Random(42)
    val x = Array.tabulate(1000)(i => (i % 100).toDouble + rnd.nextDouble() * 0.01)
    val splits = optimalSplit(x, 9)
    assert(splits.length === 9)
    splits.zip((1 to 9).map(_ * 10.0)).foreach { case (got, want) =>
      assert(math.abs(got - want) < 2.5, s"split $got too far from $want")
    }
  }

  test("skewed exp(N(0,1)) sample: equi-count bins within tolerance") {
    val rnd = new scala.util.Random(42)
    val x = Array.fill(1000)(math.exp(rnd.nextGaussian()))
    val splits = optimalSplit(x, 4)
    val bounds = Double.NegativeInfinity +: splits :+ Double.PositiveInfinity
    val counts = bounds.sliding(2).map(s => x.count(v => v >= s(0) && v < s(1))).toArray
    counts.foreach(c => assert(math.abs(c - 200) <= 40, s"bin count $c far from 200"))
  }

  test("golden parity: deterministic exp(N(0,1)) sample, pinned LBFGS splits") {
    // The reference validates optimalSplit on 1000 draws of exp(N(0,1))
    // with every bin count within ±5 of 100 (reference
    // SplitOptimizerSpec.scala:28-45). Its sample is seedless-random, so
    // the fixture here is the DETERMINISTIC equivalent — the inverse CDF
    // on the midpoint grid, exp(Φ⁻¹((i+0.5)/1000)) — on which the port
    // achieves the reference's property exactly (100 per bin) and the
    // splits land on the distribution's true deciles exp(Φ⁻¹(k/10))
    // (split 5 ≈ 1.0 = exp(0)). Pinned values guard the numeric port
    // against regressions.
    val g = breeze.stats.distributions.Gaussian(0, 1)(
      breeze.stats.distributions.RandBasis.withSeed(0))
    val x = Array.tabulate(1000)(i => math.exp(g.inverseCdf((i + 0.5) / 1000.0)))
    val splits = optimalSplit(x, 9)
    assert(splits.length === 9)

    val bounds = Double.NegativeInfinity +: splits :+ Double.PositiveInfinity
    val counts = bounds.sliding(2).map(s => x.count(v => v >= s(0) && v < s(1))).toArray
    assert(counts.sum === 1000)
    counts.foreach(c => assert(math.abs(c - 100) <= 5, s"bin count $c far from 100"))

    val golden = Array(0.278238653, 0.431473156, 0.592250871, 0.776399809,
      1.000000785, 1.287998266, 1.688476601, 2.317646014, 3.594047457)
    splits.zip(golden).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-6, s"split $got drifted from golden $want")
    }
  }

  test("toDiff/fromDiff roundtrip") {
    val v = Array(1.0, 3.0, 7.0, 20.0)
    assert(fromDiff(toDiff(v)).zip(v).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }
}
