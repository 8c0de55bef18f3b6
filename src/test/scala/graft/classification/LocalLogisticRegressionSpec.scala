package graft.classification

import scala.util.Random

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.DataFrame

import graft.SparkTestBase

/** Golden-value tests ported from the reference
  * (LocalLogisticRegressionSpec.scala:136-238): the glmnet coefficients in
  * the assertions come from the R runs documented there, so the data
  * generators below must replay the reference generators' exact RNG call
  * order (same java.util.Random stream, same seed).
  */
object LocalLogisticRegressionSpec {

  /** Y = logistic(offset + scale * X), X ~ N(0,1)
    * (reference spec generateLogisticInput :18-35).
    */
  def generateLogisticInput(
      offset: Double, scale: Double, nPoints: Int, seed: Int): Seq[(Double, Vector)] = {
    val rnd = new Random(seed)
    val x1 = Array.fill[Double](nPoints)(rnd.nextGaussian())
    val y = (0 until nPoints).map { i =>
      val p = 1.0 / (1.0 + math.exp(-(offset + scale * x1(i))))
      if (rnd.nextDouble() < p) 1.0 else 0.0
    }
    (0 until nPoints).map(i => (y(i), Vectors.dense(Array(x1(i)))))
  }

  /** Binary multinomial-model sampler
    * (reference spec generateMultinomialLogisticInput :37-127, binary case).
    */
  def generateBinaryInput(
      weights: Array[Double], xMean: Array[Double], xVariance: Array[Double],
      nPoints: Int, seed: Int): Seq[(Double, Vector)] = {
    val rnd = new Random(seed)
    val xDim = xMean.length
    val x = Array.fill[Vector](nPoints)(
      Vectors.dense(Array.fill[Double](xDim)(rnd.nextGaussian())))
    x.foreach { vector =>
      val arr = vector.toArray
      var i = 0
      while (i < arr.length) {
        arr(i) = arr(i) * math.sqrt(xVariance(i)) + xMean(i)
        i += 1
      }
    }
    val y = (0 until nPoints).map { idx =>
      val xArray = x(idx).toArray
      // margins(0) = 0 (class 0 reference), margins(1) = w·x + b
      var margin1 = 0.0
      for (j <- 0 until xDim) margin1 += weights(j) * xArray(j)
      margin1 += weights(xDim) // intercept (addIntercept = true layout)
      val maxMargin = math.max(0.0, margin1)
      val m0 = math.exp(0.0 - maxMargin)
      val m1 = math.exp(margin1 - maxMargin)
      val norm = m0 + m1
      val p0 = m0 / norm
      val p = rnd.nextDouble()
      if (p < p0) 0.0 else 1.0
    }
    (0 until nPoints).map(i => (y(i), x(i)))
  }
}

// local path (1 partition) and distributed fallback (2 partitions)
class LocalPathLogisticRegressionSpec extends AbstractLocalLogisticRegressionSpec("local", 1)
class DistributedPathLogisticRegressionSpec extends AbstractLocalLogisticRegressionSpec("distributed", 2)

abstract class AbstractLocalLogisticRegressionSpec(name: String, partitions: Int)
  extends SparkTestBase {

  import LocalLogisticRegressionSpec._
  import spark.implicits._

  lazy val dataset: DataFrame =
    generateLogisticInput(1.0, 1.0, nPoints = 100, seed = 42)
      .toDF("label", "features").repartition(partitions)

  lazy val binaryDataset: DataFrame = {
    val weights = Array(-0.57997, 0.912083, -0.371077, -0.819866, 2.688191)
    val xMean = Array(5.843, 3.057, 3.758, 1.199)
    val xVariance = Array(0.6856, 0.1899, 3.116, 0.581)
    generateBinaryInput(weights, xMean, xVariance, nPoints = 10000, seed = 42)
      .toDF("label", "features").repartition(partitions)
  }

  test(s"$name: probabilities are consistent with predictions") {
    val model = new LocalLogisticRegression().fit(dataset)
    val results = model.transform(dataset).select("probability", "prediction").collect()
    results.foreach { r =>
      val prob = r.getDouble(0)
      val pred = r.getDouble(1)
      assert(prob >= 0.0 && prob <= 1.0)
      assert(pred === (if (prob > 0.5) 1.0 else 0.0))
    }
  }

  test(s"$name: rawPrediction is the margin and probability its sigmoid") {
    val model = new LocalLogisticRegression().fit(dataset)
    val rows = model.transform(dataset)
      .select("features", "rawPrediction", "probability").collect()
    rows.foreach { r =>
      val margin = model.margin(r.getAs[org.apache.spark.ml.linalg.Vector](0))
      assert(math.abs(r.getDouble(1) - margin) < 1e-12)
      assert(math.abs(r.getDouble(2) - 1.0 / (1.0 + math.exp(-margin))) < 1e-12)
    }
  }

  test(s"$name: recovers the generating model on separable-ish data") {
    val model = new LocalLogisticRegression().setMaxIter(100).fit(dataset)
    // data was generated with intercept 1, slope 1
    assert(model.intercept > 0.4 && model.intercept < 1.8,
      s"intercept ${model.intercept}")
    assert(model.coefficients(0) > 0.4 && model.coefficients(0) < 1.8,
      s"coef ${model.coefficients}")
  }

  test(s"$name: L1-regularized with standardization matches glmnet") {
    // glmnet(features, label, family="binomial", alpha=1, lambda=0.12)
    // → intercept -0.05627428, weights (0, 0, -0.04325749, -0.02481551)
    // (reference LocalLogisticRegressionSpec.scala:191-214)
    val model = new LocalLogisticRegression().setFitIntercept(true)
      .setElasticNetParam(1.0).setRegParam(0.12).setStandardization(true)
      .fit(binaryDataset)
    val expected = Vectors.dense(0.0, 0.0, -0.04325749, -0.02481551)
    assert(math.abs(model.intercept - (-0.05627428)) / 0.05627428 < 0.3,
      s"intercept ${model.intercept}")
    (0 until 4).foreach { i =>
      assert(math.abs(model.coefficients(i) - expected(i)) < 2e-2,
        s"coef $i: ${model.coefficients(i)} vs ${expected(i)}")
    }
  }

  test(s"$name: L1-regularized without standardization matches glmnet") {
    // glmnet(..., alpha=1, lambda=0.12, standardize=FALSE)
    // → intercept 0.3722152, weights (0, 0, -0.1665453, 0)
    // (reference LocalLogisticRegressionSpec.scala:216-237)
    val model = new LocalLogisticRegression().setFitIntercept(true)
      .setElasticNetParam(1.0).setRegParam(0.12).setStandardization(false)
      .fit(binaryDataset)
    val expected = Vectors.dense(0.0, 0.0, -0.1665453, 0.0)
    assert(math.abs(model.intercept - 0.3722152) / 0.3722152 < 0.3,
      s"intercept ${model.intercept}")
    (0 until 4).foreach { i =>
      assert(math.abs(model.coefficients(i) - expected(i)) < 1e-2,
        s"coef $i: ${model.coefficients(i)} vs ${expected(i)}")
    }
  }
}
