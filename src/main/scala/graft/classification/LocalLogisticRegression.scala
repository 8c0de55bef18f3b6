package graft.classification

import breeze.linalg.{DenseVector => BDV}
import breeze.optimize.{CachedDiffFunction, DiffFunction, LBFGS => BreezeLBFGS, OWLQN => BreezeOWLQN}
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Logistic regression that trains INSIDE a single executor task when the
  * input fits one partition — "using Spark as a distributed executor" —
  * and falls back to Spark's distributed `ml.classification
  * .LogisticRegression` otherwise.
  *
  * Re-expresses the reference's `LocalLogisticRegression` (reference:
  * sparkext-mllib/src/main/scala/org/apache/spark/ml/classification/
  * LocalLogisticRegression.scala:21-216): same single-partition cutover
  * (:183), same standardized-space optimization with label-histogram
  * intercept initialization (:116-132), same LBFGS vs OWLQN selection and
  * per-index L1 weighting (:93-110), same unscaling of trained weights
  * (:156-174). Differences from the reference are all modernizations: the
  * distributed fallback calls Spark 4's public `LogisticRegression` (the
  * reference needed runtime reflection into a protected method, :199-212),
  * vectors are `ml.linalg`, and the model is our own class because Spark
  * 4's `LogisticRegressionModel` constructor is private.
  *
  * Scale note: the local path is exactly for data that does NOT need
  * scale (small design matrices after aggressive feature pruning, e.g.
  * per-segment models) — it avoids per-iteration `treeAggregate` job
  * overhead. Big inputs keep >1 partition and route to the distributed
  * trainer automatically.
  */
class LocalLogisticRegression(override val uid: String)
  extends Estimator[LocalLogisticRegressionModel] with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("localLogReg"))

  final val labelCol: Param[String] = new Param[String](this, "labelCol", "Label column (0/1)")
  final val featuresCol: Param[String] = new Param[String](this, "featuresCol",
    "Features column (ml.linalg.Vector)")
  final val regParam: DoubleParam = new DoubleParam(this, "regParam",
    "Regularization strength", ParamValidators.gtEq(0))
  final val elasticNetParam: DoubleParam = new DoubleParam(this, "elasticNetParam",
    "L1 mixing in [0,1]: 0 = ridge, 1 = lasso", ParamValidators.inRange(0, 1))
  final val maxIter: IntParam = new IntParam(this, "maxIter",
    "Maximum optimizer iterations", ParamValidators.gtEq(0))
  final val tol: DoubleParam = new DoubleParam(this, "tol",
    "Convergence tolerance", ParamValidators.gtEq(0))
  final val fitIntercept: BooleanParam = new BooleanParam(this, "fitIntercept", "Fit intercept")
  final val standardization: BooleanParam = new BooleanParam(this, "standardization",
    "Standardize features before optimization")
  final val threshold: DoubleParam = new DoubleParam(this, "threshold",
    "Decision threshold on P(y=1)", ParamValidators.inRange(0, 1))

  setDefault(labelCol -> "label", featuresCol -> "features",
    regParam -> 0.0, elasticNetParam -> 0.0, maxIter -> 100, tol -> 1e-6,
    fitIntercept -> true, standardization -> true, threshold -> 0.5)

  def setLabelCol(value: String): this.type = set(labelCol, value)
  def setFeaturesCol(value: String): this.type = set(featuresCol, value)
  def setRegParam(value: Double): this.type = set(regParam, value)
  def setElasticNetParam(value: Double): this.type = set(elasticNetParam, value)
  def setMaxIter(value: Int): this.type = set(maxIter, value)
  def setTol(value: Double): this.type = set(tol, value)
  def setFitIntercept(value: Boolean): this.type = set(fitIntercept, value)
  def setStandardization(value: Boolean): this.type = set(standardization, value)
  def setThreshold(value: Double): this.type = set(threshold, value)

  override def fit(dataset: Dataset[_]): LocalLogisticRegressionModel = {
    transformSchema(dataset.schema)
    val instances = dataset
      .select(col($(labelCol)).cast("double"), col($(featuresCol)))
      .rdd.map(r => (r.getDouble(0), r.getAs[Vector](1)))

    val (coefficients, intercept) =
      if (instances.getNumPartitions == 1) {
        // train inside the executor that holds the single partition; only
        // the final (coefficients, intercept) pair comes back to the driver
        val trainer = LocalTrainer($(regParam), $(elasticNetParam), $(maxIter),
          $(tol), $(fitIntercept), $(standardization))
        instances
          .mapPartitions(it => Iterator.single(trainer.train(it.toArray)))
          .first()
      } else {
        val lr = new org.apache.spark.ml.classification.LogisticRegression()
          .setLabelCol($(labelCol)).setFeaturesCol($(featuresCol))
          .setRegParam($(regParam)).setElasticNetParam($(elasticNetParam))
          .setMaxIter($(maxIter)).setTol($(tol))
          .setFitIntercept($(fitIntercept)).setStandardization($(standardization))
        val m = lr.fit(dataset.select(col($(labelCol)).cast("double").as($(labelCol)),
          col($(featuresCol))))
        (m.coefficients, m.intercept)
      }

    val model = new LocalLogisticRegressionModel(uid, coefficients, intercept)
    model.setLabelCol($(labelCol)).setFeaturesCol($(featuresCol))
    model.set(model.threshold, $(threshold))
    model.setParent(this)
  }

  override def transformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(labelCol)), s"label column ${$(labelCol)} not found")
    require(schema.fieldNames.contains($(featuresCol)),
      s"features column ${$(featuresCol)} not found")
    schema
  }

  override def copy(extra: ParamMap): LocalLogisticRegression = defaultCopy(extra)
}

/** Serializable single-node trainer (runs inside one executor task). */
private[classification] case class LocalTrainer(
    regParam: Double,
    elasticNetParam: Double,
    maxIter: Int,
    tol: Double,
    fitIntercept: Boolean,
    standardization: Boolean) {

  def train(instances: Array[(Double, Vector)]): (Vector, Double) = {
    require(instances.nonEmpty, "empty training partition")
    val numFeatures = instances.head._2.size

    // one pass: per-feature mean/variance (Welford) + label histogram
    val mean = new Array[Double](numFeatures)
    val m2 = new Array[Double](numFeatures)
    var count0 = 0L
    var count1 = 0L
    var n = 0L
    instances.foreach { case (label, x) =>
      require(label == 0.0 || label == 1.0, s"binary labels required, got $label")
      if (label == 0.0) count0 += 1 else count1 += 1
      n += 1
      var i = 0
      while (i < numFeatures) {
        val v = x(i)
        val d = v - mean(i)
        mean(i) += d / n
        m2(i) += d * (v - mean(i))
        i += 1
      }
    }
    val std = m2.map(s => math.sqrt(s / math.max(n - 1, 1)))

    val regL1 = elasticNetParam * regParam
    val regL2 = (1.0 - elasticNetParam) * regParam
    val cost = new LocalLogisticCostFun(instances, numFeatures, fitIntercept,
      standardization, std, regL2)

    val optimizer =
      if (elasticNetParam == 0.0 || regParam == 0.0) {
        new BreezeLBFGS[BDV[Double]](maxIter, 10, tol)
      } else {
        // no L1 on the intercept; without standardization the per-index
        // penalty is rescaled so the objective matches the raw space
        val l1 = (index: Int) =>
          if (index == numFeatures) 0.0
          else if (standardization) regL1
          else if (std(index) != 0.0) regL1 / std(index)
          else 0.0
        new BreezeOWLQN[Int, BDV[Double]](maxIter, 10, l1, tol)
      }

    val dim = if (fitIntercept) numFeatures + 1 else numFeatures
    val init = BDV.zeros[Double](dim)
    if (fitIntercept && count0 > 0 && count1 > 0)
      init(numFeatures) = math.log(count1.toDouble / count0)

    val states = optimizer.iterations(new CachedDiffFunction(cost), init)
    var last: optimizer.State = null
    while (states.hasNext) last = states.next()
    require(last != null, "optimizer produced no iterations")

    // back to the original feature space (intercept needs no unscaling)
    val raw = last.x.toArray
    val coef = Array.tabulate(numFeatures) { i =>
      if (std(i) != 0.0) raw(i) / std(i) else 0.0
    }
    (Vectors.dense(coef).compressed, if (fitIntercept) raw(numFeatures) else 0.0)
  }
}

/** Binomial negative log-likelihood (averaged) + L2, over a local array in
  * standardized feature space — the reference's `LocalLogisticCostFun`
  * (LocalLogisticRegression.scala:221-278) re-derived for breeze 2.x.
  */
private[classification] class LocalLogisticCostFun(
    data: Array[(Double, Vector)],
    numFeatures: Int,
    fitIntercept: Boolean,
    standardization: Boolean,
    std: Array[Double],
    regL2: Double) extends DiffFunction[BDV[Double]] {

  override def calculate(w: BDV[Double]): (Double, BDV[Double]) = {
    val grad = new Array[Double](w.length)
    var loss = 0.0
    var k = 0
    while (k < data.length) {
      val (label, x) = data(k)
      var margin = if (fitIntercept) w(numFeatures) else 0.0
      x.foreachActive { (i, v) =>
        if (std(i) != 0.0) margin += w(i) * (v / std(i))
      }
      val multiplier = 1.0 / (1.0 + math.exp(-margin)) - label
      x.foreachActive { (i, v) =>
        if (std(i) != 0.0) grad(i) += multiplier * (v / std(i))
      }
      if (fitIntercept) grad(numFeatures) += multiplier
      loss += (if (margin > 0) margin + math.log1p(math.exp(-margin))
               else math.log1p(math.exp(margin))) - label * margin
      k += 1
    }
    val n = data.length.toDouble
    var i = 0
    while (i < grad.length) { grad(i) /= n; i += 1 }
    loss /= n

    var regVal = 0.0
    if (regL2 != 0.0) {
      var j = 0
      while (j < numFeatures) {
        val wj = w(j)
        regVal += {
          if (standardization) {
            grad(j) += regL2 * wj
            wj * wj
          } else if (std(j) != 0.0) {
            // match the raw-space objective despite optimizing scaled
            val scaled = wj / (std(j) * std(j))
            grad(j) += regL2 * scaled
            wj * scaled
          } else 0.0
        }
        j += 1
      }
    }
    (loss + 0.5 * regL2 * regVal, new BDV(grad))
  }
}

/** Model produced by [[LocalLogisticRegression]]: adds rawPrediction (the
  * linear margin w·x + b), probability (its sigmoid) and prediction columns.
  */
class LocalLogisticRegressionModel(override val uid: String)
    extends Model[LocalLogisticRegressionModel] with DefaultParamsWritable {

  def this(uid: String, coefficients: Vector, intercept: Double) = {
    this(uid)
    set(coefficientsParam, coefficients)
    set(interceptParam, intercept)
  }

  /** Learned state as params (Param.jsonEncode handles ml Vectors natively)
    * so `save`/`load` round-trips the model.
    */
  final val coefficientsParam: Param[Vector] = new Param[Vector](this, "coefficients",
    "Learned coefficient vector")
  final val interceptParam: DoubleParam = new DoubleParam(this, "intercept",
    "Learned intercept")

  def coefficients: Vector = $(coefficientsParam)
  def intercept: Double = $(interceptParam)

  final val labelCol: Param[String] = new Param[String](this, "labelCol", "Label column")
  final val featuresCol: Param[String] = new Param[String](this, "featuresCol", "Features column")
  final val threshold: DoubleParam = new DoubleParam(this, "threshold",
    "Decision threshold on P(y=1)", ParamValidators.inRange(0, 1))
  final val probabilityCol: Param[String] = new Param[String](this, "probabilityCol",
    "Probability output column")
  final val predictionCol: Param[String] = new Param[String](this, "predictionCol",
    "Prediction output column")
  final val rawPredictionCol: Param[String] = new Param[String](this, "rawPredictionCol",
    "Raw prediction (margin) output column")

  setDefault(labelCol -> "label", featuresCol -> "features", threshold -> 0.5,
    probabilityCol -> "probability", predictionCol -> "prediction",
    rawPredictionCol -> "rawPrediction")

  def setLabelCol(value: String): this.type = set(labelCol, value)
  def setFeaturesCol(value: String): this.type = set(featuresCol, value)
  def setThreshold(value: Double): this.type = set(threshold, value)

  def margin(features: Vector): Double = {
    var m = intercept
    features.foreachActive((i, v) => m += coefficients(i) * v)
    m
  }

  def predictProbability(features: Vector): Double =
    1.0 / (1.0 + math.exp(-margin(features)))

  override def transform(dataset: Dataset[_]): DataFrame = {
    val t = $(threshold)
    // capture state locally: the closure ships two plain values, not the
    // model (whose margin() would re-read the param map per row)
    val coef = coefficients
    val b = intercept
    val marginUdf = udf { (v: Vector) =>
      var m = b
      v.foreachActive((i, x) => m += coef(i) * x)
      m
    }
    dataset
      .withColumn($(rawPredictionCol), marginUdf(col($(featuresCol))))
      .withColumn($(probabilityCol),
        lit(1.0) / (lit(1.0) + exp(-col($(rawPredictionCol)))))
      .withColumn($(predictionCol),
        when(col($(probabilityCol)) > t, 1.0).otherwise(0.0))
  }

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields ++ Seq(
      StructField($(rawPredictionCol), DoubleType),
      StructField($(probabilityCol), DoubleType),
      StructField($(predictionCol), DoubleType)))

  override def copy(extra: ParamMap): LocalLogisticRegressionModel = {
    val copied = new LocalLogisticRegressionModel(uid)
    copyValues(copied, extra).setParent(parent)
  }
}

object LocalLogisticRegression extends DefaultParamsReadable[LocalLogisticRegression]
object LocalLogisticRegressionModel extends DefaultParamsReadable[LocalLogisticRegressionModel]
