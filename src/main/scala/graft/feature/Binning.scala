package graft.feature

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.attribute.{Attribute, AttributeGroup, BinaryAttribute}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.ml.param._
import org.apache.spark.ml.param.shared.{HasInputCol, HasOutputCol}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

private[feature] trait BinningBase extends Params with HasInputCol with HasOutputCol {
  def setInputCol(value: String): this.type = set(inputCol, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)

  protected def validateNumeric(schema: StructType): Unit =
    schema($(inputCol)).dataType match {
      case _: NumericType =>
      case other => throw new IllegalArgumentException(
        s"Data type $other is not supported.")
    }
}

/** Learns equi-population (equal-count) bin splits for a numeric column.
  *
  * Reference behavior: sample ≤ `sampleSize` non-null points to the driver
  * and minimize MSE-from-ideal-count with breeze LBFGS
  * (reference Binning.scala:18-83, SplitOptimizer at :145-251).
  *
  * Two methods here:
  *  - '''quantile''' (default): `df.stat.approxQuantile` at the exact
  *    equi-count percentiles. This is the distributed, scale-first path —
  *    Greenwald-Khanna sketch per partition, merged; only `numBins-1`
  *    doubles reach the driver. At 100 TB this is one pass, no sample
  *    collect. `relativeError` tunes sketch precision.
  *  - '''lbfgs''': the reference's algorithm verbatim on a driver-side
  *    sample (bounded by `sampleSize`), kept for parity testing.
  *
  * Both produce splits bracketed with ±Infinity.
  */
class OptimalBinning(override val uid: String)
    extends Estimator[Binning] with BinningBase with SplitOptimizer
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("optimalBinning"))

  final val numBins = new IntParam(this, "numBins", "Number of bins", ParamValidators.gt(2))
  final val sampleSize = new IntParam(this, "sampleSize",
    "Sample size for the lbfgs split optimizer", ParamValidators.gt(1000))
  final val method = new Param[String](this, "method",
    "Split method: quantile (distributed approxQuantile) | exact (exact " +
      "interpolating percentiles, memory ~ distinct values — parity/oracle " +
      "path) | lbfgs (reference parity)",
    ParamValidators.inArray(Array("quantile", "exact", "lbfgs")))
  final val relativeError = new DoubleParam(this, "relativeError",
    "approxQuantile relative error (quantile method)", ParamValidators.inRange(0.0, 1.0))

  def setNumBins(value: Int): this.type = set(numBins, value)
  def setSampleSize(value: Int): this.type = set(sampleSize, value)
  def setMethod(value: String): this.type = set(method, value)
  def setRelativeError(value: Double): this.type = set(relativeError, value)

  setDefault(numBins -> 5, sampleSize -> 10000, method -> "quantile",
    relativeError -> 0.001)

  override def fit(dataset: Dataset[_]): Binning = {
    transformSchema(dataset.schema)
    // lbfgs calls optimalSplit with numBins-1 splits, which requires >= 3
    // (so a confusing failure deep in the optimizer becomes a clear one)
    require($(method) != "lbfgs" || $(numBins) >= 4,
      s"method=lbfgs needs numBins >= 4, got ${$(numBins)}")
    val inner = $(method) match {
      case "quantile" =>
        val percentiles = (1 until $(numBins)).map(_.toDouble / $(numBins)).toArray
        val qs = dataset.toDF().na.drop(Seq($(inputCol)))
          .select(col($(inputCol)).cast(DoubleType).as($(inputCol)))
          .stat.approxQuantile($(inputCol), percentiles, $(relativeError))
        // approxQuantile on an empty/all-null column returns an EMPTY
        // array — without this guard the failure surfaces as an opaque
        // 'parameter splits given invalid value' from the model's param
        // validator instead of naming the column and the real cause
        // (mirrors the exact path's n > 0 require)
        require(qs.nonEmpty,
          s"cannot fit quantile splits: input column '${$(inputCol)}' has no non-null values")
        qs.distinct.sorted
      case "exact" =>
        // exact linear-interpolated quantiles (same formula as Spark's
        // `percentile` and DuckDB's quantile_cont) via distributed sort +
        // rank selection: the `percentile` AGGREGATE buffers every value on
        // one final reducer (OOM at scale); a range-partitioned sort and a
        // lookup of the 2(numBins-1) bracketing ranks never concentrates
        // the data anywhere
        val vals = dataset.toDF().na.drop(Seq($(inputCol)))
          .select(col($(inputCol)).cast(DoubleType).as("v"))
        val n = vals.count()
        require(n > 0, s"cannot fit quantile splits on an empty ${$(inputCol)}")
        val positions = (1 until $(numBins)).map(_.toDouble / $(numBins) * (n - 1))
        val ranks = positions
          .flatMap(p => Seq(math.floor(p).toLong, math.ceil(p).toLong)).toSet
        val rankValue = vals.sort("v").rdd.map(_.getDouble(0)).zipWithIndex()
          .filter { case (_, i) => ranks.contains(i) }
          .map(_.swap).collectAsMap()
        val qs = positions.map { p =>
          val lo = rankValue(math.floor(p).toLong)
          val hi = rankValue(math.ceil(p).toLong)
          lo + (hi - lo) * (p - math.floor(p))
        }.toArray
        qs.distinct.sorted
      case "lbfgs" =>
        val notNulls = dataset.filter(col($(inputCol)).isNotNull)
        val inputSize = notNulls.count()
        val fraction = if ($(sampleSize) >= inputSize) 1.0 else $(sampleSize).toDouble / inputSize
        val x = notNulls.select(col($(inputCol)).cast(DoubleType))
          .sample(withReplacement = false, fraction)
          .collect().map(_.getDouble(0))
        require(x.length > $(numBins) * 10, "Number of sample points for binning is too small")
        optimalSplit(x, $(numBins) - 1)
    }
    val splits = Double.NegativeInfinity +: inner :+ Double.PositiveInfinity
    copyValues(new Binning(uid).setSplits(splits).setParent(this))
  }

  /** NOTE: advertises `numBins` attributes; if the data has duplicate
    * quantiles the fitted model can have fewer bins (splits shrink on
    * `.distinct`) — the model's own transformSchema reports the real width.
    */
  override def transformSchema(schema: StructType): StructType = {
    validateNumeric(schema)
    val attrGroup = new AttributeGroup($(outputCol), $(numBins))
    StructType(schema.fields :+ attrGroup.toStructField())
  }

  override def copy(extra: ParamMap): Estimator[Binning] = defaultCopy(extra)
}

/** Bucketizer variant emitting a ONE-HOT sparse vector instead of a bin
  * index (reference Binning.scala:91-140), with `BinaryAttribute` bin labels
  * `"[lo, hi)"`. Row-local bucket lookup via binary search — no shuffle.
  */
final class Binning(override val uid: String) extends Model[Binning] with BinningBase
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("binning"))

  final val splits: DoubleArrayParam = new DoubleArrayParam(this, "splits",
    "Strictly increasing split points; n+1 splits = n bins; bin = [x, y). " +
      "Include -Inf/+Inf to cover all doubles.",
    (s: Array[Double]) => s.length >= 3 && s.sliding(2).forall(p => p(0) < p(1)))

  def getSplits: Array[Double] = $(splits)
  def setSplits(value: Array[Double]): this.type = set(splits, value)

  /** splits[i] <= v < splits[i+1]; the last bin also includes the upper
    * bound (matches Spark Bucketizer / reference semantics).
    */
  private[feature] def findBucket(s: Array[Double], v: Double): Int = {
    if (v == s.last) return s.length - 2
    val idx = java.util.Arrays.binarySearch(s, v)
    val bucket = if (idx >= 0) idx else -idx - 2
    require(bucket >= 0 && bucket < s.length - 1,
      s"Value $v outside of splits range [${s.head}, ${s.last}]")
    bucket
  }

  override def transform(dataset: Dataset[_]): DataFrame = {
    val outputSchema = transformSchema(dataset.schema)
    val theSplits = $(splits)
    val numBins = theSplits.length - 1
    val t = udf { (feature: Double) =>
      Vectors.sparse(numBins, Seq((findBucket(theSplits, feature), 1.0)))
    }
    val metadata = outputSchema($(outputCol)).metadata
    dataset.select(col("*"),
      t(col($(inputCol)).cast(DoubleType)).as($(outputCol), metadata))
  }

  override def transformSchema(schema: StructType): StructType = {
    validateNumeric(schema)
    val bins = $(splits).sliding(2).map(b => s"[${b.mkString(", ")})").toArray
    val attrs: Array[Attribute] = bins.map(b => BinaryAttribute.defaultAttr.withName(b))
    val attrGroup = new AttributeGroup($(outputCol), attrs)
    StructType(schema.fields :+ attrGroup.toStructField())
  }

  override def copy(extra: ParamMap): Binning = defaultCopy[Binning](extra).setParent(parent)
}

object OptimalBinning extends DefaultParamsReadable[OptimalBinning]
object Binning extends DefaultParamsReadable[Binning]

/** Pure-Scala port of the reference's split optimizer (Binning.scala:145-251):
  * linear-interpolated quantile init, MSE-from-ideal-count target (with the
  * reference's integer division of the ideal count preserved), monotonicity-
  * preserving diff encoding, breeze LBFGS with approximate gradient.
  * Driver-side only — inputs are bounded samples.
  */
trait SplitOptimizer {

  protected def fromDiff(diff: Array[Double]): Array[Double] =
    diff.scanLeft(0d)(_ + _).drop(1)

  protected def toDiff(values: Array[Double]): Array[Double] =
    if (values.length <= 1) values
    else values.head +: values.sliding(2).map(s => s(1) - s(0)).toArray

  protected def quantiles(x: Array[Double])(percentiles: Array[Double]): Array[Double] = {
    val as = x.sorted
    percentiles.map { p =>
      val i = p * (as.length - 1)
      val lb = i.toInt
      val ub = math.ceil(i).toInt
      val w = i - lb
      as(lb) * (1 - w) + as(ub) * w
    }
  }

  /** MSE from the ideal equi-count split (integer ideal, as the reference). */
  protected def error(counts: Array[Int]): Double = {
    val sum = counts.sum
    val bins = counts.length
    counts.map(_ - (sum / bins)).map(d => math.pow(d, 2)).sum / bins
  }

  protected class OptimalSplitTargetFunction(x: Array[Double], splits: Int)
      extends breeze.optimize.DiffFunction[breeze.linalg.DenseVector[Double]] {
    import breeze.linalg.DenseVector

    val init: DenseVector[Double] = {
      val percentile = (1 to splits).map(_.toDouble / (splits + 1)).toArray
      DenseVector(toDiff(quantiles(x)(percentile)))
    }

    private val targetFunction: DenseVector[Double] => Double = p => error(counts(p))

    def counts(p: DenseVector[Double]): Array[Int] = {
      val ss = Double.NegativeInfinity +: fromDiff(p.toArray) :+ Double.PositiveInfinity
      ss.sliding(2).map(s => x.count(v => v >= s(0) && v < s(1))).toArray
    }

    private val gradient = new breeze.optimize.ApproximateGradientFunction(targetFunction)

    def calculate(p: DenseVector[Double]): (Double, DenseVector[Double]) =
      (targetFunction(p), gradient.gradientAt(p))
  }

  def optimalSplit(x: Array[Double], splits: Int, maxIter: Int = 100, m: Int = 3): Array[Double] = {
    require(splits >= 3, "Target splits should be greater or equal 3")
    val lbfgs = new breeze.optimize.LBFGS[breeze.linalg.DenseVector[Double]](maxIter, m)
    val f = new OptimalSplitTargetFunction(x, splits)
    fromDiff(lbfgs.minimize(f, f.init).toArray)
  }
}
