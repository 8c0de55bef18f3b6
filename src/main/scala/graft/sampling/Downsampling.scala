package graft.sampling

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param._
import org.apache.spark.ml.param.shared.{HasLabelCol, HasOutputCol}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

private[sampling] trait DownsamplingParams extends Params with HasLabelCol with HasOutputCol {

  final val primaryClass = new DoubleParam(this, "primaryClass",
    "Primary class to keep (0.0 or 1.0)", (v: Double) => v == 0.0 || v == 1.0)
  final val sampleWithReplacement = new BooleanParam(this, "sampleWithReplacement",
    "Sample secondary class with replacement")
  final val deterministicIdCol = new Param[String](this, "deterministicIdCol",
    "When non-empty: sample the secondary class by md5 membership of this " +
      "id column instead of df.sample — row membership depends only on the " +
      "id, so the sample is stable across runs, partitionings, cluster " +
      "sizes, and engines (the SQL oracle replays it exactly). " +
      "Without-replacement only; sampleWithReplacement is ignored.")

  def getPrimaryClass: Double = $(primaryClass)
  def getOutputColName: String = $(outputCol)

  setDefault(outputCol -> (uid + "_sample_weight"), deterministicIdCol -> "")

  protected def validateAndTransformSchema(schema: StructType): StructType = {
    require(schema($(labelCol)).dataType == DoubleType,
      s"Label column data type ${schema($(labelCol)).dataType} is not supported.")
    require($(deterministicIdCol).isEmpty ||
      schema.fieldNames.contains($(deterministicIdCol)),
      s"deterministicIdCol ${$(deterministicIdCol)} not found in schema")
    StructType(schema.fields :+ StructField($(outputCol), DoubleType, nullable = false))
  }
}

/** Class-ratio-capped negative downsampling (reference:
  * sparkext-mllib/.../sampling/Downsampling.scala:44-96): if
  * secondary/primary ≤ maxClassRatio the model is a no-op (weight 1.0),
  * otherwise the secondary class is sampled down to
  * `primary * maxClassRatio` rows, weighted 1/fraction.
  *
  * Scale: fit is two distributed `count()` jobs (combined into ONE pass
  * here via conditional aggregation); transform is filter+sample+union —
  * all narrow after the scan, no shuffle.
  *
  * With `deterministicIdCol` set, the sampled branch uses md5-membership
  * (HashSampler's bucket math) instead of `df.sample`: reproducible across
  * runs/partitionings/engines, so the correctness oracle can hash-match
  * the sampled output, not just the no-op branch.
  */
class Downsampling(override val uid: String)
    extends Estimator[DownsamplingModel] with DownsamplingParams
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("downsampling"))

  final val maxClassRatio = new DoubleParam(this, "maxClassRatio", "Max class ratio",
    (v: Double) => v > 0.0 && v <= 1000.0)

  def setLabelCol(value: String): this.type = set(labelCol, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)
  def setPrimaryClass(value: Double): this.type = set(primaryClass, value)
  def setMaxClassRatio(value: Double): this.type = set(maxClassRatio, value)
  def setSampleWithReplacement(value: Boolean): this.type = set(sampleWithReplacement, value)
  def setDeterministicIdCol(value: String): this.type = set(deterministicIdCol, value)

  setDefault(primaryClass -> 1.0, maxClassRatio -> 30.0, sampleWithReplacement -> false)

  override def fit(dataset: Dataset[_]): DownsamplingModel = {
    validateAndTransformSchema(dataset.schema)
    // single scan: conditional count instead of the reference's two jobs
    val row = dataset.select(
      count(when(col($(labelCol)) === $(primaryClass), 1)).as("primary"),
      count(when(col($(labelCol)) =!= $(primaryClass), 1)).as("secondary"))
      .first()
    val primaryCnt = row.getLong(0)
    val secondaryCnt = row.getLong(1)
    require(primaryCnt > 0, s"Primary class ${$(primaryClass)} should be present in dataset")

    val classRatio = secondaryCnt.toDouble / primaryCnt
    val fraction =
      if (classRatio <= $(maxClassRatio)) None
      else Some(primaryCnt * $(maxClassRatio) / secondaryCnt)
    copyValues(new DownsamplingModel(uid, fraction).setParent(this))
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)

  override def copy(extra: ParamMap): Downsampling = defaultCopy(extra)
}

class DownsamplingModel(override val uid: String)
    extends Model[DownsamplingModel] with DownsamplingParams
    with DefaultParamsWritable {

  def this(uid: String, fraction: Option[Double]) = {
    this(uid); fraction.foreach(f => set(sampleFractionParam, f))
  }
  def this(sampleFraction: Option[Double]) =
    this(Identifiable.randomUID("downsampling"), sampleFraction)

  /** Learned fraction as an (optionally unset) param — unset means the
    * no-op branch; persistence round-trips either state.
    */
  final val sampleFractionParam = new DoubleParam(this, "sampleFraction",
    "Secondary-class sample fraction (unset = class ratio under cap, no-op)",
    (v: Double) => v > 0.0 && v <= 1.0)

  def sampleFraction: Option[Double] = get(sampleFractionParam)

  def setLabelCol(value: String): this.type = set(labelCol, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)
  def setPrimaryClass(value: Double): this.type = set(primaryClass, value)
  def setSampleWithReplacement(value: Boolean): this.type = set(sampleWithReplacement, value)
  def setDeterministicIdCol(value: String): this.type = set(deterministicIdCol, value)

  setDefault(primaryClass -> 1.0, sampleWithReplacement -> false)

  override def transform(dataset: Dataset[_]): DataFrame = sampleFraction match {
    case None =>
      dataset.select(col("*"), lit(1.0).as($(outputCol)))
    case Some(fraction) =>
      // NULL labels are NOT the secondary class: both `=== primary` and
      // `=!= primary` are null-false, so the naive split silently DROPPED
      // null-label rows here while the no-op branch (fraction unset) kept
      // them — row membership flip-flopping with the learned class ratio.
      // Keep them with weight 1.0, like the primary side: only rows
      // provably of the secondary class are sampled.
      val primary = dataset
        .filter(col($(labelCol)) === $(primaryClass) || col($(labelCol)).isNull)
        .select(col("*"), lit(1.0).as($(outputCol)))
      val secondaryRows = dataset.filter(col($(labelCol)) =!= $(primaryClass))
      val sampled =
        if ($(deterministicIdCol).nonEmpty) {
          // md5 membership: the first 8 hex chars are uniform on [0, 2^32);
          // keep iff hash < fraction * 2^32 — same namespaced-bucket math
          // as HashSampler, replayable as ANSI SQL by the oracle
          val h = graft.sql.functions.uniform32("ds", col($(deterministicIdCol)))
          secondaryRows.where(h < lit(fraction * 4294967296.0))
        } else {
          secondaryRows.sample(withReplacement = $(sampleWithReplacement), fraction)
        }
      primary.unionByName(
        sampled.select(col("*"), lit(1.0 / fraction).as($(outputCol))))
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)

  override def copy(extra: ParamMap): DownsamplingModel = {
    val copied = new DownsamplingModel(uid)
    copyValues(copied, extra).setParent(parent)
  }
}

object Downsampling extends DefaultParamsReadable[Downsampling]
object DownsamplingModel extends DefaultParamsReadable[DownsamplingModel]
