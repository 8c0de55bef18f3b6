package graft.feature

import org.apache.spark.SparkException
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.attribute.NominalAttribute
import org.apache.spark.ml.param._
import org.apache.spark.ml.param.shared.{HasInputCol, HasOutputCol}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

private[feature] trait StringIndexerBase extends Params with HasInputCol with HasOutputCol {
  protected def validateAndTransformSchema(schema: StructType): StructType = {
    val inputDataType = schema($(inputCol)).dataType
    require(inputDataType == StringType || inputDataType.isInstanceOf[NumericType],
      s"The input column ${$(inputCol)} must be string or numeric, got $inputDataType")
    require(!schema.fieldNames.contains($(outputCol)),
      s"Output column ${$(outputCol)} already exists.")
    StructType(schema.fields :+ StructField($(outputCol), ShortType, nullable = false))
  }
}

/** Label indexer mapping a string (or numeric, cast to string) column to
  * SHORT indices in frequency-descending order — most frequent label gets 0.
  *
  * Reference: sparkext-mllib/.../feature/StringToShortIndexer.scala:21-106.
  * Differences, documented:
  *  - fit is a DataFrame `groupBy(col).count()` (distributed partial agg +
  *    one shuffle on the label) instead of RDD `countByValue` (which
  *    collects the full map to the driver before reducing)
  *  - frequency ties are broken by label ascending (the reference's
  *    `sortBy(-count)` is unstable across runs)
  *  - unseen label at transform → error (matches reference)
  *  - missing input column at transform → silent no-op (matches reference)
  *
  * Cardinality is hard-capped at Short.MaxValue, so the driver-side label
  * array is bounded by construction — safe at any data scale.
  */
class StringToShortIndexer(override val uid: String)
    extends Estimator[StringToShortIndexerModel] with StringIndexerBase
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("strShortIdx"))

  def setInputCol(value: String): this.type = set(inputCol, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)

  override def fit(dataset: Dataset[_]): StringToShortIndexerModel = {
    // limit(Short.MaxValue + 1): never collect unboundedly before the require
    val counted = dataset.select(col($(inputCol)).cast(StringType).as("label"))
      .where(col("label").isNotNull)
      .groupBy("label").count()
      .orderBy(col("count").desc, col("label"))
      .limit(Short.MaxValue + 1)
      .collect()
    require(counted.length <= Short.MaxValue,
      s"Unique labels count (>${Short.MaxValue}) should be less than Short.MaxValue")
    val labels = counted.map(_.getString(0))
    copyValues(new StringToShortIndexerModel(uid, labels).setParent(this))
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)

  override def copy(extra: ParamMap): StringToShortIndexer = defaultCopy(extra)
}

class StringToShortIndexerModel(override val uid: String)
    extends Model[StringToShortIndexerModel] with StringIndexerBase
    with DefaultParamsWritable {

  def this(uid: String, labels: Array[String]) = { this(uid); set(labelsParam, labels) }
  def this(labels: Array[String]) = this(Identifiable.randomUID("strShortIdx"), labels)

  /** Ordered dictionary as a param so `save`/`load` round-trips it; the
    * Short.MaxValue cap is the param validator (was a constructor require).
    */
  final val labelsParam: StringArrayParam = new StringArrayParam(this, "labels",
    s"Ordered label dictionary (index = position, < ${Short.MaxValue} entries)",
    (l: Array[String]) => l.length <= Short.MaxValue)

  def labels: Array[String] = $(labelsParam)

  @transient private lazy val labelToIndex: Map[String, Short] =
    labels.zipWithIndex.map { case (l, i) => l -> i.toShort }.toMap

  def setInputCol(value: String): this.type = set(inputCol, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)

  override def transform(dataset: Dataset[_]): DataFrame = {
    if (!dataset.schema.fieldNames.contains($(inputCol))) {
      logInfo(s"Input column ${$(inputCol)} does not exist. Skip StringToShortIndexerModel.")
      return dataset.toDF()
    }
    val localIndex = labelToIndex
    val indexer = udf { (label: String) =>
      localIndex.getOrElse(label,
        throw new SparkException(s"Unseen label: $label."))
    }
    val metadata = NominalAttribute.defaultAttr
      .withName($(outputCol)).withValues(labels).toMetadata()
    dataset.select(col("*"),
      indexer(col($(inputCol)).cast(StringType)).as($(outputCol), metadata))
  }

  override def transformSchema(schema: StructType): StructType =
    if (schema.fieldNames.contains($(inputCol))) validateAndTransformSchema(schema)
    else schema

  override def copy(extra: ParamMap): StringToShortIndexerModel = {
    val copied = new StringToShortIndexerModel(uid)
    copyValues(copied, extra).setParent(parent)
  }
}

object StringToShortIndexer extends DefaultParamsReadable[StringToShortIndexer]
object StringToShortIndexerModel extends DefaultParamsReadable[StringToShortIndexerModel]
