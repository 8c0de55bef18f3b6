package graft.feature

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Long→wide reshape (R `tidyr::gather` analogue): for each primary key,
  * aggregate (key, value) pairs and collect them into one
  * `ARRAY&lt;STRUCT&lt;key, value:DOUBLE&gt;&gt;` column.
  *
  * Semantics match the reference transformer (reference:
  * sparkext-mllib/src/main/scala/org/apache/spark/ml/feature/Gather.scala:47-120):
  *   - two-level aggregation: `groupBy(pk :+ key).agg(sum|count(value))` then
  *     `groupBy(pk).agg(collect_list(struct(key, value)))`
  *   - the aggregated value is ALWAYS cast to Double regardless of the input
  *     numeric type (Gather.scala:83,111)
  *   - DELIBERATE DIVERGENCE: a key whose values are ALL null aggregates to
  *     null and we drop the (key, null) pair entirely. The reference keeps
  *     it — its `collectArray(struct(key, value))` only skips null
  *     top-level elements, and struct(key, null) is non-null
  *     (reference Gather.scala:81-83 + aggregates.scala:37-56). We prefer
  *     arrays without null values (`containsNull=false` holds for the
  *     value field in practice); GatherSpec pins this behavior.
  *   - `copy` returns a Gather (the reference's copy() returning
  *     S2CellTransformer at Gather.scala:118 is a copy-paste bug we fix).
  *
  * Scale: both levels are hash aggregates that shuffle on their grouping
  * keys; Catalyst plans partial (map-side) aggregation for the first level,
  * and the second level shuffles only the already-reduced (pk, key) rows.
  * No driver-side state; safe at any scale where per-pk arrays fit in an
  * executor row (bounded by key cardinality, same contract as reference).
  */
class Gather(override val uid: String) extends Transformer
    with HasKeyCol with HasValueCol with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("gather"))

  final val primaryKeyCols: StringArrayParam = new StringArrayParam(this,
    "primaryKeyCols", "Primary key column names (at least one)",
    (v: Array[String]) => v.nonEmpty)
  final val valueAgg: Param[String] = new Param[String](this, "valueAgg",
    "Aggregation for values: sum | count",
    ParamValidators.inArray(Array("sum", "count")))
  final val outputCol: Param[String] = new Param[String](this, "outputCol",
    "Output column name")

  setDefault(valueAgg -> "sum", outputCol -> (uid + "_output"))

  def setPrimaryKeyCols(values: String*): this.type = set(primaryKeyCols, values.toArray)
  def setKeyCol(value: String): this.type = set(keyCol, value)
  def setValueCol(value: String): this.type = set(valueCol, value)
  def setValueAgg(value: String): this.type = set(valueAgg, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)

  def getPrimaryKeyCols: Array[String] = $(primaryKeyCols)

  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema)
    val pk = $(primaryKeyCols).toIndexedSeq.map(col)
    val key = $(keyCol)
    val value = $(valueCol)
    val agg = $(valueAgg) match {
      case "sum"   => sum(col(value))
      case "count" => count(col(value))
    }
    dataset
      .groupBy(pk :+ col(key): _*)
      .agg(agg.cast(DoubleType).as(value))
      .where(col(value).isNotNull)
      .groupBy(pk: _*)
      .agg(collect_list(struct(col(key), col(value))).as($(outputCol)))
  }

  override def transformSchema(schema: StructType): StructType = {
    $(primaryKeyCols).foreach { c =>
      require(schema.fieldNames.contains(c), s"Primary key column $c not found")
    }
    val keyField = schema($(keyCol))
    require(keyField.dataType.isInstanceOf[NumericType] || keyField.dataType == StringType,
      s"Key column must be string or numeric, got ${keyField.dataType}")
    val valueField = schema($(valueCol))
    require(valueField.dataType.isInstanceOf[NumericType],
      s"Value column must be numeric, got ${valueField.dataType}")
    val outStruct = StructType(Seq(
      StructField($(keyCol), keyField.dataType, nullable = true),
      StructField($(valueCol), DoubleType, nullable = true)))
    StructType(
      $(primaryKeyCols).map(schema(_)) :+
        StructField($(outputCol), ArrayType(outStruct, containsNull = false)))
  }

  override def copy(extra: ParamMap): Gather = defaultCopy(extra)
}

object Gather extends DefaultParamsReadable[Gather]
