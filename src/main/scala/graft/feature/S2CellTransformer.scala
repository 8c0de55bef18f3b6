package graft.feature

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.geo.S2

/** Maps (lat, lon) to an S2 cell-id token string at a given level
  * (reference: sparkext-mllib/.../feature/S2CellTransformer.scala:15-90,
  * UDF at :58-61: `S2CellId.fromLatLng(...).parent(level).toToken`).
  *
  * Cell math is the pure-Scala [[graft.geo.S2]] (no offline s2-geometry
  * jar). Row-local UDF — map-only plan, no shuffle, scales linearly; the
  * token is a stable partitioning/grouping key for geo aggregation at any
  * scale.
  */
class S2CellTransformer(override val uid: String) extends Transformer
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("s2CellTransformer"))

  final val latCol = new Param[String](this, "latCol", "Latitude column (Double, degrees)")
  final val lonCol = new Param[String](this, "lonCol", "Longitude column (Double, degrees)")
  final val cellCol = new Param[String](this, "cellCol", "Output cell token column")
  final val level = new IntParam(this, "level", "S2 level (0-30)",
    (v: Int) => v >= 0 && v <= 30)

  setDefault(latCol -> "lat", lonCol -> "lon", cellCol -> "cell", level -> 10)

  def setLatCol(value: String): this.type = set(latCol, value)
  def setLonCol(value: String): this.type = set(lonCol, value)
  def setCellCol(value: String): this.type = set(cellCol, value)
  def setLevel(value: Int): this.type = set(level, value)

  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema)
    val lvl = $(level)
    val toCell = udf { (lat: Double, lon: Double) =>
      S2.token(S2.parent(S2.fromLatLngDegrees(lat, lon), lvl))
    }
    dataset.select(col("*"),
      toCell(col($(latCol)), col($(lonCol))).as($(cellCol)))
  }

  override def transformSchema(schema: StructType): StructType = {
    require(schema($(latCol)).dataType == DoubleType,
      s"Latitude column ${$(latCol)} must be DoubleType")
    require(schema($(lonCol)).dataType == DoubleType,
      s"Longitude column ${$(lonCol)} must be DoubleType")
    require(!schema.fieldNames.contains($(cellCol)),
      s"Output column ${$(cellCol)} already exists")
    StructType(schema.fields :+ StructField($(cellCol), StringType, nullable = false))
  }

  override def copy(extra: ParamMap): S2CellTransformer = defaultCopy(extra)
}

object S2CellTransformer extends DefaultParamsReadable[S2CellTransformer]
