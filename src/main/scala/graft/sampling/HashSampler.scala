package graft.sampling

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic hash-based sampling and train/validation splitting: a row
  * is kept iff `md5(salt || id) mod 100 < percent`. Unlike `df.sample`,
  * membership depends only on (salt, id) — stable across runs, partitions,
  * cluster sizes, and engines (the SQL oracle replays it exactly), and
  * disjoint salts give independent samples. The standard way to carve
  * reproducible held-out sets from a 100 TB corpus.
  */
class HashSampler(override val uid: String) extends Transformer
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("hashSampler"))

  final val idCol: Param[String] = new Param[String](this, "idCol", "Stable row id column")
  final val percent: IntParam = new IntParam(this, "percent",
    "Percentage of rows to keep, 0..100", ParamValidators.inRange(0, 100))
  final val salt: Param[String] = new Param[String](this, "salt",
    "Namespace salt: different salts give independent samples")

  setDefault(idCol -> "doc_id", percent -> 10, salt -> "graft")

  def setIdCol(value: String): this.type = set(idCol, value)
  def setPercent(value: Int): this.type = set(percent, value)
  def setSalt(value: String): this.type = set(salt, value)

  /** The bucket (0..99) this row's id hashes into. */
  def bucket: Column =
    graft.sql.functions.uniform32($(salt), col($(idCol))) % 100

  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema)
    dataset.where(bucket < $(percent)).toDF()
  }

  /** Complement of [[transform]] — e.g. the training side of a split. */
  def transformComplement(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema)
    dataset.where(bucket >= $(percent)).toDF()
  }

  override def transformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(idCol)), s"id column ${$(idCol)} not found")
    schema
  }

  override def copy(extra: ParamMap): HashSampler = defaultCopy(extra)
}

object HashSampler extends DefaultParamsReadable[HashSampler]
