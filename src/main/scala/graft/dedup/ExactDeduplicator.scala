package graft.dedup

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact near-duplicate removal by content fingerprint: normalize the text
  * column, hash it (sha2-256), and keep one canonical row per fingerprint
  * (lowest id wins — deterministic).
  *
  * Beyond-reference operator (the reference has no dedup; this is the
  * LLM-training-pipeline extension mandated by the build brief).
  *
  * Scale: the drop-duplicates path is a `min_by` hash aggregation on the
  * fingerprint — partial aggregation collapses duplicate groups MAP-SIDE,
  * so the exchange carries at most one (row, text) per fingerprint per
  * input partition instead of every duplicate, and there is no sort.
  * 256-bit keys are uniform; no driver state, no collect. The
  * keepDuplicates flag path still uses the per-fingerprint window (every
  * row survives anyway, so there is nothing for a partial agg to trim).
  */
class ExactDeduplicator(override val uid: String) extends Transformer
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("exactDedup"))

  final val idCol: Param[String] = new Param[String](this, "idCol",
    "Document id column (ties broken by smallest id)")
  final val textCol: Param[String] = new Param[String](this, "textCol",
    "Text column to fingerprint")
  final val fingerprintCol: Param[String] = new Param[String](this, "fingerprintCol",
    "Output fingerprint column name")
  final val keepDuplicates: BooleanParam = new BooleanParam(this, "keepDuplicates",
    "If true, keep all rows and only add fingerprint + is_canonical columns")

  setDefault(idCol -> "doc_id", textCol -> "text",
    fingerprintCol -> "fingerprint", keepDuplicates -> false)

  def setIdCol(value: String): this.type = set(idCol, value)
  def setTextCol(value: String): this.type = set(textCol, value)
  def setFingerprintCol(value: String): this.type = set(fingerprintCol, value)
  def setKeepDuplicates(value: Boolean): this.type = set(keepDuplicates, value)

  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema)
    val fp = sha2(TextNormalizer.normalize(col($(textCol))), 256)
    val keyed = dataset.withColumn($(fingerprintCol), fp)
    if ($(keepDuplicates)) {
      val w = Window.partitionBy(col($(fingerprintCol))).orderBy(col($(idCol)))
      keyed.withColumn("is_canonical", row_number().over(w) === 1)
    } else ExactDeduplicator.lowestIdPerGroup(keyed, $(fingerprintCol), $(idCol))
  }

  override def transformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(idCol)), s"id column ${$(idCol)} not found")
    require(schema($(textCol)).dataType == StringType,
      s"text column must be string, got ${schema($(textCol)).dataType}")
    StructType(schema.fields :+ StructField($(fingerprintCol), StringType, nullable = true))
  }

  override def copy(extra: ParamMap): ExactDeduplicator = defaultCopy(extra)
}

object ExactDeduplicator extends DefaultParamsReadable[ExactDeduplicator] {

  /** Incremental ingest dedup: fingerprint the incoming batch, drop rows
    * whose fingerprint already exists in the known corpus, and keep one
    * canonical row per NEW fingerprint (lowest id).
    *
    * The known-set check is a Bloom-pruned anti-join
    * ([[graft.sql.BloomJoin.antiJoin]]): at 100 TB the corpus fingerprint
    * set dwarfs any daily batch, and most incoming rows are genuinely new —
    * those miss the filter and never pay the join exchange. Within-batch
    * dedup is the same hash-partitioned window as the batch transformer.
    *
    * @param knownFingerprints one column named `fpCol` (sha2-256 hex of the
    *                          normalized text, as produced by this class)
    */
  def incremental(
      incoming: Dataset[_],
      knownFingerprints: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      fpCol: String = "fingerprint",
      numBits: Int = 1 << 20): DataFrame = {
    val withFp = incoming.withColumn(fpCol,
      sha2(TextNormalizer.normalize(col(textCol)), 256))
    val fresh = graft.sql.BloomJoin.antiJoin(
      withFp, col(fpCol), knownFingerprints, col(fpCol), numBits)
    lowestIdPerGroup(fresh, fpCol, idCol)
  }

  /** Keep the lowest-id row per group as a `min_by` hash aggregation —
    * unlike a first-row window, partial aggregation discards duplicates
    * map-side (the shuffle never carries a duplicate group's texts) and
    * nothing sorts. Ids are assumed unique (min_by tie order is otherwise
    * unspecified, same as the window's row_number between equal ids).
    */
  private[dedup] def lowestIdPerGroup(
      keyed: DataFrame, fpCol: String, idCol: String): DataFrame = {
    val cols = keyed.columns
    keyed.groupBy(col(fpCol))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("__r"))
      .select(cols.map(c => col(s"__r.`$c`").as(c)): _*)
  }
}
