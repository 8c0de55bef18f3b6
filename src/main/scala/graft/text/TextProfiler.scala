package graft.text

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Appends the full text-analysis profile to a document frame: token/char
  * counts, average word length, punctuation + stopword ratios, BPE-ish
  * token estimate, heuristic language ID, quality score, and rolling-hash
  * fingerprint. Row-local, shuffle-free, whole-stage-codegen friendly.
  */
class TextProfiler(override val uid: String) extends Transformer
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("textProfiler"))

  final val textCol: Param[String] = new Param[String](this, "textCol", "Text column")
  final val prefix: Param[String] = new Param[String](this, "prefix",
    "Prefix for the appended stat columns")

  setDefault(textCol -> "text", prefix -> "")

  def setTextCol(value: String): this.type = set(textCol, value)
  def setPrefix(value: String): this.type = set(prefix, value)

  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema)
    val t = col($(textCol))
    val p = $(prefix)
    dataset
      .withColumn(p + "n_tokens", TextFunctions.tokenCount(t))
      .withColumn(p + "n_chars", length(t))
      .withColumn(p + "avg_word_len", TextFunctions.avgWordLength(t))
      .withColumn(p + "punct_ratio", TextFunctions.punctRatio(t))
      .withColumn(p + "stopword_ratio", TextFunctions.stopwordRatio(t))
      .withColumn(p + "bpe_tokens", TextFunctions.bpeTokenEstimate(t))
      .withColumn(p + "lang_guess", TextFunctions.languageId(t))
      .withColumn(p + "quality", TextFunctions.qualityScore(t))
      .withColumn(p + "fingerprint", TextFunctions.fingerprint(t))
  }

  override def transformSchema(schema: StructType): StructType = {
    require(schema($(textCol)).dataType == StringType,
      s"text column must be string, got ${schema($(textCol)).dataType}")
    val p = $(prefix)
    StructType(schema.fields ++ Seq(
      StructField(p + "n_tokens", IntegerType),
      StructField(p + "n_chars", IntegerType),
      StructField(p + "avg_word_len", DoubleType),
      StructField(p + "punct_ratio", DoubleType),
      StructField(p + "stopword_ratio", DoubleType),
      StructField(p + "bpe_tokens", IntegerType),
      StructField(p + "lang_guess", StringType),
      StructField(p + "quality", DoubleType),
      StructField(p + "fingerprint", LongType)))
  }

  override def copy(extra: ParamMap): TextProfiler = defaultCopy(extra)
}

object TextProfiler extends DefaultParamsReadable[TextProfiler]
