package graft.text

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PII-style scrubbing for training corpora: masks emails, URLs, and long
  * digit runs with typed placeholders, and reports how many spans were
  * redacted per document — the privacy-filtering pass that runs before a
  * corpus ships.
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  * Pure `regexp_replace`/`regexp_count` chains (row-local, shuffle-free,
  * codegen) with RE2-compatible patterns, so the SQL oracle replays the
  * exact rewrite. Patterns are deliberately simple/conservative — a
  * production scrubber would add locale-specific validators around the
  * same plumbing.
  */
class TextRedactor(override val uid: String) extends Transformer
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("textRedactor"))

  final val textCol: Param[String] = new Param[String](this, "textCol", "Text column")
  final val outputCol: Param[String] = new Param[String](this, "outputCol",
    "Redacted text output column")
  final val countCol: Param[String] = new Param[String](this, "countCol",
    "Redacted span count output column")

  setDefault(textCol -> "text", outputCol -> "redacted", countCol -> "n_redactions")

  def setTextCol(value: String): this.type = set(textCol, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)
  def setCountCol(value: String): this.type = set(countCol, value)

  // order matters: emails/urls before digit runs (an email may contain digits)
  private val patterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<email>",
    "https?://[^ ]+" -> "<url>",
    "[0-9]{6,}" -> "<num>")

  /** Redacted text as a column expression. */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (c, (p, repl)) => regexp_replace(c, p, repl) }

  /** Number of spans that will be redacted. */
  def spanCount(text: Column): Column = {
    // count sequentially on the progressively redacted text so an email's
    // digits aren't double-counted as a number
    val (total, _) = patterns.foldLeft((lit(0), text)) {
      case ((acc, cur), (p, repl)) =>
        (acc + regexp_count(cur, lit(p)), regexp_replace(cur, p, repl))
    }
    total
  }

  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema)
    dataset
      .withColumn($(outputCol), redact(col($(textCol))))
      .withColumn($(countCol), spanCount(col($(textCol))).cast("long"))
  }

  override def transformSchema(schema: StructType): StructType = {
    require(schema($(textCol)).dataType == StringType,
      s"text column must be string, got ${schema($(textCol)).dataType}")
    StructType(schema.fields ++ Seq(
      StructField($(outputCol), StringType),
      StructField($(countCol), LongType)))
  }

  override def copy(extra: ParamMap): TextRedactor = defaultCopy(extra)
}

object TextRedactor extends DefaultParamsReadable[TextRedactor]
