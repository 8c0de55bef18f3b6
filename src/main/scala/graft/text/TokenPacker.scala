package graft.text

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{LongParam, Param, ParamMap, ParamValidators, StringArrayParam}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic token-budget chunking for training-batch assembly: in
  * ascending id order, documents are assigned to consecutive chunks of
  * ~`budget` tokens (`chunk = floor(exclusive_prefix_tokens / budget)`) —
  * the sequence-packing prepass that turns a filtered corpus into
  * fixed-budget training shards.
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * The running total is [[graft.sql.PrefixSum]]'s two-phase bucketed
  * prefix sum — fully parallel, no global single-partition window, so the
  * assignment scales like a keyed aggregation while staying byte-stable
  * across partitionings (it depends only on id order, not execution
  * order). A document larger than `budget` gets its own chunk(s) boundary
  * — chunks are a packing approximation, not a hard cap.
  */
class TokenPacker(override val uid: String) extends Transformer
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("tokenPacker"))

  final val idCol: Param[String] = new Param[String](this, "idCol",
    "Numeric unique id column defining pack order")
  final val textCol: Param[String] = new Param[String](this, "textCol", "Text column")
  final val budget: LongParam = new LongParam(this, "budget",
    "Target tokens per chunk", ParamValidators.gt(0))
  final val carryCols: StringArrayParam = new StringArrayParam(this, "carryCols",
    "Extra columns passed through to the output unchanged")
  final val tokensCol: Param[String] = new Param[String](this, "tokensCol",
    "Optional precomputed per-row token count column; empty means estimate " +
      "from textCol. Production shard packing should budget on REAL " +
      "tokenizer counts (e.g. BpeTrainer.segment subword counts), not the " +
      "regex estimate — the estimate undercounts subword-heavy text and " +
      "overstuffs chunks.")

  setDefault(idCol -> "doc_id", textCol -> "text", budget -> 4096L,
    carryCols -> Array.empty[String], tokensCol -> "")

  def setIdCol(value: String): this.type = set(idCol, value)
  def setTextCol(value: String): this.type = set(textCol, value)
  def setBudget(value: Long): this.type = set(budget, value)
  def setCarryCols(value: Array[String]): this.type = set(carryCols, value)
  def setTokensCol(value: String): this.type = set(tokensCol, value)

  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema)
    val keep = col($(idCol)) +: $(carryCols).toSeq.map(col)
    val counted = (if ($(tokensCol).nonEmpty) {
      val renamed = dataset.select(keep :+ col($(tokensCol)): _*)
        .withColumn("n_tokens", col($(tokensCol)).cast("long"))
      if ($(tokensCol) == "n_tokens") renamed else renamed.drop($(tokensCol))
    } else {
      dataset.select(keep :+ col($(textCol)): _*)
        .withColumn("n_tokens", TextFunctions.tokenCount(col($(textCol))).cast("long"))
        .drop($(textCol))
    })
      // PrefixSum's two-phase scan references its input three times
      // (min/max stats, bucketing, per-bucket totals). The projection here
      // is a few longs per row — pin it (lazy localCheckpoint: first action
      // materializes, later references reuse the blocks) so an expensive
      // upstream pipeline (filter → score → dedup) is not re-executed per
      // reference. At 100 TB, re-running the corpus pipeline 3× costs far
      // more than storing id+count per surviving document.
      .localCheckpoint(false)
    graft.sql.PrefixSum.exclusive(counted, $(idCol), "n_tokens", "prefix_tokens")
      .withColumn("chunk",
        floor(col("prefix_tokens") / $(budget).toDouble).cast("long"))
      .select(col($(idCol)) +: $(carryCols).toSeq.map(col) :+ col("n_tokens")
        :+ col("prefix_tokens") :+ col("chunk"): _*)
  }

  override def transformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(idCol)), s"id column ${$(idCol)} not found")
    if ($(tokensCol).nonEmpty) {
      require(schema.fieldNames.contains($(tokensCol)),
        s"tokens column ${$(tokensCol)} not found")
      require(schema($(tokensCol)).dataType.isInstanceOf[NumericType],
        s"tokens column must be numeric, got ${schema($(tokensCol)).dataType}")
    } else
    require(schema($(textCol)).dataType == StringType,
      s"text column must be string, got ${schema($(textCol)).dataType}")
    $(carryCols).foreach { c =>
      require(schema.fieldNames.contains(c), s"carry column $c not found") }
    StructType(
      schema($(idCol)) +: $(carryCols).toSeq.map(schema(_)) :+
      StructField("n_tokens", LongType) :+
      StructField("prefix_tokens", LongType) :+
      StructField("chunk", LongType))
  }

  override def copy(extra: ParamMap): TokenPacker = defaultCopy(extra)
}

object TokenPacker extends DefaultParamsReadable[TokenPacker]
