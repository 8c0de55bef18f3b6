package graft.text

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{IntParam, Param, ParamMap, ParamValidators}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.dedup.TextNormalizer

/** Sliding-window document chunking: each document's normalized token
  * stream becomes overlapping chunks of `chunkSize` tokens starting every
  * `stride` tokens — the context-window prepass for RAG indexing and for
  * packing long documents into bounded training sequences.
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * Chunk count per doc is `ceil(max(n - chunkSize, 0) / stride) + 1` (one
  * chunk covers a short doc whole; the last chunk may be shorter than
  * `chunkSize`, never empty). Entirely row-local — tokenize, `sequence`
  * over chunk starts, OUTER posexplode (the house InferFiltersFromGenerate
  * guard: a plain explode would clone the tokenizer chain into a per-row
  * scan filter), `slice` per chunk — so it scales like a map over the
  * corpus with fan-out ~n/stride and no shuffle at all.
  */
class Chunker(override val uid: String) extends Transformer
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("chunker"))

  final val idCol: Param[String] = new Param[String](this, "idCol", "Document id column")
  final val textCol: Param[String] = new Param[String](this, "textCol", "Text column")
  final val chunkSize: IntParam = new IntParam(this, "chunkSize",
    "Tokens per chunk", ParamValidators.gt(0))
  final val stride: IntParam = new IntParam(this, "stride",
    "Tokens between chunk starts (<= chunkSize for overlap)", ParamValidators.gt(0))

  setDefault(idCol -> "doc_id", textCol -> "text", chunkSize -> 64, stride -> 48)

  def setIdCol(value: String): this.type = set(idCol, value)
  def setTextCol(value: String): this.type = set(textCol, value)
  def setChunkSize(value: Int): this.type = set(chunkSize, value)
  def setStride(value: Int): this.type = set(stride, value)

  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema)
    val cs = $(chunkSize)
    val st = $(stride)
    // sequence(0, lastChunk) is non-empty even for n = 0 (blank docs
    // tokenize to []), so every doc gets at least one chunk — blank docs
    // one EMPTY chunk (chunk_tokens 0); last chunk index =
    // ceil(max(n - chunkSize, 0) / stride)
    val n = size(col("tl"))
    val lastChunk = ceil(greatest(n - cs, lit(0)).cast("double") / st).cast("int")
    dataset.select(col($(idCol)), TextNormalizer.tokens(col($(textCol))).as("tl"))
      .select(col($(idCol)), col("tl"),
        posexplode_outer(sequence(lit(0), lastChunk)))
      .select(
        col($(idCol)),
        col("col").cast("int").as("chunk_id"),
        array_join(slice(col("tl"), col("col") * st + 1, lit(cs)), " ").as("chunk_text"),
        least(lit(cs), size(col("tl")) - col("col") * st).cast("long").as("chunk_tokens"))
  }

  override def transformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(idCol)), s"id column ${$(idCol)} not found")
    require(schema($(textCol)).dataType == StringType,
      s"text column must be string, got ${schema($(textCol)).dataType}")
    require($(stride) <= $(chunkSize),
      s"stride ${$(stride)} > chunkSize ${$(chunkSize)} would skip tokens")
    StructType(Seq(
      schema($(idCol)),
      StructField("chunk_id", IntegerType),
      StructField("chunk_text", StringType),
      StructField("chunk_tokens", LongType)))
  }

  override def copy(extra: ParamMap): Chunker = defaultCopy(extra)
}

object Chunker extends DefaultParamsReadable[Chunker]
