package graft.similarity

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** L2-normalization + symmetric int8 quantization of an embedding column —
  * the storage/bandwidth workhorse of a vector corpus at scale (4× smaller
  * than float32, 8× than float64; dot products on int8 vectors
  * reconstruct cosine up to the stored per-vector scale).
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * Per vector: `u = v / ||v||`, `scale = 127 / max|u_i|`,
  * `q_i = round(u_i * scale)` (half away from zero, like SQL ROUND) — so
  * `u_i ≈ q_i / scale` with component error ≤ 0.5/scale. Zero vectors pass
  * through as all-zero with scale null.
  *
  * Row-local built-in expressions only: no shuffle, no UDF, replayable as
  * ANSI SQL by the correctness oracle. (The transform/aggregate lambdas run
  * interpreted, but this is a once-per-row pass over dim elements on a
  * write path, not a join kernel.)
  */
class EmbeddingQuantizer(override val uid: String) extends Transformer
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("embedQuant"))

  final val inputCol: Param[String] = new Param[String](this, "inputCol", "Embedding column")
  final val outputCol: Param[String] = new Param[String](this, "outputCol",
    "Quantized int8 output column (array<int>)")
  final val scaleCol: Param[String] = new Param[String](this, "scaleCol",
    "Per-vector scale output column")

  setDefault(inputCol -> "embedding", outputCol -> "q", scaleCol -> "scale")

  def setInputCol(value: String): this.type = set(inputCol, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)
  def setScaleCol(value: String): this.type = set(scaleCol, value)

  private def norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0d), (acc, x) => acc + x * x))

  override def transform(dataset: Dataset[_]): DataFrame = {
    // the Transformer method shadows functions.transform — qualify the HOF
    val mapArr = org.apache.spark.sql.functions.transform(_: Column, _: Column => Column)
    val v = col($(inputCol)).cast("array<double>")
    // materialize the norm and scale as their own projections and reference
    // them as ATTRIBUTES inside the lambdas: lambda-bearing expressions are
    // not CSE'd, so inlining `scale` (which embeds amax -> u -> norm) into
    // the per-element round() re-evaluates the O(dim) norm and O(dim^2)
    // amax PER ELEMENT — O(dim^3) per row. Staged, each is computed once
    // per row and the whole pass is O(dim) (multiply-used non-cheap
    // projections survive CollapseProject; same shape as
    // EmbeddingNormalizer.transform). The temp name is DETERMINISTIC
    // (not uid-qualified: randomUID baked a per-instance token into the
    // plan, so the same query hashed differently every run — r12
    // plan-stability find) and collides loudly instead of silently
    // overwriting a caller's column.
    val nName = s"__norm_embedQuant_${$(inputCol)}"
    require(!dataset.columns.contains(nName),
      s"input already has a column named $nName (the quantizer's temp name)")
    val n = col(nName)
    dataset
      .withColumn(nName, norm(v))
      .withColumn($(scaleCol),
        when(n > 0, lit(127.0) / array_max(mapArr(v, x => abs(x / n)))))
      .withColumn($(outputCol),
        when(n > 0, mapArr(v, x => round(x / n * col($(scaleCol))).cast("int")))
          .otherwise(mapArr(v, _ => lit(0))))
      .drop(nName)
  }

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields ++ Seq(
      StructField($(scaleCol), DoubleType),
      StructField($(outputCol), ArrayType(IntegerType))))

  override def copy(extra: ParamMap): EmbeddingQuantizer = defaultCopy(extra)
}

object EmbeddingQuantizer extends DefaultParamsReadable[EmbeddingQuantizer]
