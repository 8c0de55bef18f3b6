package graft.multimodal

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batched media decode over binary payloads via `mapPartitions` — the
  * Spark-side plumbing (schema, partition preservation, batch shape) for a
  * decode stage whose inner kernel would normally call an image/audio codec.
  *
  * The decode kernel itself is a STUB: this environment ships no codec
  * libraries, so [[MediaDecoder.decodeBatch]] produces deterministic fake
  * features (per-chunk byte means) with the exact signature a real decoder
  * would have (`Iterator[Array[Byte]] → Iterator[Array[Double]]`,
  * batch-at-a-time like an Arrow UDF). Swap the kernel, keep the plumbing.
  * Features are double so the stub's integer→double arithmetic is
  * bit-replayable by the SQL oracle (q54); a production codec would emit
  * float32 — plumbing unchanged.
  *
  * Scale: row-local, no shuffle; `batchSize` bounds peak memory per task
  * (batch of payloads decoded together, as a vectorized codec would want).
  */
class MediaDecoder(override val uid: String) extends Transformer
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("mediaDecoder"))

  final val inputCol: Param[String] = new Param[String](this, "inputCol",
    "Binary payload column")
  final val outputCol: Param[String] = new Param[String](this, "outputCol",
    "Decoded feature vector column (array<double>)")
  final val featureDim: IntParam = new IntParam(this, "featureDim",
    "Decoded feature dimension", ParamValidators.gt(0))
  final val batchSize: IntParam = new IntParam(this, "batchSize",
    "Payloads decoded per kernel call", ParamValidators.gt(0))

  setDefault(inputCol -> "payload", outputCol -> "features",
    featureDim -> 16, batchSize -> 64)

  def setInputCol(value: String): this.type = set(inputCol, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)
  def setFeatureDim(value: Int): this.type = set(featureDim, value)
  def setBatchSize(value: Int): this.type = set(batchSize, value)

  override def transform(dataset: Dataset[_]): DataFrame = {
    val outSchema = transformSchema(dataset.schema)
    val dim = $(featureDim)
    val bs = $(batchSize)
    val inIdx = dataset.schema.fieldIndex($(inputCol))
    val df = dataset.toDF()
    df.mapPartitions { rows =>
      rows.grouped(bs).flatMap { batch =>
        val decoded = MediaDecoder.decodeBatch(
          batch.iterator.map(r =>
            if (r.isNullAt(inIdx)) Array.emptyByteArray else r.getAs[Array[Byte]](inIdx)),
          dim)
        batch.iterator.zip(decoded).map { case (r, feats) =>
          Row.fromSeq(r.toSeq :+ feats.toSeq)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  override def transformSchema(schema: StructType): StructType = {
    require(schema($(inputCol)).dataType == BinaryType,
      s"input column must be binary, got ${schema($(inputCol)).dataType}")
    StructType(schema.fields :+
      StructField($(outputCol), ArrayType(DoubleType, containsNull = false)))
  }

  override def copy(extra: ParamMap): MediaDecoder = defaultCopy(extra)
}

object MediaDecoder extends DefaultParamsReadable[MediaDecoder] {

  /** STUB decode kernel — deterministic fake "decoder": splits the payload
    * into `dim` chunks and emits each chunk's mean byte value scaled to
    * [0,1). A real implementation would hand the batch to a codec here
    * (??? in spirit); everything around it is production plumbing.
    */
  def decodeBatch(payloads: Iterator[Array[Byte]], dim: Int): Iterator[Array[Double]] =
    payloads.map { bytes =>
      if (bytes.isEmpty) Array.fill(dim)(0.0d)
      else {
        val out = new Array[Double](dim)
        val chunk = math.max(bytes.length / dim, 1)
        var d = 0
        while (d < dim) {
          val from = d * chunk
          var sum = 0L
          var n = 0
          var i = from
          while (i < math.min(from + chunk, bytes.length)) {
            sum += bytes(i) & 0xff; n += 1; i += 1
          }
          out(d) = if (n == 0) 0.0d else (sum.toDouble / n) / 256.0d
          d += 1
        }
        out
      }
    }
}
