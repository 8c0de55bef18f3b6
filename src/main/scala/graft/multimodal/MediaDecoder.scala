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
  * decode stage whose inner kernel calls an image/audio codec.
  *
  * The kernel is REAL for media the JDK can read: a payload carrying the
  * full 8-byte PNG signature is decoded with `javax.imageio`
  * ([[ImageCodec.decodeStats]]) and yields pixel-derived features
  * `[width, height, meanR/256, meanG/256, meanB/256, 0…]` (means exact:
  * integer channel sums divided by pixel count; q103 hash-verifies the
  * whole encode→decode→stats path against the SQL oracle), and a
  * RIFF/WAVE payload is decoded with `javax.sound.sampled`
  * ([[AudioCodec.decodeStats]]) into sample-derived features (q105
  * likewise hash-verifies encode→decode→stats). Payloads the JDK cannot
  * decode — other containers, or signature-bearing garbage like q54's
  * synthetic headers — fall back to the deterministic STUB kernel
  * (per-chunk byte means; no video or compressed-audio codecs offline), keeping
  * the exact batch signature a production codec would have
  * (`Iterator[Array[Byte]] → Iterator[Array[Double]]`). Features are
  * double so both kernels' integer→double arithmetic is bit-replayable by
  * the SQL oracles (q54, q103); a production codec would emit float32 —
  * plumbing unchanged.
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

  /** Decode kernel: real JDK decodes for the containers the JRE ships
    * codecs for, STUB chunk-mean features for everything else (video,
    * compressed audio — no codecs offline), keeping the deterministic fake
    * with the same batch signature.
    *
    *  - PNG or JPEG signature → `javax.imageio`
    *    ([[ImageCodec.decodeStats]]):
    *    `[w, h, meanR/256, meanG/256, meanB/256]` (PNG stats are
    *    arithmetic-replayable — lossless; JPEG stats are pinned by the
    *    q162 committed golden — lossy)
    *  - RIFF/WAVE signature → `javax.sound.sampled`
    *    ([[AudioCodec.decodeStats]]):
    *    `[channels, sampleRate, frames, meanAbs/32768, peak/32768]`
    *
    * All means are exact long-sum / count divisions followed only by
    * power-of-two scaling (exact in binary), so both real kernels stay
    * bit-replayable by the SQL oracles (q103, q105). A payload whose
    * signature matches but whose body the JDK cannot decode falls back to
    * the stub — signature-bearing garbage (q54) never aborts a batch.
    */
  def decodeBatch(payloads: Iterator[Array[Byte]], dim: Int): Iterator[Array[Double]] =
    payloads.map { bytes =>
      val image =
        if (ImageCodec.hasPngSignature(bytes) || ImageCodec.hasJpegSignature(bytes))
          ImageCodec.decodeStats(bytes)
        else None
      val audio =
        if (image.isEmpty && AudioCodec.hasRiffWaveSignature(bytes))
          AudioCodec.decodeStats(bytes)
        else None
      (image, audio) match {
        case (Some(st), _) =>
          val feats = Array(st.width.toDouble, st.height.toDouble,
            st.sumR.toDouble / st.pixels / 256.0d,
            st.sumG.toDouble / st.pixels / 256.0d,
            st.sumB.toDouble / st.pixels / 256.0d)
          java.util.Arrays.copyOf(feats, dim)
        case (_, Some(st)) =>
          val feats = Array(st.channels.toDouble, st.sampleRate.toDouble,
            st.frames.toDouble,
            st.sumAbs.toDouble / st.samples / 32768.0d,
            st.peakAbs.toDouble / 32768.0d)
          java.util.Arrays.copyOf(feats, dim)
        case _ => stubFeatures(bytes, dim)
      }
    }

  /** The stub chunk-mean kernel (per-chunk byte means scaled to [0,1)). */
  private def stubFeatures(bytes: Array[Byte], dim: Int): Array[Double] = {
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
