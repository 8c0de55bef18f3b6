package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  lazy val payloads = Seq(
    (1L, Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 1, 2, 3, 4, 5, 6, 7, 8)),
    (2L, Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 9, 9)),
    (3L, "plain text payload".getBytes("UTF-8")))
    .toDF("id", "payload")

  test("magic-byte sniffing identifies containers") {
    val out = payloads.select($"id", MultimodalFunctions.sniffFormat($"payload").as("f"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "png")
    assert(out(2L) === "jpeg")
    assert(out(3L) === "unknown")
  }

  test("byte length and head bytes") {
    val r = payloads.where($"id" === 1)
      .select(MultimodalFunctions.byteLength($"payload"),
        MultimodalFunctions.headBytes($"payload", 4)).head()
    assert(r.getInt(0) === 12)
    assert(r.getString(1) === "89504E47")
  }

  test("stride sample picks every k-th byte") {
    val r = payloads.where($"id" === 1)
      .select(MultimodalFunctions.strideSample($"payload", 3, 4)).head()
    // bytes at offsets 0, 4, 8 → 0x89, 0x01, 0x05
    assert(r.getString(0) === "890105")
  }

  test("decoder stub emits fixed-dim features per row, batched") {
    val out = new MediaDecoder()
      .setInputCol("payload").setOutputCol("feats")
      .setFeatureDim(4).setBatchSize(2)
      .transform(payloads)
    val feats = out.select($"id", $"feats").as[(Long, Seq[Double])].collect().toMap
    assert(feats.size === 3)
    assert(feats.values.forall(_.length === 4))
    assert(feats.values.forall(_.forall(v => v >= 0.0d && v < 1.0d)))
    // deterministic: same input → same features
    val again = new MediaDecoder().setInputCol("payload").setOutputCol("feats")
      .setFeatureDim(4).transform(payloads)
      .select($"id", $"feats").as[(Long, Seq[Double])].collect().toMap
    assert(feats === again)
  }

  test("png encode→decode round trip returns exact pixel sums") {
    // lossless codec + TYPE_INT_RGB: decoded channel sums must equal the
    // analytically computed ones, for several images
    for (id <- Seq(0L, 1L, 17L, 4096L)) {
      val png = ImageCodec.encodePng(8, 8) { (x, y) =>
        val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((id * 17 + x * 11 + y * 3) % 256).toInt
        val b = ((id * 23 + x * 5 + y * 19) % 256).toInt
        (r << 16) | (g << 8) | b
      }
      assert(ImageCodec.hasPngSignature(png))
      val st = ImageCodec.decodeStats(png).get
      val px = for { x <- 0 until 8; y <- 0 until 8 } yield (x, y)
      assert(st.width === 8 && st.height === 8)
      assert(st.sumR === px.map { case (x, y) => (id * 31 + x * 7 + y * 13) % 256 }.sum)
      assert(st.sumG === px.map { case (x, y) => (id * 17 + x * 11 + y * 3) % 256 }.sum)
      assert(st.sumB === px.map { case (x, y) => (id * 23 + x * 5 + y * 19) % 256 }.sum)
    }
  }

  test("committed png fixture decodes to pinned stats") {
    // pins decode stability across JDK/ImageIO versions: fixed bytes on
    // disk, hardcoded expected pixel sums (3×2, r=40x+10 g=90y+5 b=7x+11y+3)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/fixtures/tiny3x2.png").toURI))
    val st = ImageCodec.decodeStats(bytes).get
    assert(st === ImageCodec.ImageStats(3, 2, 300L, 300L, 93L))
  }

  test("decoder kernel: real path for valid png, stub for signature-bearing garbage") {
    val valid = ImageCodec.encodePng(4, 4)((x, y) => (x << 16) | (y << 8) | 255)
    // full 8-byte signature followed by text — q54's synthetic payload shape
    val garbage = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A) ++
      "not really a png".getBytes("UTF-8")
    val out = MediaDecoder.decodeBatch(Iterator(valid, garbage), 5).toSeq
    // real path: f0/f1 are the decoded dimensions, means exact
    assert(out(0)(0) === 4.0 && out(0)(1) === 4.0)
    assert(out(0)(2) === (0 until 4).map(x => x * 4).sum / 16.0 / 256.0)
    assert(out(0)(4) === 255.0 / 256.0)
    // stub path: chunk means in [0,1) — same values q54's oracle replays
    assert(out(1).forall(v => v >= 0.0 && v < 1.0))
    val stubAgain = MediaDecoder.decodeBatch(Iterator(garbage), 5).toSeq.head
    assert(out(1).toSeq === stubAgain.toSeq)
  }

  test("wav encode→decode round trip returns exact sample stats") {
    // lossless PCM16: decoded |amplitude| sums must equal the analytically
    // computed ones, across varying frame counts (q105's formula)
    for (id <- Seq(0L, 5L, 63L, 4095L)) {
      val frames = (64 + id % 64).toInt
      val wav = AudioCodec.encodeWavPcm16(2, 8000, frames) { (c, f) =>
        ((id * 31 + c * 7919 + f * 13) % 4096 - 2048).toShort
      }
      assert(AudioCodec.hasRiffWaveSignature(wav))
      val st = AudioCodec.decodeStats(wav).get
      val samples = for { f <- 0 until frames; c <- 0 until 2 }
        yield (id * 31 + c * 7919 + f * 13) % 4096 - 2048
      assert(st.channels === 2 && st.sampleRate === 8000 && st.frames === frames)
      assert(st.sumAbs === samples.map(math.abs).sum)
      assert(st.peakAbs === samples.map(math.abs).max)
    }
  }

  test("hand-built canonical wav header parses to pinned stats") {
    // canonical 44-byte PCM WAV laid out byte-by-byte from the public
    // format spec, NOT via the JDK writer — pins the reader against the
    // container layout itself (incl. both signed extremes)
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 123)
    val dataLen = samples.length * 2
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    bos.write("RIFF".getBytes("US-ASCII")); le32(36 + dataLen)
    bos.write("WAVE".getBytes("US-ASCII"))
    bos.write("fmt ".getBytes("US-ASCII")); le32(16)
    le16(1) /* PCM */ ; le16(1) /* mono */ ; le32(8000); le32(16000)
    le16(2) /* block align */ ; le16(16) /* bits */
    bos.write("data".getBytes("US-ASCII")); le32(dataLen)
    samples.foreach(s => le16(s & 0xffff))
    val st = AudioCodec.decodeStats(bos.toByteArray).get
    assert(st === AudioCodec.AudioStats(1, 8000, 6, 0L + 1000 + 1000 + 32767 + 32768 + 123, 32768))
  }

  test("decoder kernel: real path for valid wav, stub for RIFF-signature garbage") {
    val wav = AudioCodec.encodeWavPcm16(1, 8000, 4)((_, f) => (f * 100).toShort)
    // full RIFF....WAVE signature, unparseable body — must fall to the stub
    val garbage = "RIFFxxxxWAVE not a real body".getBytes("US-ASCII")
    val out = MediaDecoder.decodeBatch(Iterator(wav, garbage), 5).toSeq
    assert(out(0)(0) === 1.0 && out(0)(1) === 8000.0 && out(0)(2) === 4.0)
    assert(out(0)(3) === (0 + 100 + 200 + 300) / 4.0 / 32768.0)
    assert(out(0)(4) === 300.0 / 32768.0)
    assert(out(1).forall(v => v >= 0.0 && v < 1.0))
    val stubAgain = MediaDecoder.decodeBatch(Iterator(garbage), 5).toSeq.head
    assert(out(1).toSeq === stubAgain.toSeq)
  }

  test("decoder preserves existing columns and appends array<double>") {
    val out = new MediaDecoder().setInputCol("payload").setOutputCol("feats")
      .transform(payloads)
    assert(out.columns.toSeq === Seq("id", "payload", "feats"))
    assert(out.schema("feats").dataType.typeName === "array")
  }
}
