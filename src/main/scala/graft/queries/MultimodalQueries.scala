package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}

import graft.Tables
import graft.multimodal.{AudioCodec, ImageCodec, MediaDecoder}
import graft.multimodal.MultimodalFunctions._

/** Multimodal-column queries: deterministic binary payloads built from the
  * documents table (utf-8 text bytes behind per-doc magic-byte headers),
  * profiled with the byte-level column functions. The DuckDB oracle builds
  * the identical blobs and replays every hex-space formula.
  */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q29_multimodal_meta" -> ((s, dir) => {
      val magic = when(col("doc_id") % 4 === 0, unhex(lit("89504E470D0A1A0A")))
        .when(col("doc_id") % 4 === 1, unhex(lit("FFD8FFE0")))
        .when(col("doc_id") % 4 === 2, unhex(lit("494433040000")))
        .otherwise(unhex(lit("00")))
      val withPayload = Tables.documents(s, dir)
        .select(col("doc_id"),
          concat(magic, encode(col("text"), "utf-8")).as("payload"))
      withPayload.select(
        col("doc_id"),
        byteLength(col("payload")).as("byte_len"),
        sniffFormat(col("payload")).as("format"),
        digest(col("payload")).as("digest"),
        headBytes(col("payload"), 8).as("head_hex"),
        strideSample(col("payload"), 8, 16).as("stride_sample"))
    }),

    // the decode stage end-to-end: mapPartitions-batched kernel over the
    // same deterministic payloads, 8-dim chunk-mean features. The stub
    // kernel's integer→double math is bit-replayable by the oracle.
    "q54_media_decode" -> ((s, dir) => {
      val magic = when(col("doc_id") % 4 === 0, unhex(lit("89504E470D0A1A0A")))
        .when(col("doc_id") % 4 === 1, unhex(lit("FFD8FFE0")))
        .when(col("doc_id") % 4 === 2, unhex(lit("494433040000")))
        .otherwise(unhex(lit("00")))
      val withPayload = Tables.documents(s, dir)
        .select(col("doc_id"),
          concat(magic, encode(col("text"), "utf-8")).as("payload"))
      val decoded = new MediaDecoder()
        .setInputCol("payload").setOutputCol("features")
        .setFeatureDim(8).setBatchSize(64)
        .transform(withPayload)
      decoded.select(
        col("doc_id") +:
          (0 until 8).map(d => round(col("features")(d), 6).as(s"f$d")): _*)
    }),

    // REAL decode end-to-end: per doc, synthesize an 8×8 RGB PNG whose
    // pixels are modular arithmetic in doc_id, push it through the actual
    // javax.imageio encode→decode in MediaDecoder, and emit pixel-derived
    // stats. PNG is lossless and the 64-pixel means are integer sums over
    // a power-of-two divisor, so DuckDB replays the expected means purely
    // arithmetically — any codec deviation breaks the hash. Width/height
    // come from the DECODED image (a stub fallback would emit [0,1) chunk
    // means there and fail loudly).
    "q103_png_decode" -> ((s, dir) => {
      val schema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("payload", BinaryType, nullable = false)))
      val withPng = graft.sql.functions.spread(
        Tables.documents(s, dir).select(col("doc_id").cast("long")),
        col("doc_id"))
        .mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val png = ImageCodec.encodePng(8, 8) { (x, y) =>
              val rr = ((id * 31 + x * 7 + y * 13) % 256).toInt
              val gg = ((id * 17 + x * 11 + y * 3) % 256).toInt
              val bb = ((id * 23 + x * 5 + y * 19) % 256).toInt
              (rr << 16) | (gg << 8) | bb
            }
            Row(id, png)
          }
        }(RowEncoder.encoderFor(schema))
      val decoded = new MediaDecoder()
        .setInputCol("payload").setOutputCol("f")
        .setFeatureDim(5).setBatchSize(64)
        .transform(withPng)
      decoded.select(
        col("doc_id"),
        col("f")(0).cast("long").as("width"),
        col("f")(1).cast("long").as("height"),
        round(col("f")(2) * 256, 6).as("mean_r"),
        round(col("f")(3) * 256, 6).as("mean_g"),
        round(col("f")(4) * 256, 6).as("mean_b"))
    }),

    // REAL audio decode end-to-end: per doc, synthesize a stereo PCM16 WAV
    // (frame count varies per doc so header/frame parsing is genuinely
    // exercised) whose samples are modular arithmetic in doc_id, push it
    // through the actual javax.sound.sampled encode→decode in MediaDecoder,
    // and emit sample-derived stats. PCM16 is lossless integers and the
    // mean is an integer sum over count then a power-of-two scale, so
    // DuckDB replays the expected values purely arithmetically — any codec
    // deviation (header misparse, endianness, truncation) breaks the hash.
    // channels/sample_rate/frames come from the DECODED stream; a stub
    // fallback would emit [0,1) chunk means there and fail loudly.
    "q105_wav_decode" -> ((s, dir) => {
      val schema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("payload", BinaryType, nullable = false)))
      val withWav = graft.sql.functions.spread(
        Tables.documents(s, dir).select(col("doc_id").cast("long")),
        col("doc_id"))
        .mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val frames = (64 + id % 64).toInt
            val wav = AudioCodec.encodeWavPcm16(2, 8000, frames) { (c, f) =>
              ((id * 31 + c * 7919 + f * 13) % 4096 - 2048).toShort
            }
            Row(id, wav)
          }
        }(RowEncoder.encoderFor(schema))
      val decoded = new MediaDecoder()
        .setInputCol("payload").setOutputCol("f")
        .setFeatureDim(5).setBatchSize(64)
        .transform(withWav)
      decoded.select(
        col("doc_id"),
        col("f")(0).cast("long").as("channels"),
        col("f")(1).cast("long").as("sample_rate"),
        col("f")(2).cast("long").as("frames"),
        round(col("f")(3) * 32768, 6).as("mean_abs"),
        (col("f")(4) * 32768).cast("long").as("peak"))
    }),

    // REAL JPEG decode end-to-end: per doc, synthesize a 16×16 RGB JPEG
    // (quality 0.9, explicit) whose source pixels are modular arithmetic
    // in doc_id, push it through the actual javax.imageio encode→decode in
    // MediaDecoder, and emit pixel-derived stats. JPEG is LOSSY, so unlike
    // q103 the decoded means are not arithmetic-replayable — the oracle is
    // a COMMITTED GOLDEN fingerprinted per SF by documents row count
    // (the q14/q27 pattern, regenerated via graft.tools.MakeGoldens);
    // decode stability itself is pinned by JpegCodecSpec's committed
    // fixture. Width/height come from the DECODED image — a stub fallback
    // would emit [0,1) chunk means there and fail loudly.
    "q162_jpeg_decode" -> ((s, dir) => {
      val schema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("payload", BinaryType, nullable = false)))
      val withJpg = graft.sql.functions.spread(
        Tables.documents(s, dir).select(col("doc_id").cast("long")),
        col("doc_id"))
        .mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val jpg = ImageCodec.encodeJpeg(16, 16, 0.9f) { (x, y) =>
              val rr = ((id * 31 + x * 7 + y * 13) % 256).toInt
              val gg = ((id * 17 + x * 11 + y * 3) % 256).toInt
              val bb = ((id * 23 + x * 5 + y * 19) % 256).toInt
              (rr << 16) | (gg << 8) | bb
            }
            Row(id, jpg)
          }
        }(RowEncoder.encoderFor(schema))
      val decoded = new MediaDecoder()
        .setInputCol("payload").setOutputCol("f")
        .setFeatureDim(5).setBatchSize(64)
        .transform(withJpg)
      decoded.select(
        col("doc_id"),
        col("f")(0).cast("long").as("width"),
        col("f")(1).cast("long").as("height"),
        round(col("f")(2) * 256, 6).as("mean_r"),
        round(col("f")(3) * 256, 6).as("mean_g"),
        round(col("f")(4) * 256, 6).as("mean_b"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q29_multimodal_meta" ->
      """WITH payloads AS (
        |  SELECT doc_id,
        |    (CASE
        |       WHEN doc_id % 4 = 0 THEN from_hex('89504E470D0A1A0A')
        |       WHEN doc_id % 4 = 1 THEN from_hex('FFD8FFE0')
        |       WHEN doc_id % 4 = 2 THEN from_hex('494433040000')
        |       ELSE from_hex('00')
        |     END) || encode(text) AS payload
        |  FROM documents
        |), hx AS (
        |  SELECT doc_id, octet_length(payload) AS byte_len, hex(payload) AS h
        |  FROM payloads
        |)
        |SELECT doc_id, byte_len,
        |  CASE
        |    WHEN h LIKE '89504E47%' THEN 'png'
        |    WHEN h LIKE 'FFD8FF%' THEN 'jpeg'
        |    WHEN h LIKE '474946383%' THEN 'gif'
        |    WHEN h LIKE '52494646%' THEN 'riff'
        |    WHEN h LIKE '494433%' THEN 'mp3'
        |    WHEN h LIKE '25504446%' THEN 'pdf'
        |    ELSE 'unknown'
        |  END AS format,
        |  md5(h) AS digest,
        |  substr(h, 1, 16) AS head_hex,
        |  (SELECT string_agg(substr(h, CAST(i AS INT) * 32 + 1, 2), '' ORDER BY i)
        |   FROM range(0, 8) t(i)) AS stride_sample
        |FROM hx""".stripMargin,
    "q54_media_decode" ->
      ("""WITH payloads AS (
        |  SELECT doc_id,
        |    (CASE
        |       WHEN doc_id % 4 = 0 THEN from_hex('89504E470D0A1A0A')
        |       WHEN doc_id % 4 = 1 THEN from_hex('FFD8FFE0')
        |       WHEN doc_id % 4 = 2 THEN from_hex('494433040000')
        |       ELSE from_hex('00')
        |     END) || encode(text) AS payload
        |  FROM documents
        |), hx AS (
        |  SELECT doc_id, octet_length(payload) AS len, hex(payload) AS h
        |  FROM payloads
        |), b AS (
        |  SELECT doc_id, CAST(i AS INT) - 1 AS pos,
        |    ('0x' || substr(h, (CAST(i AS INT) - 1) * 2 + 1, 2))::INT AS v,
        |    greatest(len // 8, 1) AS chunk
        |  FROM hx CROSS JOIN range(1, 700) t(i) WHERE i <= len
        |), m AS (
        |  SELECT doc_id, pos // chunk AS d, avg(v) / 256.0 AS f
        |  FROM b WHERE pos // chunk < 8
        |  GROUP BY 1, 2
        |)
        |SELECT hx.doc_id,
        |""".stripMargin +
        (0 until 8).map(d =>
          s"  round(coalesce(max(CASE WHEN d = $d THEN f END), 0), 6) AS f$d")
          .mkString(",\n") +
        """
        |FROM hx LEFT JOIN m ON hx.doc_id = m.doc_id
        |GROUP BY hx.doc_id
        |UNION ALL -- guard: loud mismatch if a payload outgrows the range(1,700) byte bound
        |SELECT -1, -1, -1, -1, -1, -1, -1, -1, -1
        |  WHERE (SELECT max(len) FROM hx) > 699""".stripMargin),
    // replays q103's pixel formula analytically: PNG round-trip is
    // lossless, sums are ints, /64 is exact in binary — zero float wobble
    "q103_png_decode" ->
      """SELECT d.doc_id,
        |  CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
        |  round(avg(CAST((d.doc_id * 31 + x.i * 7 + y.i * 13) % 256 AS DOUBLE)), 6) AS mean_r,
        |  round(avg(CAST((d.doc_id * 17 + x.i * 11 + y.i * 3) % 256 AS DOUBLE)), 6) AS mean_g,
        |  round(avg(CAST((d.doc_id * 23 + x.i * 5 + y.i * 19) % 256 AS DOUBLE)), 6) AS mean_b
        |FROM documents d
        |CROSS JOIN range(0, 8) x(i) CROSS JOIN range(0, 8) y(i)
        |GROUP BY d.doc_id""".stripMargin,

    // replays q105's sample formula analytically: PCM16 round-trip is
    // lossless, |amplitude| sums are ints, the /32768 scale cancels the
    // *32768 exactly (power of two) — zero float wobble
    "q105_wav_decode" ->
      """SELECT d.doc_id,
        |  CAST(2 AS BIGINT) AS channels,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(64 + d.doc_id % 64 AS BIGINT) AS frames,
        |  round(avg(CAST(abs((d.doc_id * 31 + c.i * 7919 + f.i * 13) % 4096 - 2048) AS DOUBLE)), 6) AS mean_abs,
        |  CAST(max(abs((d.doc_id * 31 + c.i * 7919 + f.i * 13) % 4096 - 2048)) AS BIGINT) AS peak
        |FROM documents d
        |CROSS JOIN range(0, 2) c(i) CROSS JOIN range(0, 128) f(i)
        |WHERE f.i < 64 + d.doc_id % 64
        |GROUP BY d.doc_id""".stripMargin,

    // committed golden (see the q162 query comment): JPEG is lossy, so
    // the decoded means can't be replayed arithmetically like q103 —
    // rows are selected by the documents-count fingerprint; the guard row
    // makes a missing fingerprint (new SF without regenerated goldens)
    // read as an explicit marker mismatch instead of a silent empty result
    "q162_jpeg_decode" ->
      s"""WITH g AS (
        |  SELECT * FROM read_parquet('${Goldens.path("q162_jpeg")}/*.parquet')
        |), n AS (SELECT count(*) AS nd FROM documents)
        |SELECT doc_id, width, height, mean_r, mean_g, mean_b
        |FROM g, n WHERE g.n_documents = n.nd
        |UNION ALL
        |SELECT -1, -1, -1, -1, -1, -1
        |WHERE NOT EXISTS (SELECT 1 FROM g, n WHERE g.n_documents = n.nd)""".stripMargin
  )
}
