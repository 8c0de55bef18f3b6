package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.MediaDecoder
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
        |  WHERE (SELECT max(len) FROM hx) > 699""".stripMargin)
  )
}
