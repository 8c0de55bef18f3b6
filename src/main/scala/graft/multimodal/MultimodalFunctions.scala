package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column functions for opaque media payloads (`BINARY` columns with typed
  * metadata) — the multimodal side of a training-data pipeline. Byte-level
  * operations are expressed over the HEX encoding so every function is a
  * pure Catalyst expression AND replayable by the SQL oracle (which lacks
  * blob slicing).
  *
  * Beyond-reference operators (LLM-pipeline extension from the build
  * brief). Real image/audio decoding needs codec libraries that are not in
  * this environment — see [[MediaDecoder]] for the stubbed decode seam; the
  * schema/partitioning/batching plumbing here is real.
  */
object MultimodalFunctions {

  /** Payload size in bytes. */
  def byteLength(bin: Column): Column = length(bin)

  /** Uppercase hex of the payload (the byte-addressable view). */
  def payloadHex(bin: Column): Column = hex(bin)

  /** Container sniffing by magic bytes (PNG/JPEG/GIF/RIFF/MP3-ID3/PDF). */
  def sniffFormat(bin: Column): Column = {
    val hx = hex(bin)
    when(hx.startsWith("89504E47"), "png")
      .when(hx.startsWith("FFD8FF"), "jpeg")
      .when(hx.startsWith("474946383"), "gif")
      .when(hx.startsWith("52494646"), "riff")
      .when(hx.startsWith("494433"), "mp3")
      .when(hx.startsWith("25504446"), "pdf")
      .otherwise("unknown")
  }

  /** Content digest: md5 over the hex view (stable across engines). */
  def digest(bin: Column): Column = md5(hex(bin))

  /** First `n` bytes as hex. */
  def headBytes(bin: Column, n: Int): Column = substring(hex(bin), 1, 2 * n)

  /** "Frame sample": one byte every `stride` bytes, `n` samples, as hex —
    * the byte-level analogue of sampling every k-th video frame.
    */
  def strideSample(bin: Column, n: Int, stride: Int): Column =
    array_join(
      transform(sequence(lit(0), lit(n - 1)),
        i => hex(bin).substr(i * (2 * stride) + 1, lit(2))),
      "")
}
