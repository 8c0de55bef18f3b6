package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real audio codec over the JDK's built-in `javax.sound.sampled` — like
  * [[ImageCodec]], zero external dependencies and works offline. WAV/PCM
  * parsing ships with every JRE (`AudioSystem.getAudioInputStream` reads
  * the RIFF/WAVE container and fmt chunk without any audio device), so the
  * decode stage of [[MediaDecoder]] is genuine for WAV payloads; only
  * codecs the JDK truly lacks (video, compressed audio) stay stubbed.
  *
  * PCM16 is lossless integers, so an encode→decode round trip returns the
  * exact sample words — decoded statistics (per-sample |amplitude| sums,
  * peaks) are integer arithmetic end-to-end and therefore SQL-oracle-
  * replayable: a query that synthesizes samples from table columns can be
  * replayed by DuckDB computing the same arithmetic, with the real codec
  * in between (q105).
  */
object AudioCodec {

  /** RIFF/WAVE requires BOTH magics: "RIFF" at 0 AND "WAVE" at 8. RIFF
    * alone is any RIFF container (AVI, WebP, or q54-style signature-bearing
    * garbage) and must not short-circuit the routing — the decode itself
    * still validates, this check only gates the attempt.
    */
  def hasRiffWaveSignature(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  /** Encode an interleaved PCM16 little-endian WAV through the JDK writer
    * from a sample function `(channel, frame) => Short`.
    */
  def encodeWavPcm16(channels: Int, sampleRate: Int, frames: Int)(
      sample: (Int, Int) => Short): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && frames > 0,
      "channels, sampleRate and frames must be positive")
    val data = new Array[Byte](frames * channels * 2)
    var f = 0
    var o = 0
    while (f < frames) {
      var c = 0
      while (c < channels) {
        val s = sample(c, f)
        data(o) = (s & 0xff).toByte
        data(o + 1) = ((s >> 8) & 0xff).toByte
        o += 2
        c += 1
      }
      f += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, channels, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decoded sample statistics: stream shape plus the EXACT sum of
    * per-sample |amplitude| (long) and the peak |amplitude| (int) across
    * all channels — integer aggregates, so derived means stay
    * bit-deterministic. `frames` is derived from the decoded data length,
    * not the header, so a truncated-but-parseable stream reports what was
    * actually read.
    */
  final case class AudioStats(
      channels: Int, sampleRate: Int, frames: Long, sumAbs: Long, peakAbs: Int) {
    def samples: Long = frames * channels
  }

  /** Decode via `javax.sound.sampled`; None when the payload is not a
    * PCM16 stream the JDK can read (wrong container, truncated header,
    * compressed encoding, or signature-only garbage).
    */
  def decodeStats(bytes: Array[Byte]): Option[AudioStats] =
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16 || fmt.getChannels <= 0) None
      else {
        val pcm = ais.readAllBytes()
        val n = pcm.length / 2
        val bigEndian = fmt.isBigEndian
        var sum = 0L
        var peak = 0
        var i = 0
        while (i < n) {
          val s =
            if (bigEndian) (pcm(2 * i) << 8) | (pcm(2 * i + 1) & 0xff)
            else (pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)
          val a = math.abs(s)
          sum += a
          if (a > peak) peak = a
          i += 1
        }
        Some(AudioStats(fmt.getChannels, fmt.getSampleRate.toInt,
          n.toLong / fmt.getChannels, sum, peak))
      }
    } catch { case _: Exception => None }
}
