package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real image codec over the JDK's built-in `javax.imageio` — zero external
  * dependencies, works offline. PNG (plus BMP/GIF/JPEG read) comes with
  * every JRE, so the decode stage of [[MediaDecoder]] can be genuine for
  * those containers; only codecs the JDK lacks (video, audio) stay stubbed.
  *
  * PNG is lossless and `TYPE_INT_RGB` has no color-profile ambiguity, so an
  * encode→decode round trip returns the exact pixel bytes — which is what
  * makes decoded stats SQL-oracle-replayable: a query that synthesizes
  * pixels from table columns by integer arithmetic can be replayed by DuckDB
  * computing the same arithmetic, with the real codec in between (q103).
  */
object ImageCodec {

  // ImageIO defaults to a DISK-backed stream cache: every encode/decode
  // creates and deletes a temp file, serializing parallel codec tasks on
  // filesystem contention (measured: 5k-image decode stuck near 2 cores
  // on a 32-thread executor). In-memory cache restores task-parallel
  // decode; payloads here are bounded (images decoded in batches).
  // Called at each entry point (idempotent, cheap boolean set) rather than
  // as a class-load side effect, so the behavior doesn't depend on which
  // class in the JVM touches ImageIO first — the JVM-global mutation is
  // still global, but it now takes effect exactly when this codec runs.
  private def ensureMemoryCache(): Unit =
    if (ImageIO.getUseCache) ImageIO.setUseCache(false)

  /** The full 8-byte PNG signature (not just the 4-byte magic): payloads
    * that merely open with the short magic — e.g. q54's synthetic headers —
    * must NOT be routed to a real decode.
    */
  private val PngSignature: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  def hasPngSignature(bytes: Array[Byte]): Boolean =
    bytes.length >= PngSignature.length &&
      PngSignature.indices.forall(i => bytes(i) == PngSignature(i))

  /** JPEG/JFIF magic (FF D8 FF). Like the PNG check this only gates which
    * decode path is TRIED — signature-bearing garbage still falls back to
    * the stub kernel when `decodeStats` returns None.
    */
  def hasJpegSignature(bytes: Array[Byte]): Boolean =
    bytes.length >= 3 && bytes(0) == 0xFF.toByte &&
      bytes(1) == 0xD8.toByte && bytes(2) == 0xFF.toByte

  /** Encode an RGB image from a pixel function `(x, y) => 0xRRGGBB`. */
  def encodePng(width: Int, height: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    ensureMemoryCache()
    require(width > 0 && height > 0, "image dimensions must be positive")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Encode an RGB image as JPEG at an explicit quality — the LOSSY
    * counterpart of [[encodePng]]: a decode does NOT return the source
    * pixels, so JPEG-derived stats are pinned by committed goldens
    * (q162, the q14/q27 pattern) instead of an arithmetic SQL replay.
    * Quality is set explicitly so the bytes don't depend on the writer's
    * default.
    */
  def encodeJpeg(width: Int, height: Int, quality: Float)(
      rgb: (Int, Int) => Int): Array[Byte] = {
    ensureMemoryCache()
    require(width > 0 && height > 0, "image dimensions must be positive")
    require(quality > 0f && quality <= 1f, s"quality ($quality) must be in (0, 1]")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally {
      ios.close()
      writer.dispose()
    }
    bos.toByteArray
  }

  /** Decoded pixel statistics: dimensions plus EXACT per-channel byte sums
    * (longs, not floats — derived means stay bit-deterministic).
    */
  final case class ImageStats(width: Int, height: Int, sumR: Long, sumG: Long, sumB: Long) {
    def pixels: Long = width.toLong * height
  }

  /** Decode via `javax.imageio`; None when the payload is not an image the
    * JDK can read (wrong container, truncated, or signature-only garbage).
    */
  def decodeStats(bytes: Array[Byte]): Option[ImageStats] = {
    ensureMemoryCache()
    try {
      Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { img =>
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        ImageStats(img.getWidth, img.getHeight, sr, sg, sb)
      }
    } catch { case _: Exception => None }
  }
}
