package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Pins the JPEG encode→decode path the way the q162 golden needs: the
  * codec must be deterministic within this environment (same bytes, same
  * decoded stats, run to run) and faithful enough that channel means stay
  * near the source image's (lossy ≠ arbitrary). The committed constants
  * below are the decoded stats of a fixed fixture — if a JDK upgrade
  * changes the JPEG coder, this fails loudly and MakeGoldens must be
  * rerun, instead of q162 silently hash-mismatching.
  */
class JpegCodecSpec extends AnyFunSuite {

  // the q162 pixel formula at doc_id = 7, 16×16
  private def rgb(x: Int, y: Int): Int = {
    val id = 7L
    val rr = ((id * 31 + x * 7 + y * 13) % 256).toInt
    val gg = ((id * 17 + x * 11 + y * 3) % 256).toInt
    val bb = ((id * 23 + x * 5 + y * 19) % 256).toInt
    (rr << 16) | (gg << 8) | bb
  }

  private def sourceStats: (Double, Double, Double) = {
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (y <- 0 until 16; x <- 0 until 16) {
      val p = rgb(x, y)
      sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
    }
    (sr / 256.0, sg / 256.0, sb / 256.0)
  }

  test("encode is byte-deterministic and decode round-trips stats stably") {
    val a = ImageCodec.encodeJpeg(16, 16, 0.9f)(rgb)
    val b = ImageCodec.encodeJpeg(16, 16, 0.9f)(rgb)
    assert(java.util.Arrays.equals(a, b), "JPEG encoder must be deterministic")
    assert(ImageCodec.hasJpegSignature(a))
    val st = ImageCodec.decodeStats(a).get
    assert(st.width === 16 && st.height === 16)
    info(s"decoded sums: r=${st.sumR} g=${st.sumG} b=${st.sumB}")
    // committed fixture constants (this JDK's javax.imageio coder): a
    // codec change shows up here FIRST, with instructions — rerun
    // graft.tools.MakeGoldens and re-commit the q162 golden
    assert((st.sumR, st.sumG, st.sumB) === ((31237L, 36387L, 35572L)),
      "JPEG coder output changed - rerun MakeGoldens and recommit q162 golden")
  }

  test("lossy but faithful: decoded channel means near the source means") {
    val st = ImageCodec.decodeStats(ImageCodec.encodeJpeg(16, 16, 0.9f)(rgb)).get
    val (mr, mg, mb) = sourceStats
    assert(math.abs(st.sumR / 256.0 - mr) < 8.0, s"R mean drifted: ${st.sumR / 256.0} vs $mr")
    assert(math.abs(st.sumG / 256.0 - mg) < 8.0, s"G mean drifted: ${st.sumG / 256.0} vs $mg")
    assert(math.abs(st.sumB / 256.0 - mb) < 8.0, s"B mean drifted: ${st.sumB / 256.0} vs $mb")
  }

  test("signature-bearing garbage still falls back (q54 contract unchanged)") {
    val junk = Array(0xFF, 0xD8, 0xFF, 0xE0, 0x41, 0x42).map(_.toByte)
    assert(ImageCodec.hasJpegSignature(junk))
    assert(ImageCodec.decodeStats(junk).isEmpty)
  }
}
