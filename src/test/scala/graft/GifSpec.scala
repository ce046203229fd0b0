package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Gif

/** Pins the GIF LZW codec's structural behaviors the q288 oracle diff
  * can't name: exact round-trips through the 512- and 1024-entry
  * code-width boundaries (where the encoder/decoder early-change
  * pairing either agrees or corrupts everything after), the KwKwK
  * self-referencing code, run-heavy and incompressible inputs, and
  * container enforcement.
  */
class GifSpec extends AnyFunSuite {

  private def rt(p: Array[Byte], w: Int, h: Int): Unit = {
    val img = Gif.decodeGray(Gif.encodeGray(p, w, h))
    assert(img.width == w && img.height == h)
    assert(img.pixels.toSeq == p.toSeq, s"pixel mismatch at ${w}x$h")
  }

  test("round-trip: small mixed image") {
    rt(Array.tabulate(60)(i => ((i * 37 + 11) % 256).toByte), 12, 5)
  }

  test("KwKwK case: aaaa... emits a code equal to the decoder's nextCode") {
    rt(Array.fill(16)(7.toByte), 4, 4)
    rt(("ababababab" * 4).getBytes("US-ASCII"), 8, 5)
  }

  test("round-trip across the 512-entry (9->10 bit) width boundary") {
    // highly varied input adds ~1 dictionary entry per pixel: 600
    // pixels cross 258+254=512 comfortably
    val p = Array.tabulate(600)(i => ((i * 151 + 7) % 256).toByte)
    rt(p, 30, 20)
  }

  test("round-trip across the 1024-entry (10->11 bit) width boundary") {
    val p = Array.tabulate(1200)(i => ((i * 151 + 31) % 251).toByte)
    rt(p, 40, 30)
  }

  test("round-trip of a long constant run (deep dictionary chains)") {
    rt(Array.fill(900)(200.toByte), 30, 30)
  }

  test("round-trip of structured rows (repeating scanlines compress)") {
    val row = Array.tabulate(32)(i => (i * 8).toByte)
    val p = Array.tabulate(32 * 20)(i => row(i % 32))
    rt(p, 32, 20)
  }

  test("encoded stream is structurally valid GIF87a") {
    val g = Gif.encodeGray(Array.tabulate(60)(_.toByte), 12, 5)
    assert(new String(g.slice(0, 6), "US-ASCII") == "GIF87a")
    assert((g(10) & 0x80) != 0)        // global color table present
    assert(g(g.length - 1) == 0x3b)    // trailer
    // gray palette: entry i is (i,i,i)
    assert(g(13 + 3 * 77) == 77.toByte && g(13 + 3 * 77 + 1) == 77.toByte)
  }

  test("decoder skips extension blocks (GIF89a graphic control)") {
    val base = Gif.encodeGray(Array.tabulate(20)(i => (i * 9).toByte), 5, 4)
    val out = new java.io.ByteArrayOutputStream()
    val gctEnd = 13 + 256 * 3
    out.write(base, 0, gctEnd)
    // splice a graphic-control extension: 0x21 0xF9 size=4 data 0x00
    out.write(Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0))
    out.write(base, gctEnd, base.length - gctEnd)
    val img = Gif.decodeGray(out.toByteArray)
    assert(img.pixels.toSeq == Array.tabulate(20)(i => (i * 9).toByte).toSeq)
  }

  test("non-GIF and truncated streams are rejected") {
    intercept[IllegalArgumentException] {
      Gif.decodeGray("NOTAGIF".getBytes("US-ASCII"))
    }
    val g = Gif.encodeGray(Array.tabulate(60)(_.toByte), 12, 5)
    intercept[Exception] { Gif.decodeGray(g.slice(0, g.length - 6)) }
  }

  // ------------------------------------------------------------------
  // Interlace (q323) — the 4-pass transmission order of GIF87a
  // Appendix E, with scatter-back on decode.
  // ------------------------------------------------------------------

  test("interlace row order: the Appendix E pass sequence") {
    assert(Gif.interlaceRows(10).toSeq ==
      Seq(0, 8, 4, 2, 6, 1, 3, 5, 7, 9))
    // short images: empty passes contribute nothing
    assert(Gif.interlaceRows(1).toSeq == Seq(0))
    assert(Gif.interlaceRows(3).toSeq == Seq(0, 2, 1))
    assert(Gif.interlaceRows(5).toSeq == Seq(0, 4, 2, 1, 3))
    // every row appears exactly once
    assert(Gif.interlaceRows(23).sorted.toSeq == (0 until 23))
  }

  test("interlaced round-trip equals sequential pixels (ragged sizes)") {
    for ((w, h) <- Seq((12, 5), (1, 1), (3, 17), (16, 8), (7, 9))) {
      val px = Array.tabulate(w * h)(i => ((i * 37 + 11) % 256).toByte)
      val img = Gif.decodeGray(Gif.encodeGray(px, w, h, interlaced = true))
      assert(img.width == w && img.height == h)
      assert(img.pixels.toSeq == px.toSeq, s"${w}x$h")
    }
  }

  test("interlaced stream differs from sequential but decodes the same") {
    // pixel value = row index, so any row permutation error is visible
    val w = 4; val h = 10
    val px = Array.tabulate(w * h)(i => (i / w * 20).toByte)
    val seq = Gif.encodeGray(px, w, h)
    val int = Gif.encodeGray(px, w, h, interlaced = true)
    assert(!java.util.Arrays.equals(seq, int),
      "interlace must change the transmitted stream")
    // the interlace flag is the descriptor's bit 6
    assert((int(13 + 768 + 9) & 0x40) != 0 && (seq(13 + 768 + 9) & 0x40) == 0)
    assert(Gif.decodeGray(int).pixels.toSeq == Gif.decodeGray(seq).pixels.toSeq)
  }

  test("decoder without scatter-back would see transmission order") {
    // flipping the interlace flag OFF on an interlaced stream makes
    // the decoder return rows in transmission order — proving the
    // scatter-back is doing real work, not a no-op
    val w = 2; val h = 8
    val px = Array.tabulate(w * h)(i => (i / w).toByte) // row index
    val int = Gif.encodeGray(px, w, h, interlaced = true)
    val stripped = int.clone()
    stripped(13 + 768 + 9) = (stripped(13 + 768 + 9) & ~0x40).toByte
    val raw = Gif.decodeGray(stripped).pixels.map(_.toInt)
    assert(raw.grouped(w).map(_.head).toSeq == Seq(0, 4, 2, 6, 1, 3, 5, 7),
      "transmission order is the Appendix E sequence")
    assert(Gif.decodeGray(int).pixels.map(_.toInt).toSeq == px.map(_.toInt).toSeq)
  }
}
