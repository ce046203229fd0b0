package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Bmp

/** Pins the BMP codec's structural behaviors the q287 oracle diff
  * can't name: bottom-up row order, 4-byte row padding, palette
  * indirection, header-field enforcement.
  */
class BmpSpec extends AnyFunSuite {

  private def px(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 37 + 11) % 256).toByte)

  test("round-trip: decode(encode(p)) == p at a padded width (10 % 4 != 0)") {
    val p = px(60)
    val img = Bmp.decodeGray(Bmp.encodeGray(p, 10, 6))
    assert(img.width == 10 && img.height == 6)
    assert(img.pixels.toSeq == p.toSeq)
  }

  test("round-trip at an aligned width (8) and a 1-pixel-wide image") {
    assert(Bmp.decodeGray(Bmp.encodeGray(px(32), 8, 4)).pixels.toSeq == px(32).toSeq)
    assert(Bmp.decodeGray(Bmp.encodeGray(px(5), 1, 5)).pixels.toSeq == px(5).toSeq)
  }

  test("rows are stored bottom-up: raw stream's first row is the image's last") {
    val p = Array.tabulate(20)(i => (i / 10).toByte) // row0 = 0s, row1 = 1s
    val bmp = Bmp.encodeGray(p, 10, 2)
    val dataOffset = 14 + 40 + 256 * 4
    // first stored row must be the LAST image row (all 1s)
    assert((0 until 10).forall(x => bmp(dataOffset + x) == 1.toByte))
    assert(Bmp.decodeGray(bmp).pixels.toSeq == p.toSeq)
  }

  test("row padding bytes exist and are skipped (stride 12 for width 10)") {
    val bmp = Bmp.encodeGray(px(60), 10, 6)
    val dataOffset = 14 + 40 + 256 * 4
    assert(bmp.length == dataOffset + 12 * 6)
  }

  test("palette indirection is honored (permuted palette changes pixels)") {
    val p = px(12)
    val bmp = Bmp.encodeGray(p, 4, 3)
    // invert the palette's blue channel: entry i → 255 - i
    val paletteOff = 14 + 40
    for (i <- 0 until 256) bmp(paletteOff + i * 4) = (255 - i).toByte
    val img = Bmp.decodeGray(bmp)
    assert(img.pixels.toSeq == p.map(b => (255 - (b & 0xff)).toByte).toSeq)
  }

  test("unsupported streams are rejected, not mis-decoded") {
    val bmp = Bmp.encodeGray(px(12), 4, 3)
    val notBmp = bmp.clone(); notBmp(0) = 'X'.toByte
    intercept[IllegalArgumentException] { Bmp.decodeGray(notBmp) }
    val bpp24 = bmp.clone(); bpp24(28) = 24
    intercept[IllegalArgumentException] { Bmp.decodeGray(bpp24) }
    val rle4 = bmp.clone(); rle4(30) = 2 // BI_RLE4: still out of scope
    intercept[IllegalArgumentException] { Bmp.decodeGray(rle4) }
  }

  // ---- BI_RLE8 ------------------------------------------------------

  test("RLE8 round-trip: runs, literal stretches, and mixed rows") {
    val runs = Array.tabulate(60)(i => ((i / 7) * 16).toByte) // long runs
    assert(Bmp.decodeGray(Bmp.encodeGrayRle8(runs, 10, 6)).pixels.toSeq
      == runs.toSeq)
    val lits = px(60) // all-distinct neighbors → absolute blocks
    assert(Bmp.decodeGray(Bmp.encodeGrayRle8(lits, 10, 6)).pixels.toSeq
      == lits.toSeq)
    val mixed = Array.tabulate(60)(i =>
      (if ((i / 10) % 2 == 0) 42 else (i * 53) % 251).toByte)
    assert(Bmp.decodeGray(Bmp.encodeGrayRle8(mixed, 10, 6)).pixels.toSeq
      == mixed.toSeq)
  }

  test("RLE8 compresses constant images and marks biCompression = 1") {
    val flat = Array.fill(400)(7.toByte)
    val rle = Bmp.encodeGrayRle8(flat, 20, 20)
    val raw = Bmp.encodeGray(flat, 20, 20)
    assert(rle.length < raw.length, "RLE8 must beat BI_RGB on a flat image")
    assert((rle(30) & 0xff) == 1 && (raw(30) & 0xff) == 0)
    assert(Bmp.decodeGray(rle).pixels.toSeq == flat.toSeq)
  }

  test("RLE8 odd-length absolute blocks are WORD-padded") {
    // width 5 of distinct values → one absolute block of 5 (odd) per
    // row; a decoder that forgot the pad byte desyncs at row 2
    val p = Array.tabulate(15)(i => ((i * 31 + i / 5) % 251).toByte)
    assert(Bmp.decodeGray(Bmp.encodeGrayRle8(p, 5, 3)).pixels.toSeq == p.toSeq)
  }

  test("RLE8 delta escape skips pixels, leaving palette index 0") {
    // hand-built stream: row bottom: run of 3 '5's, delta (2,1) —
    // skips 2 px and jumps a row — then a run of 2 '9's, EOL, EOB
    val base = Bmp.encodeGrayRle8(Array.fill(12)(0.toByte), 4, 3)
    val dataOffset = 14 + 40 + 256 * 4
    val body = Array[Byte](
      3, 5,          // 3 pixels of index 5 on bottom row
      0, 2, 2, 1,    // delta: dx=2, dy=1 (→ middle row, x=1? no: x=3+2=... clipped by require)
      0, 0,          // end of line
      0, 1)          // end of bitmap
    // dx=2 from x=3 overruns width 4 → the decoder must reject it
    val bad = base.take(dataOffset) ++ body
    // fix bfSize field is not validated; decode walks from dataOffset
    intercept[IllegalArgumentException] { Bmp.decodeGray(bad) }
    // a legal delta: 1 pixel, delta (1,1), run of 2 on the next row
    val ok = base.take(dataOffset) ++ Array[Byte](
      1, 5, 0, 2, 1, 1, 2, 9, 0, 0, 0, 1)
    val img = Bmp.decodeGray(ok)
    // bottom row: [5,0,0,0]; middle row starts at x=2 after the delta:
    // [0,0,9,9]; top row untouched: zeros (palette[0] = 0)
    assert(img.pixels.toSeq == Seq[Byte](
      0, 0, 0, 0,   // top image row (bottom-up row 2)
      0, 0, 9, 9,   // middle row
      5, 0, 0, 0))  // bottom image row
  }

  test("RLE8 early end-of-bitmap leaves the remaining raster at zero") {
    val base = Bmp.encodeGrayRle8(Array.fill(12)(0.toByte), 4, 3)
    val dataOffset = 14 + 40 + 256 * 4
    val body = Array[Byte](4, 8, 0, 1) // one full bottom row, then EOB
    val img = Bmp.decodeGray(base.take(dataOffset) ++ body)
    assert(img.pixels.toSeq == Seq[Byte](0, 0, 0, 0, 0, 0, 0, 0, 8, 8, 8, 8))
  }
}
