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
    val rle = bmp.clone(); rle(30) = 1 // BI_RLE8
    intercept[IllegalArgumentException] { Bmp.decodeGray(rle) }
  }
}
