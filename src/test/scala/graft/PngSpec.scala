package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Png

/** Pixel-level PNG decode (ops/Png.scala) — the q121 oracle proves the
  * whole round-trip against DuckDB; these fixtures pin each scanline
  * filter's arithmetic INDEPENDENTLY of the encoder by hand-building
  * the filtered raw stream (deflate of hand-written bytes) and
  * asserting hand-computed reconstructed pixels. */
class PngSpec extends AnyFunSuite {

  /** Build a minimal PNG from hand-written FILTERED scanlines (filter
    * byte + width filtered bytes per row), bypassing Png.encodeGray's
    * filter math entirely. */
  private def handBuilt(width: Int, height: Int, raw: Array[Int]): Array[Byte] = {
    import java.util.zip.{CRC32, Deflater}
    require(raw.length == (width + 1) * height)
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
      out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def chunk(tpe: String, data: Array[Byte]): Unit = {
      u32(data.length.toLong)
      val tb = tpe.getBytes("US-ASCII")
      val crc = new CRC32(); crc.update(tb); crc.update(data)
      out.write(tb, 0, 4); out.write(data, 0, data.length); u32(crc.getValue)
    }
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), 0, 8)
    val ihdr = new java.io.ByteArrayOutputStream()
    val w = new java.io.DataOutputStream(ihdr)
    w.writeInt(width); w.writeInt(height)
    w.write(8); w.write(0); w.write(0); w.write(0); w.write(0)
    chunk("IHDR", ihdr.toByteArray)
    val rawB = raw.map(_.toByte)
    val defl = new Deflater(); defl.setInput(rawB); defl.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()
    chunk("IDAT", comp.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def px(img: Png.GrayImage): Seq[Int] = img.pixels.map(_ & 0xff).toSeq

  test("filter 0 (None): raw bytes pass through") {
    val img = Png.decodeGray(handBuilt(3, 1, Array(0, 7, 8, 9)))
    assert((img.width, img.height) == (3, 1))
    assert(px(img) == Seq(7, 8, 9))
  }

  test("filter 1 (Sub): each byte adds the reconstructed left neighbor") {
    // filtered [10, 10, 10] -> pixels [10, 20, 30]
    val img = Png.decodeGray(handBuilt(3, 1, Array(1, 10, 10, 10)))
    assert(px(img) == Seq(10, 20, 30))
  }

  test("filter 2 (Up): each byte adds the pixel above") {
    val img = Png.decodeGray(handBuilt(3, 2,
      Array(0, 5, 6, 7, /* row1: */ 2, 1, 1, 1)))
    assert(px(img) == Seq(5, 6, 7, 6, 7, 8))
  }

  test("filter 3 (Average): adds floor((left + up) / 2)") {
    // row0 [10,20,30]; row1 filtered [1,2,3]:
    //   x0 = 1 + (0+10)/2 = 6; x1 = 2 + (6+20)/2 = 15; x2 = 3 + (15+30)/2 = 25
    val img = Png.decodeGray(handBuilt(3, 2,
      Array(0, 10, 20, 30, 3, 1, 2, 3)))
    assert(px(img) == Seq(10, 20, 30, 6, 15, 25))
  }

  test("filter 4 (Paeth): adds the Paeth predictor") {
    // row0 [10,20,30]; row1 filtered [1,2,3]:
    //   x0: paeth(0,10,0)=10 -> 11; x1: paeth(11,20,10)=20 -> 22;
    //   x2: paeth(22,30,20)=30 -> 33
    val img = Png.decodeGray(handBuilt(3, 2,
      Array(0, 10, 20, 30, 4, 1, 2, 3)))
    assert(px(img) == Seq(10, 20, 30, 11, 22, 33))
  }

  test("modular arithmetic: filtered bytes wrap at 256") {
    // Sub with left 200, filtered 100 -> (100 + 200) & 0xff = 44
    val img = Png.decodeGray(handBuilt(2, 1, Array(1, 200, 100)))
    assert(px(img) == Seq(200, 44))
  }

  test("encoder round-trip across all five filters, multi-IDAT-safe") {
    val width = 16; val height = 10
    val pixels = Array.tabulate(width * height)(i => ((i * 37 + 11) % 256).toByte)
    for (f <- 0 to 4) {
      val img = Png.decodeGray(Png.encodeGray(pixels, width, height, _ => f))
      assert(img.width == width && img.height == height)
      assert(img.pixels.toSeq == pixels.toSeq, s"filter $f")
    }
    // cycling filters (the q121 shape)
    val img = Png.decodeGray(Png.encodeGray(pixels, width, height, r => r % 5))
    assert(img.pixels.toSeq == pixels.toSeq)
  }

  test("rejects non-PNG and unsupported shapes") {
    intercept[IllegalArgumentException] { Png.decodeGray("nope".getBytes) }
    // color type 2 (RGB) refused: hand-build with color byte 2
    val bad = handBuilt(1, 1, Array(0, 1))
    bad(8 + 8 + 9) = 2 // IHDR color-type byte
    intercept[IllegalArgumentException] { Png.decodeGray(bad) }
    // interlace method 2 (not a PNG method) refused
    val badI = handBuilt(1, 1, Array(0, 1))
    badI(8 + 8 + 12) = 2 // IHDR interlace byte
    intercept[IllegalArgumentException] { Png.decodeGray(badI) }
  }

  // ---- Adam7 interlacing (RFC 2083 §2.6) ----------------------------

  test("Adam7 round-trip at lattice-aligned and ragged sizes") {
    for ((w, h) <- Seq((16, 8), (8, 8), (5, 3), (9, 10), (1, 1), (3, 1),
        (1, 9), (17, 13))) {
      val p = Array.tabulate(w * h)(i => ((i * 37 + w + 11) % 256).toByte)
      val img = Png.decodeGray(Png.encodeGrayAdam7(p, w, h))
      assert(img.width == w && img.height == h, s"dims at ${w}x$h")
      assert(img.pixels.toSeq == p.toSeq, s"pixels at ${w}x$h")
    }
  }

  test("Adam7 round-trip with per-pass cycling filters") {
    val p = Array.tabulate(16 * 8)(i => ((i * 53 + 7) % 256).toByte)
    val img = Png.decodeGray(
      Png.encodeGrayAdam7(p, 16, 8, (pass, r) => (pass + r) % 5))
    assert(img.pixels.toSeq == p.toSeq)
  }

  test("Adam7 stream declares interlace 1 and differs from sequential") {
    val p = Array.tabulate(16 * 8)(i => ((i * 37 + 11) % 256).toByte)
    val seq = Png.encodeGray(p, 16, 8)
    val adam = Png.encodeGrayAdam7(p, 16, 8)
    assert((seq(8 + 8 + 12) & 0xff) == 0 && (adam(8 + 8 + 12) & 0xff) == 1)
    assert(!java.util.Arrays.equals(seq, adam),
      "interlaced stream must reorder the scanlines")
    // both decode to the same image — the transmission order is the
    // only difference
    assert(Png.decodeGray(seq).pixels.toSeq == Png.decodeGray(adam).pixels.toSeq)
  }

  test("Adam7 pass geometry: empty passes vanish (no filter bytes)") {
    // 1×1: only pass 1 has a pixel; raw stream = 1 filter byte + 1
    // pixel byte → 2 bytes before compression
    assert(Png.adam7Dims(1, 1, 0) == (1, 1))
    for (pass <- 1 until 7) {
      val (pw, ph) = Png.adam7Dims(1, 1, pass)
      assert(pw == 0 || ph == 0, s"pass ${pass + 1} must be empty at 1x1")
    }
    // 8×8 lattice counts: the seven passes tile the image exactly
    val total = (0 until 7).map { p =>
      val (pw, ph) = Png.adam7Dims(8, 8, p); pw * ph
    }.sum
    assert(total == 64)
    // 5×3 ragged: per-pass pixel counts still tile the image
    val ragged = (0 until 7).map { p =>
      val (pw, ph) = Png.adam7Dims(5, 3, p); pw * ph
    }.sum
    assert(ragged == 15)
  }
}
