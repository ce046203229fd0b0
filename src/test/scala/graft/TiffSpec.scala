package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Tiff

/** Pins the TIFF codec's structures the q331 oracle diff can't name:
  * the PackBits grammar cases (literal groups, runs, the 128-byte
  * caps, the −128 no-op), the IFD walk (tag order independence,
  * unknown-tag skipping, type enforcement), and container-level
  * rejection.
  */
class TiffSpec extends AnyFunSuite {

  private def img(w: Int, h: Int)(f: Int => Int): Array[Byte] =
    Array.tabulate(w * h)(i => f(i).toByte)

  test("PackBits: runs, literals, and boundary caps round-trip") {
    val cases = Seq(
      Array[Byte](5, 5, 5, 5),                      // pure run
      Array[Byte](1, 2, 3, 4),                      // pure literal
      Array[Byte](1, 2, 2, 2, 3, 4, 4, 5),          // mixed
      Array.fill(300)(9.toByte),                    // run > 128 splits
      Array.tabulate(200)(i => (i % 131).toByte),   // literal > 128 splits
      Array[Byte](7),                               // single byte
      Array[Byte](8, 8)                             // minimal run
    )
    cases.foreach { c =>
      val enc = Tiff.packBits(c)
      assert(Tiff.unpackBits(enc, c.length).toSeq == c.toSeq,
        s"case ${c.take(8).toSeq}…")
    }
    // a flat buffer must actually compress
    assert(Tiff.packBits(Array.fill(100)(3.toByte)).length <= 2 * 2)
  }

  test("PackBits: the -128 no-op is tolerated on decode") {
    // hand-built stream: no-op, then a 3-run of 7, then 2 literals
    val stream = Array[Byte](-128, -2, 7, 1, 4, 5)
    assert(Tiff.unpackBits(stream, 5).toSeq ==
      Seq[Byte](7, 7, 7, 4, 5))
  }

  test("PackBits: overruns and trailing garbage are rejected") {
    intercept[IllegalArgumentException] {
      Tiff.unpackBits(Array[Byte](3, 1, 2), 4) // literal needs 4 bytes
    }
    intercept[IllegalArgumentException] {
      Tiff.unpackBits(Array[Byte](-2, 7), 2) // run of 3 > expected 2
    }
    intercept[IllegalArgumentException] {
      Tiff.unpackBits(Array[Byte](0, 1, 0, 2), 1) // trailing bytes
    }
    ()
  }

  test("TIFF round-trip: ragged sizes, runs and noise") {
    for ((w, h) <- Seq((10, 6), (1, 1), (7, 3), (16, 16))) {
      val noisy = img(w, h)(i => i * 37 + 11)
      val flat = img(w, h)(_ => 0xA0)
      for (px <- Seq(noisy, flat)) {
        val dec = Tiff.decodeGray(Tiff.encodeGray(px, w, h))
        assert(dec.width == w && dec.height == h)
        assert(dec.pixels.toSeq == px.toSeq, s"${w}x$h")
      }
    }
  }

  test("IFD walk: tag order is free and unknown tags are skipped") {
    val px = img(4, 2)(i => i * 16)
    val t = Tiff.encodeGray(px, 4, 2)
    // inject an unknown tag (tag 305 'Software', SHORT) by rebuilding
    // the IFD with 9 entries: copy header, bump count, append entry
    // before the next-IFD pointer, fix strip offset (+12)
    val n = 8
    val out = new java.io.ByteArrayOutputStream()
    out.write(t, 0, 8)                  // header
    out.write((n + 1) & 0xff); out.write(0) // new tag count
    // original entries, with StripOffsets (tag 273) shifted by 12
    for (e <- 0 until n) {
      val base = 10 + e * 12
      val tag = (t(base) & 0xff) | ((t(base + 1) & 0xff) << 8)
      if (tag == 273) {
        val old = (t(base + 8) & 0xff) | ((t(base + 9) & 0xff) << 8) |
          ((t(base + 10) & 0xff) << 16) | ((t(base + 11) & 0xff) << 24)
        out.write(t, base, 8)
        val nv = old + 12
        out.write(nv & 0xff); out.write((nv >> 8) & 0xff)
        out.write((nv >> 16) & 0xff); out.write((nv >> 24) & 0xff)
      } else out.write(t, base, 12)
    }
    // unknown tag 305, type SHORT, count 1, value 1
    out.write(Array[Byte](0x31, 0x01, 3, 0, 1, 0, 0, 0, 1, 0, 0, 0))
    out.write(t, 10 + n * 12, t.length - (10 + n * 12)) // next-IFD + strip
    val dec = Tiff.decodeGray(out.toByteArray)
    assert(dec.pixels.toSeq == px.toSeq, "unknown tag must be skipped")
  }

  test("rejection: wrong byte order, magic, compression, bit depth") {
    val good = Tiff.encodeGray(img(4, 2)(identity), 4, 2)
    val be = good.clone(); be(0) = 'M'; be(1) = 'M'
    intercept[IllegalArgumentException] { Tiff.decodeGray(be) }
    val magic = good.clone(); magic(2) = 43
    intercept[IllegalArgumentException] { Tiff.decodeGray(magic) }
    // compression tag value sits in entry 3 (0-based) → flip to 1 (none)
    val comp = good.clone()
    val base = 10 + 3 * 12
    assert(((comp(base) & 0xff) | ((comp(base + 1) & 0xff) << 8)) == 259)
    comp(base + 8) = 1; comp(base + 9) = 0
    intercept[IllegalArgumentException] { Tiff.decodeGray(comp) }
    val bits = good.clone()
    val bBase = 10 + 2 * 12
    assert(((bits(bBase) & 0xff) | ((bits(bBase + 1) & 0xff) << 8)) == 258)
    bits(bBase + 8) = 16
    intercept[IllegalArgumentException] { Tiff.decodeGray(bits) }
    ()
  }
}
