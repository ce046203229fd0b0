package graft.ops

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec for 8-bit grayscale images — closes the round-5
  * "full pixel decode stubbed" gap in [[Multimodal]] with a REAL
  * decoder: chunk walk, zlib inflate of the concatenated IDAT stream
  * (`java.util.zip.Inflater`), and per-scanline UNFILTERING of all five
  * PNG filter types (None/Sub/Up/Average/Paeth — RFC 2083 §6). The
  * encoder exists so tests and queries can synthesize valid PNGs with
  * CHOSEN per-row filters from deterministic pixel data; round-tripping
  * through deflate+filter and comparing a decoded-pixel statistic
  * against an engine that computes it straight from the source bytes
  * (q121) proves the decode path, and PngSpec additionally pins each
  * filter's arithmetic on hand-built fixtures.
  *
  * Scope: color type 0 (grayscale), bit depth 8 — one byte per pixel,
  * bpp = 1 — in BOTH transmission orders: sequential (interlace 0) and,
  * since round 9, ADAM7 interlaced (interlace 1, RFC 2083 §2.6/§6: the
  * seven-pass 8×8 lattice progressive order; each pass is filtered as
  * an independent sub-image, all passes share one zlib stream, and
  * empty passes contribute no bytes — not even filter bytes). Other
  * color types still surface through [[Multimodal.HeaderDecoder]]
  * header parsing.
  */
object Png {

  private val Magic = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Adam7 pass lattice: (xStart, yStart, xStep, yStep) per pass. */
  val Adam7Passes: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  private def u32be(p: Array[Byte], o: Int): Int =
    ((p(o) & 0xff) << 24) | ((p(o + 1) & 0xff) << 16) |
      ((p(o + 2) & 0xff) << 8) | (p(o + 3) & 0xff)

  private def putU32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
    out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
  }

  private def chunk(out: java.io.ByteArrayOutputStream, tpe: String,
                    data: Array[Byte]): Unit = {
    putU32(out, data.length.toLong)
    val tb = tpe.getBytes("US-ASCII")
    val crc = new CRC32()
    crc.update(tb); crc.update(data)
    out.write(tb, 0, 4)
    out.write(data, 0, data.length)
    putU32(out, crc.getValue)
  }

  /** Paeth predictor (RFC 2083 §6.6) — shared by encoder and decoder. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Filter a (sub-)image's rows → (w+1)·h raw scanline bytes. */
  private def filterImage(pixels: Array[Byte], width: Int, height: Int,
                          filterFor: Int => Int): Array[Byte] = {
    val raw = new Array[Byte]((width + 1) * height)
    var y = 0
    while (y < height) {
      val f = filterFor(y)
      require(f >= 0 && f <= 4, s"filter $f")
      raw((width + 1) * y) = f.toByte
      var x = 0
      while (x < width) {
        val cur = pixels(y * width + x) & 0xff
        val left = if (x > 0) pixels(y * width + x - 1) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * width + x) & 0xff else 0
        val ul = if (x > 0 && y > 0) pixels((y - 1) * width + x - 1) & 0xff else 0
        val filtered = f match {
          case 0 => cur
          case 1 => (cur - left) & 0xff
          case 2 => (cur - up) & 0xff
          case 3 => (cur - (left + up) / 2) & 0xff
          case 4 => (cur - paeth(left, up, ul)) & 0xff
        }
        raw((width + 1) * y + 1 + x) = filtered.toByte
        x += 1
      }
      y += 1
    }
    raw
  }

  /** Unfilter (w+1)·h raw scanline bytes (starting at `off`) → w·h
    * pixels of one (sub-)image. */
  private def unfilterImage(raw: Array[Byte], off: Int, width: Int,
                            height: Int): Array[Byte] = {
    val pixels = new Array[Byte](width * height)
    var y = 0
    while (y < height) {
      val f = raw(off + (width + 1) * y) & 0xff
      require(f <= 4, s"bad filter byte $f on row $y")
      var x = 0
      while (x < width) {
        val v = raw(off + (width + 1) * y + 1 + x) & 0xff
        val left = if (x > 0) pixels(y * width + x - 1) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * width + x) & 0xff else 0
        val ul = if (x > 0 && y > 0) pixels((y - 1) * width + x - 1) & 0xff else 0
        val recon = f match {
          case 0 => v
          case 1 => (v + left) & 0xff
          case 2 => (v + up) & 0xff
          case 3 => (v + (left + up) / 2) & 0xff
          case 4 => (v + paeth(left, up, ul)) & 0xff
        }
        pixels(y * width + x) = recon.toByte
        x += 1
      }
      y += 1
    }
    pixels
  }

  private def deflateBytes(raw: Array[Byte]): Array[Byte] = {
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw); deflater.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    comp.toByteArray
  }

  private def container(width: Int, height: Int, interlace: Int,
                        idat: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic, 0, Magic.length)
    val ihdr = new java.io.ByteArrayOutputStream()
    putU32(ihdr, width.toLong); putU32(ihdr, height.toLong)
    ihdr.write(8) // bit depth
    ihdr.write(0) // color type: grayscale
    ihdr.write(0); ihdr.write(0) // compression/filter method
    ihdr.write(interlace)
    chunk(out, "IHDR", ihdr.toByteArray)
    chunk(out, "IDAT", idat)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Encode `pixels` (row-major, width×height bytes) as a grayscale
    * 8-bit PNG; `filterFor(row)` picks each scanline's filter (0-4). */
  def encodeGray(pixels: Array[Byte], width: Int, height: Int,
                 filterFor: Int => Int = _ => 0): Array[Byte] = {
    require(pixels.length == width * height,
      s"pixel buffer ${pixels.length} != $width x $height")
    container(width, height, interlace = 0,
      deflateBytes(filterImage(pixels, width, height, filterFor)))
  }

  /** Per-pass sub-image dimensions for Adam7 (0×0 for empty passes). */
  def adam7Dims(width: Int, height: Int, pass: Int): (Int, Int) = {
    val (x0, y0, dx, dy) = Adam7Passes(pass)
    val pw = if (width > x0) (width - x0 + dx - 1) / dx else 0
    val ph = if (height > y0) (height - y0 + dy - 1) / dy else 0
    (pw, ph)
  }

  /** Encode as an ADAM7-INTERLACED grayscale PNG (RFC 2083 §2.6): the
    * seven passes' sub-images are extracted on the 8×8 lattice, each
    * filtered as its own image (pass-local left/up neighbors), their
    * scanlines concatenated into ONE zlib stream, empty passes
    * contributing nothing. `filterFor(pass, row)` picks each pass
    * scanline's filter. */
  def encodeGrayAdam7(pixels: Array[Byte], width: Int, height: Int,
                      filterFor: (Int, Int) => Int = (_, _) => 0): Array[Byte] = {
    require(pixels.length == width * height,
      s"pixel buffer ${pixels.length} != $width x $height")
    val raw = new java.io.ByteArrayOutputStream()
    var pass = 0
    while (pass < 7) {
      val (x0, y0, dx, dy) = Adam7Passes(pass)
      val (pw, ph) = adam7Dims(width, height, pass)
      if (pw > 0 && ph > 0) {
        val sub = new Array[Byte](pw * ph)
        var j = 0
        while (j < ph) {
          var i = 0
          while (i < pw) {
            sub(j * pw + i) = pixels((y0 + j * dy) * width + (x0 + i * dx))
            i += 1
          }
          j += 1
        }
        val p = pass
        val fr = filterImage(sub, pw, ph, row => filterFor(p, row))
        raw.write(fr, 0, fr.length)
      }
      pass += 1
    }
    container(width, height, interlace = 1, deflateBytes(raw.toByteArray))
  }

  /** Decoded grayscale image. */
  final case class GrayImage(width: Int, height: Int, pixels: Array[Byte])

  /** Full pixel decode: chunk walk → IDAT concat → Inflater → per-row
    * unfilter — sequential or Adam7-interlaced (seven unfiltered pass
    * sub-images scattered back onto the 8×8 lattice). Throws
    * IllegalArgumentException on non-PNG input or unsupported color
    * type / bit depth / interlace method. */
  def decodeGray(png: Array[Byte]): GrayImage = {
    require(png.length >= 8 && Magic.indices.forall(i => png(i) == Magic(i)),
      "not a PNG")
    var width = 0; var height = 0; var interlace = 0
    var seenIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    var o = 8
    var done = false
    while (!done && o + 8 <= png.length) {
      val len = u32be(png, o)
      val tpe = new String(png, o + 4, 4, "US-ASCII")
      require(len >= 0 && o + 8 + len + 4 <= png.length, s"truncated chunk $tpe")
      tpe match {
        case "IHDR" =>
          width = u32be(png, o + 8); height = u32be(png, o + 12)
          val depth = png(o + 16) & 0xff; val color = png(o + 17) & 0xff
          interlace = png(o + 20) & 0xff
          require(depth == 8 && color == 0 && (interlace == 0 || interlace == 1),
            s"unsupported PNG shape: depth=$depth color=$color interlace=$interlace")
          seenIhdr = true
        case "IDAT" => idat.write(png, o + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped
      }
      o += 8 + len + 4
    }
    require(seenIhdr, "missing IHDR")
    val rawLen =
      if (interlace == 0) (width + 1) * height
      else (0 until 7).map { p =>
        val (pw, ph) = adam7Dims(width, height, p)
        if (pw > 0 && ph > 0) (pw + 1) * ph else 0
      }.sum
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    val raw = new Array[Byte](rawLen)
    var got = 0
    while (got < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, got, raw.length - got)
      require(n > 0 || !inflater.needsInput(), "truncated IDAT stream")
      got += n
    }
    inflater.end()
    require(got == raw.length, s"IDAT inflated to $got, expected ${raw.length}")

    if (interlace == 0) {
      GrayImage(width, height, unfilterImage(raw, 0, width, height))
    } else {
      val pixels = new Array[Byte](width * height)
      var off = 0
      var pass = 0
      while (pass < 7) {
        val (x0, y0, dx, dy) = Adam7Passes(pass)
        val (pw, ph) = adam7Dims(width, height, pass)
        if (pw > 0 && ph > 0) {
          val sub = unfilterImage(raw, off, pw, ph)
          var j = 0
          while (j < ph) {
            var i = 0
            while (i < pw) {
              pixels((y0 + j * dy) * width + (x0 + i * dx)) = sub(j * pw + i)
              i += 1
            }
            j += 1
          }
          off += (pw + 1) * ph
        }
        pass += 1
      }
      GrayImage(width, height, pixels)
    }
  }
}
