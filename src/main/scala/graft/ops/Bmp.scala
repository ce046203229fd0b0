package graft.ops

/** Pure-JVM BMP codec for 8-bit palettized (grayscale-palette) images
  * — the uncompressed member of the multimodal decoder family
  * (PNG: [[Png]], JPEG: [[Jpeg]], WAV: [[Wav]], GIF: [[Gif]]). BMP
  * has no entropy layer, but its container is NOT trivial to get
  * byte-exact: rows are stored BOTTOM-UP, padded to 4-byte
  * boundaries, behind a 14-byte file header + 40-byte
  * BITMAPINFOHEADER + 256×4 BGRA palette — exactly the offsets a
  * real decoder must walk (and the ones [[Multimodal.HeaderDecoder]]
  * already header-parses). The encoder synthesizes valid bottom-up
  * padded streams from deterministic pixel data; decode∘encode is
  * identity on pixels (lossless), so a decoded-pixel statistic
  * matched against an engine computing it straight from the source
  * bytes (q287) proves row order, padding, and palette indexing all
  * reconstructed exactly.
  *
  * Layouts follow the public Windows BITMAPFILEHEADER /
  * BITMAPINFOHEADER documentation; scope is biBitCount=8 with
  * positive biHeight (bottom-up), in BOTH storage modes: BI_RGB
  * (uncompressed, padded rows) and — since round 9 — BI_RLE8
  * (run-length: encoded (count,value) pairs, absolute-mode literal
  * blocks with WORD padding, and the 0-escapes end-of-line /
  * end-of-bitmap / delta).
  */
object Bmp {

  final case class GrayImage(width: Int, height: Int, pixels: Array[Byte])

  private def putLe16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
  }

  private def putLe32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  private def le16(p: Array[Byte], o: Int): Int =
    (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)

  private def le32(p: Array[Byte], o: Int): Int =
    (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) |
      ((p(o + 2) & 0xff) << 16) | ((p(o + 3) & 0xff) << 24)

  private def rowStride(width: Int): Int = (width + 3) & ~3

  /** Encode row-major grayscale `pixels` as an 8-bit palettized BMP
    * with a 256-entry gray BGRA palette (palette[i] = (i,i,i,0)),
    * bottom-up rows padded to 4 bytes — the standard uncompressed
    * Windows layout. */
  def encodeGray(pixels: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(pixels.length == width * height,
      s"pixel buffer ${pixels.length} != $width x $height")
    val stride = rowStride(width)
    val dataOffset = 14 + 40 + 256 * 4
    val imageSize = stride * height
    val out = new java.io.ByteArrayOutputStream(dataOffset + imageSize)
    // BITMAPFILEHEADER
    out.write('B'); out.write('M')
    putLe32(out, dataOffset + imageSize) // bfSize
    putLe16(out, 0); putLe16(out, 0)     // bfReserved1/2
    putLe32(out, dataOffset)             // bfOffBits
    // BITMAPINFOHEADER
    putLe32(out, 40)                     // biSize
    putLe32(out, width)
    putLe32(out, height)                 // positive → bottom-up
    putLe16(out, 1)                      // biPlanes
    putLe16(out, 8)                      // biBitCount
    putLe32(out, 0)                      // biCompression = BI_RGB
    putLe32(out, imageSize)
    putLe32(out, 2835); putLe32(out, 2835) // 72 DPI in px/m
    putLe32(out, 256)                    // biClrUsed
    putLe32(out, 0)                      // biClrImportant
    // gray palette: BGRA quads
    var i = 0
    while (i < 256) {
      out.write(i); out.write(i); out.write(i); out.write(0)
      i += 1
    }
    // pixel rows, bottom-up, padded
    var y = height - 1
    while (y >= 0) {
      out.write(pixels, y * width, width)
      var p = width
      while (p < stride) { out.write(0); p += 1 }
      y -= 1
    }
    out.toByteArray
  }

  /** Encode row-major grayscale `pixels` as an 8-bit BI_RLE8 BMP —
    * the run-length-compressed Windows layout: per bottom-up row, a
    * mix of encoded-mode pairs (count 1..255, palette index) for runs
    * and ABSOLUTE-MODE blocks (escape 0, count 3..255, literal
    * indices, padded to a WORD boundary) for non-repeating stretches,
    * each row closed by the end-of-line escape (0,0) and the stream
    * by end-of-bitmap (0,1). */
  def encodeGrayRle8(pixels: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(pixels.length == width * height,
      s"pixel buffer ${pixels.length} != $width x $height")
    val rle = new java.io.ByteArrayOutputStream()
    var y = height - 1 // rows stored bottom-up
    while (y >= 0) {
      var x = 0
      while (x < width) {
        // maximal run at x
        var runEnd = x + 1
        while (runEnd < width && pixels(y * width + runEnd) ==
          pixels(y * width + x)) runEnd += 1
        val run = runEnd - x
        if (run >= 2) { // encoded mode, split at 255
          var left = run
          while (left > 0) {
            val n = math.min(left, 255)
            rle.write(n); rle.write(pixels(y * width + x) & 0xff)
            left -= n
          }
          x = runEnd
        } else {
          // collect a literal stretch: singletons until the next run
          // of >= 3 (absolute blocks need >= 3 entries, so a 2-run is
          // cheaper to keep literal than to close and reopen a block)
          var litEnd = x + 1
          var done = false
          while (litEnd < width && !done) {
            var re = litEnd + 1
            while (re < width && pixels(y * width + re) ==
              pixels(y * width + litEnd)) re += 1
            if (re - litEnd >= 3) done = true else litEnd = re
          }
          val lit = math.min(litEnd - x, 255)
          if (lit >= 3) { // absolute mode, word-padded
            rle.write(0); rle.write(lit)
            var i = 0
            while (i < lit) { rle.write(pixels(y * width + x + i) & 0xff); i += 1 }
            if ((lit & 1) == 1) rle.write(0) // WORD padding
          } else { // 1–2 leftovers: encoded singleton pairs
            var i = 0
            while (i < lit) {
              rle.write(1); rle.write(pixels(y * width + x + i) & 0xff); i += 1
            }
          }
          x += lit
        }
      }
      rle.write(0); rle.write(0) // end of line
      y -= 1
    }
    rle.write(0); rle.write(1) // end of bitmap
    val data = rle.toByteArray

    val dataOffset = 14 + 40 + 256 * 4
    val out = new java.io.ByteArrayOutputStream(dataOffset + data.length)
    out.write('B'); out.write('M')
    putLe32(out, dataOffset + data.length)
    putLe16(out, 0); putLe16(out, 0)
    putLe32(out, dataOffset)
    putLe32(out, 40)
    putLe32(out, width)
    putLe32(out, height)
    putLe16(out, 1)
    putLe16(out, 8)
    putLe32(out, 1)                      // biCompression = BI_RLE8
    putLe32(out, data.length)            // biSizeImage = RLE byte count
    putLe32(out, 2835); putLe32(out, 2835)
    putLe32(out, 256)
    putLe32(out, 0)
    var i = 0
    while (i < 256) {
      out.write(i); out.write(i); out.write(i); out.write(0)
      i += 1
    }
    out.write(data, 0, data.length)
    out.toByteArray
  }

  /** Decode an 8-bit BMP (BI_RGB or BI_RLE8) back to row-major
    * grayscale pixels via the palette's blue channel (for the gray
    * palette all channels agree). Walks the real header fields — data
    * offset, dimensions, bottom-up row order, and either the padded
    * flat rows (BI_RGB) or the full RLE8 grammar: encoded runs,
    * absolute blocks with WORD padding, end-of-line, end-of-bitmap,
    * and the delta escape (skipped pixels keep palette index 0, the
    * standard decoder behavior). */
  def decodeGray(bmp: Array[Byte]): GrayImage = {
    require(bmp.length >= 54 && bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte,
      "not a BMP stream")
    val dataOffset = le32(bmp, 10)
    val hdrSize = le32(bmp, 14)
    require(hdrSize >= 40, s"unsupported DIB header size $hdrSize")
    val width = le32(bmp, 18)
    val height = le32(bmp, 22)
    require(height > 0, "top-down BMP not in scope")
    val bitCount = le16(bmp, 28)
    require(bitCount == 8, s"unsupported biBitCount $bitCount")
    val compression = le32(bmp, 30)
    require(compression == 0 || compression == 1,
      s"unsupported biCompression $compression (BI_RGB/BI_RLE8 only)")
    val clrUsed = { val v = le32(bmp, 46); if (v == 0) 256 else v }
    val paletteOff = 14 + hdrSize
    // palette lookup (blue channel of each BGRA quad)
    val palette = new Array[Byte](clrUsed)
    var i = 0
    while (i < clrUsed) { palette(i) = bmp(paletteOff + i * 4); i += 1 }
    val pixels = new Array[Byte](width * height)

    if (compression == 0) {
      val stride = rowStride(width)
      var y = 0
      while (y < height) {
        val srcRow = dataOffset + (height - 1 - y) * stride
        var x = 0
        while (x < width) {
          pixels(y * width + x) = palette(bmp(srcRow + x) & 0xff)
          x += 1
        }
        y += 1
      }
    } else { // BI_RLE8: indices land in a bottom-up raster first
      val idx = new Array[Byte](width * height) // palette index 0 default
      var p = dataOffset
      var x = 0
      var row = 0 // bottom-up row counter
      var eob = false
      while (!eob) {
        require(p + 1 < bmp.length, "truncated RLE8 stream")
        val b0 = bmp(p) & 0xff; val b1 = bmp(p + 1) & 0xff
        p += 2
        if (b0 > 0) { // encoded mode: b0 copies of index b1
          require(x + b0 <= width, s"RLE8 run overruns row $row")
          var i = 0
          while (i < b0) { idx((height - 1 - row) * width + x) = b1.toByte
            x += 1; i += 1 }
        } else b1 match {
          case 0 => // end of line
            x = 0; row += 1
            require(row <= height, "RLE8 rows exceed biHeight")
          case 1 => eob = true
          case 2 => // delta: skip (dx, dy); skipped pixels stay index 0
            require(p + 1 < bmp.length, "truncated RLE8 delta")
            val dx = bmp(p) & 0xff; val dy = bmp(p + 1) & 0xff
            p += 2
            x += dx; row += dy
            require(x <= width && row <= height, "RLE8 delta out of bounds")
          case n => // absolute mode: n literal indices, word-padded
            require(x + n <= width, s"RLE8 absolute block overruns row $row")
            require(p + n <= bmp.length, "truncated RLE8 absolute block")
            var i = 0
            while (i < n) { idx((height - 1 - row) * width + x) = bmp(p + i)
              x += 1; i += 1 }
            p += n + (n & 1) // WORD padding
        }
      }
      var j = 0
      while (j < pixels.length) {
        pixels(j) = palette(idx(j) & 0xff); j += 1
      }
    }
    GrayImage(width, height, pixels)
  }
}
