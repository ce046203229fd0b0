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
  * BITMAPINFOHEADER documentation; scope is biBitCount=8,
  * BI_RGB (uncompressed), positive biHeight (bottom-up).
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

  /** Decode an 8-bit BI_RGB BMP back to row-major grayscale pixels via
    * the palette's blue channel (for the gray palette all channels
    * agree). Walks the real header fields — data offset, dimensions,
    * bottom-up row order, 4-byte padding. */
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
    require(le32(bmp, 30) == 0, "compressed BMP not in scope")
    val clrUsed = { val v = le32(bmp, 46); if (v == 0) 256 else v }
    val paletteOff = 14 + hdrSize
    // palette lookup (blue channel of each BGRA quad)
    val palette = new Array[Byte](clrUsed)
    var i = 0
    while (i < clrUsed) { palette(i) = bmp(paletteOff + i * 4); i += 1 }
    val stride = rowStride(width)
    val pixels = new Array[Byte](width * height)
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
    GrayImage(width, height, pixels)
  }
}
