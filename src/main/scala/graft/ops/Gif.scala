package graft.ops

/** Pure-JVM GIF87a codec for 8-bit grayscale-palette images — the
  * dictionary-coded member of the multimodal decoder family (PNG
  * deflate: [[Png]], JPEG DCT: [[Jpeg]], PCM: [[Wav]], uncompressed:
  * [[Bmp]]). The compression layer is REAL GIF LZW (per the public
  * GIF87a/89a specification Appendix F): variable-width codes 9→12
  * bits packed LSB-first, an initial Clear code, End-of-Information,
  * dictionary growth with the decoder's famous "early change" (the
  * decoder widens one entry BEFORE the encoder's boundary because its
  * dictionary trails the encoder's by exactly one entry at read
  * time), the KwKwK self-referencing code case, deferred clear when
  * the table fills, and ≤255-byte data sub-blocks. GIF LZW is
  * lossless, so decode∘encode is identity on pixels and a
  * decoded-pixel statistic matched against an engine computing it
  * straight from the source bytes (q288) proves every code boundary,
  * width switch, and dictionary entry reconstructed exactly. GifSpec
  * additionally pins round-trips across the 512- and 1024-entry
  * width-change boundaries and the KwKwK case on fixtures.
  */
object Gif {

  final case class GrayImage(width: Int, height: Int, pixels: Array[Byte])

  private val MinCodeSize = 8           // 256-entry palette
  private val ClearCode = 1 << MinCodeSize          // 256
  private val EoiCode = ClearCode + 1               // 257
  private val FirstFree = EoiCode + 1               // 258
  private val MaxCode = 4096            // 12-bit ceiling

  private def putLe16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
  }

  /** LSB-first bit packer emitting GIF image-data sub-blocks. */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private val block = new Array[Byte](255)
    private var blockLen = 0
    private var cur = 0
    private var nBits = 0

    def write(code: Int, width: Int): Unit = {
      cur |= code << nBits
      nBits += width
      while (nBits >= 8) {
        block(blockLen) = (cur & 0xff).toByte
        blockLen += 1
        if (blockLen == 255) flushBlock()
        cur >>>= 8
        nBits -= 8
      }
    }

    private def flushBlock(): Unit = {
      out.write(blockLen)
      out.write(block, 0, blockLen)
      blockLen = 0
    }

    def finish(): Unit = {
      if (nBits > 0) {
        block(blockLen) = (cur & 0xff).toByte
        blockLen += 1
        if (blockLen == 255) flushBlock()
        cur = 0; nBits = 0
      }
      if (blockLen > 0) flushBlock()
      out.write(0)                      // block terminator
    }
  }

  /** LSB-first bit reader over concatenated sub-block payloads. */
  private final class BitReader(data: Array[Byte]) {
    private var pos = 0
    private var cur = 0L
    private var nBits = 0

    def read(width: Int): Int = {
      while (nBits < width) {
        require(pos < data.length, "LZW stream truncated")
        cur |= (data(pos) & 0xffL) << nBits
        pos += 1
        nBits += 8
      }
      val v = (cur & ((1L << width) - 1)).toInt
      cur >>>= width
      nBits -= width
      v
    }
  }

  /** GIF 4-pass interlace row order (GIF87a spec Appendix E): rows
    * 0,8,16,… then 4,12,… then 2,6,10,… then 1,3,5,… — transmission
    * row t carries image row `interlaceRows(h)(t)`. Unlike PNG's
    * Adam7 ([[Png]] pass-local filtering), GIF interlace permutes
    * WHOLE ROWS through one continuous LZW stream. */
  def interlaceRows(height: Int): Array[Int] =
    ((0 until height by 8) ++ (4 until height by 8) ++
      (2 until height by 4) ++ (1 until height by 2)).toArray

  /** Encode row-major grayscale `pixels` as a GIF87a stream with a
    * 256-entry gray global color table (palette index = gray value)
    * and a real LZW-compressed image data stream. With
    * `interlaced = true` the rows are transmitted in the 4-pass
    * interlace order and the image descriptor's interlace flag is
    * set. */
  def encodeGray(pixels: Array[Byte], width: Int, height: Int,
                 interlaced: Boolean): Array[Byte] = {
    if (!interlaced) encodeGray(pixels, width, height)
    else {
      require(pixels.length == width * height,
        s"pixel buffer ${pixels.length} != $width x $height")
      val order = interlaceRows(height)
      val permuted = new Array[Byte](pixels.length)
      var t = 0
      while (t < height) {
        System.arraycopy(pixels, order(t) * width, permuted, t * width, width)
        t += 1
      }
      val gif = encodeGray(permuted, width, height)
      // set the interlace flag in the image descriptor's packed byte.
      // The descriptor follows the 13-byte header + 768-byte GCT: its
      // packed field sits at offset 13 + 768 + 9.
      gif(13 + 768 + 9) = (gif(13 + 768 + 9) | 0x40).toByte
      gif
    }
  }

  /** Encode row-major grayscale `pixels` as a GIF87a stream with a
    * 256-entry gray global color table (palette index = gray value)
    * and a real LZW-compressed image data stream. */
  def encodeGray(pixels: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(pixels.length == width * height,
      s"pixel buffer ${pixels.length} != $width x $height")
    require(pixels.length > 0, "empty image")
    val out = new java.io.ByteArrayOutputStream(64 + pixels.length)
    out.write("GIF87a".getBytes("US-ASCII"), 0, 6)
    // logical screen descriptor: global color table, 8 bits/pixel, 256 entries
    putLe16(out, width); putLe16(out, height)
    out.write(0xf7)                     // GCT flag=1, color res=7, size=7 (2^8)
    out.write(0)                        // background color index
    out.write(0)                        // pixel aspect ratio
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    // image descriptor
    out.write(0x2c)
    putLe16(out, 0); putLe16(out, 0)
    putLe16(out, width); putLe16(out, height)
    out.write(0)                        // no local table, not interlaced
    out.write(MinCodeSize)
    // LZW compress. Dictionary: string → code, where every string is
    // (prefixCode, nextByte) — the standard trie keyed by a packed int.
    val bw = new BitWriter(out)
    var codeSize = MinCodeSize + 1
    var nextCode = FirstFree
    val dict = new java.util.HashMap[Integer, Integer](4096)
    bw.write(ClearCode, codeSize)
    var w = pixels(0) & 0xff            // current prefix CODE (root = literal)
    i = 1
    while (i < pixels.length) {
      val k = pixels(i) & 0xff
      val key = (w << 8) | k
      val hit = dict.get(key)
      if (hit != null) {
        w = hit.intValue
      } else {
        bw.write(w, codeSize)
        if (nextCode < MaxCode) {
          dict.put(key, nextCode)
          nextCode += 1
          // standard (giflib-compatible) boundary: widen as soon as
          // the next code to assign reaches the current capacity
          if (nextCode >= (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        // table full → deferred clear: keep coding with the frozen
        // dictionary (legal per spec; decoder mirrors by not adding)
        w = k
      }
      i += 1
    }
    bw.write(w, codeSize)
    bw.write(EoiCode, codeSize)
    bw.finish()
    out.write(0x3b)                     // trailer
    out.toByteArray
  }

  /** Decode a GIF87a/89a stream produced by [[encodeGray]]-shaped
    * encoders back to row-major grayscale pixels: header + screen
    * descriptor walk, global color table, image descriptor, LZW
    * decompression with early change and KwKwK handling, palette
    * lookup (blue channel). */
  def decodeGray(gif: Array[Byte]): GrayImage = {
    require(gif.length > 13 && gif(0) == 'G'.toByte && gif(1) == 'I'.toByte &&
      gif(2) == 'F'.toByte, "not a GIF stream")
    val width = (gif(6) & 0xff) | ((gif(7) & 0xff) << 8)
    val height = (gif(8) & 0xff) | ((gif(9) & 0xff) << 8)
    val packed = gif(10) & 0xff
    require((packed & 0x80) != 0, "global color table required")
    val gctSize = 2 << (packed & 7)
    var pos = 13
    val palette = new Array[Byte](gctSize)
    var ci = 0
    while (ci < gctSize) { palette(ci) = gif(pos + ci * 3); ci += 1 }
    pos += gctSize * 3
    // skip any extension blocks (0x21 label size sub-blocks... 0)
    while ((gif(pos) & 0xff) == 0x21) {
      pos += 2
      while ((gif(pos) & 0xff) != 0) pos += 1 + (gif(pos) & 0xff)
      pos += 1
    }
    require((gif(pos) & 0xff) == 0x2c, "image descriptor expected")
    require((gif(pos + 9) & 0x80) == 0, "local color table not in scope")
    val interlaced = (gif(pos + 9) & 0x40) != 0
    pos += 10
    val minCodeSize = gif(pos) & 0xff
    pos += 1
    // concatenate sub-block payloads
    val data = new java.io.ByteArrayOutputStream(gif.length - pos)
    var bl = gif(pos) & 0xff
    while (bl != 0) {
      data.write(gif, pos + 1, bl)
      pos += 1 + bl
      bl = gif(pos) & 0xff
    }
    val br = new BitReader(data.toByteArray)
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    // dictionary as prefix/suffix arrays (the giflib representation)
    val prefix = new Array[Int](MaxCode)
    val suffix = new Array[Byte](MaxCode)
    val stack = new Array[Byte](MaxCode + 1)
    var codeSize = minCodeSize + 1
    var nextCode = eoi + 1
    val pixels = new java.io.ByteArrayOutputStream(width * height)

    def emit(code: Int): Byte = {        // expand `code`, return first byte
      var sp = 0
      var c = code
      while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      val first = c.toByte
      pixels.write(palette(c) & 0xff)
      while (sp > 0) { sp -= 1; pixels.write(palette(stack(sp) & 0xff) & 0xff) }
      first
    }

    var prev = -1
    var firstByte: Byte = 0
    var done = false
    while (!done) {
      val code = br.read(codeSize)
      if (code == eoi) done = true
      else if (code == clear) {
        codeSize = minCodeSize + 1
        nextCode = eoi + 1
        prev = -1
      } else if (prev < 0) {
        require(code < clear, "first code after clear must be a literal")
        firstByte = emit(code)
        prev = code
      } else {
        if (code < nextCode) {          // known code
          firstByte = emit(code)
        } else {                        // KwKwK: code == nextCode
          require(code == nextCode, s"LZW code $code out of range")
          // expand prev + firstByte(prev): temporarily via the new entry
          if (nextCode < MaxCode) {
            prefix(nextCode) = prev; suffix(nextCode) = firstByte
          }
          firstByte = emit(code)
        }
        if (code < nextCode && nextCode < MaxCode) {
          prefix(nextCode) = prev; suffix(nextCode) = firstByte
        }
        if (nextCode < MaxCode) {
          nextCode += 1
          // EARLY CHANGE: the decoder's dictionary trails the
          // encoder's by exactly one entry at read time, so it widens
          // at capacity−1 — one entry before the encoder's boundary
          if (nextCode >= (1 << codeSize) - 1 && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    val px = pixels.toByteArray
    require(px.length == width * height,
      s"decoded ${px.length} pixels for $width x $height")
    if (!interlaced) GrayImage(width, height, px)
    else {
      // scatter transmission rows back onto the image lattice
      val order = interlaceRows(height)
      val out = new Array[Byte](px.length)
      var t = 0
      while (t < height) {
        System.arraycopy(px, t * width, out, order(t) * width, width)
        t += 1
      }
      GrayImage(width, height, out)
    }
  }
}
