package graft.ops

/** Pure-JVM baseline TIFF codec for 8-bit grayscale images with
  * PackBits compression — two genuinely new structures for the
  * multimodal family: the TIFF IFD (a DIRECTORY OF TYPED TAGS with
  * value-or-offset indirection — unlike the linear chunk walks of
  * RIFF/PNG/GIF, readers must random-access via offsets and honor
  * field types), and the PackBits RLE grammar (TIFF spec §9, the
  * classic Macintosh run-length scheme: control byte n ∈ [0,127] ⇒
  * copy n+1 literal bytes, n ∈ [−127,−1] ⇒ repeat the next byte 1−n
  * times, −128 ⇒ no-op). Both per the public TIFF 6.0 specification
  * (Adobe, 1992). Little-endian ("II") byte order, single-strip
  * images, the eight baseline-required tags. PackBits is lossless, so
  * decode∘encode is identity on pixels and the q287-style byte replay
  * certifies the IFD walk AND the RLE grammar end-to-end.
  */
object Tiff {

  final case class GrayImage(width: Int, height: Int, pixels: Array[Byte])

  // baseline tag ids (TIFF 6.0 §8)
  private val TagWidth = 256
  private val TagLength = 257
  private val TagBitsPerSample = 258
  private val TagCompression = 259
  private val TagPhotometric = 262
  private val TagStripOffsets = 273
  private val TagRowsPerStrip = 278
  private val TagStripByteCounts = 279

  private val CompPackBits = 32773
  private val TypeShort = 3
  private val TypeLong = 4

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def putLe16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
  }
  private def putLe32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  /** PackBits-compress one buffer (TIFF 6.0 §9). The encoder is the
    * spec's recommended one: maximal runs of ≥2 equal bytes become
    * (1−n, byte); everything else accumulates into literal groups of
    * ≤128. Never emits the −128 no-op. */
  def packBits(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    val n = data.length
    while (i < n) {
      // measure the run starting at i
      var run = 1
      while (i + run < n && data(i + run) == data(i) && run < 128) run += 1
      if (run >= 2) {
        out.write(1 - run) // −(run−1) as a signed byte
        out.write(data(i))
        i += run
      } else {
        // literal group: until the next ≥2-run or 128 bytes
        val start = i
        i += 1
        var continue = true
        while (continue && i < n && (i - start) < 128) {
          if (i + 1 < n && data(i + 1) == data(i)) continue = false
          else i += 1
        }
        out.write(i - start - 1)
        out.write(data, start, i - start)
      }
    }
    out.toByteArray
  }

  /** PackBits-decompress into exactly `expected` bytes. */
  def unpackBits(data: Array[Byte], expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var i = 0
    var o = 0
    while (o < expected) {
      require(i < data.length, "PackBits stream truncated")
      val c = data(i) // signed control byte
      i += 1
      if (c >= 0) { // literal: c+1 bytes
        require(i + c + 1 <= data.length && o + c + 1 <= expected,
          "PackBits literal overruns")
        System.arraycopy(data, i, out, o, c + 1)
        i += c + 1; o += c + 1
      } else if (c != -128) { // run: repeat next byte 1−c times
        require(i < data.length && o + (1 - c) <= expected,
          "PackBits run overruns")
        java.util.Arrays.fill(out, o, o + (1 - c), data(i))
        i += 1; o += 1 - c
      } // −128: no-op per spec
    }
    require(i == data.length, "trailing bytes after PackBits stream")
    out
  }

  /** Encode row-major grayscale pixels as a little-endian ("II")
    * single-strip PackBits TIFF with the eight baseline tags. The
    * strip data sits after the IFD; StripOffsets/StripByteCounts
    * point at it. */
  def encodeGray(pixels: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(pixels.length == width * height,
      s"pixel buffer ${pixels.length} != $width x $height")
    val strip = packBits(pixels)
    val out = new java.io.ByteArrayOutputStream(64 + strip.length)
    out.write('I'); out.write('I') // little-endian
    putLe16(out, 42)               // TIFF magic
    putLe32(out, 8)                // IFD offset: immediately after header
    val nTags = 8
    // IFD: count + 12-byte entries + next-IFD pointer
    val stripOffset = 8 + 2 + nTags * 12 + 4
    putLe16(out, nTags)
    def entry(tag: Int, typ: Int, value: Int): Unit = {
      putLe16(out, tag); putLe16(out, typ); putLe32(out, 1)
      if (typ == TypeShort) { putLe16(out, value); putLe16(out, 0) }
      else putLe32(out, value)
    }
    entry(TagWidth, TypeLong, width)
    entry(TagLength, TypeLong, height)
    entry(TagBitsPerSample, TypeShort, 8)
    entry(TagCompression, TypeShort, CompPackBits)
    entry(TagPhotometric, TypeShort, 1) // BlackIsZero
    entry(TagStripOffsets, TypeLong, stripOffset)
    entry(TagRowsPerStrip, TypeLong, height)
    entry(TagStripByteCounts, TypeLong, strip.length)
    putLe32(out, 0) // no next IFD
    out.write(strip)
    out.toByteArray
  }

  /** Decode a single-strip grayscale PackBits TIFF produced by
    * [[encodeGray]]-shaped writers: header validation (byte order,
    * magic 42), a REAL IFD walk (tags in any order, unknown tags
    * skipped, SHORT/LONG value extraction from the inline value
    * field), required-tag and compression enforcement, then PackBits
    * decompression of the strip located via offset indirection. */
  def decodeGray(bytes: Array[Byte]): GrayImage = {
    require(bytes.length >= 8, "truncated TIFF")
    require(bytes(0) == 'I' && bytes(1) == 'I',
      "little-endian ('II') TIFF expected")
    require(le16(bytes, 2) == 42, "bad TIFF magic")
    val ifd = le32(bytes, 4)
    require(ifd >= 8 && ifd + 2 <= bytes.length, "IFD offset out of range")
    val n = le16(bytes, ifd)
    require(ifd + 2 + n * 12 + 4 <= bytes.length, "IFD overruns the stream")
    var width = -1; var height = -1; var bits = -1; var comp = -1
    var photo = -1; var stripOff = -1; var stripLen = -1; var rowsPer = -1
    var e = 0
    while (e < n) {
      val base = ifd + 2 + e * 12
      val tag = le16(bytes, base)
      val typ = le16(bytes, base + 2)
      val count = le32(bytes, base + 4)
      // single-value SHORT/LONG fields fit the inline value slot
      def value: Int = {
        require(count == 1, s"tag $tag: multi-value fields not in scope")
        typ match {
          case TypeShort => le16(bytes, base + 8)
          case TypeLong => le32(bytes, base + 8)
          case t => throw new IllegalArgumentException(
            s"tag $tag: unsupported field type $t")
        }
      }
      tag match {
        case TagWidth => width = value
        case TagLength => height = value
        case TagBitsPerSample => bits = value
        case TagCompression => comp = value
        case TagPhotometric => photo = value
        case TagStripOffsets => stripOff = value
        case TagRowsPerStrip => rowsPer = value
        case TagStripByteCounts => stripLen = value
        case _ => () // unknown tags: skip (fixed 12-byte entries)
      }
      e += 1
    }
    require(width > 0 && height > 0, "missing width/length tags")
    require(bits == 8, s"8-bit grayscale expected, got $bits bits")
    require(comp == CompPackBits, s"PackBits expected, got compression $comp")
    require(photo == 1, "PhotometricInterpretation must be BlackIsZero")
    require(rowsPer == -1 || rowsPer >= height,
      "single-strip decoder: RowsPerStrip must cover the image")
    require(stripOff >= 0 && stripLen >= 0 &&
      stripOff + stripLen <= bytes.length, "strip out of range")
    val pixels = unpackBits(
      java.util.Arrays.copyOfRange(bytes, stripOff, stripOff + stripLen),
      width * height)
    GrayImage(width, height, pixels)
  }
}
