package graft.ops

/** Pure-JVM BASELINE JPEG codec for 8-bit grayscale — closes the
  * round-7 "JPEG pixels not decoded" gap (`Multimodal.scala:14`) the
  * same way [[Png]] closed the PNG one: a REAL decoder (marker walk,
  * DQT/DHT/SOF0/SOS parsing, canonical Huffman entropy decode with
  * 0xFF00 byte unstuffing, DC prediction, zigzag→natural, dequantize,
  * IDCT) plus an encoder so tests and queries can synthesize valid
  * baseline JFIF streams from CHOSEN quantized coefficients
  * (ITU-T T.81; tables from Annex K — public standard).
  *
  * Exactness: the IDCT is a FIXED-POINT INTEGER transform — basis
  * B[u][x] = round(C(u)·cos((2x+1)uπ/16)·2¹¹) with all accumulation
  * in long and one biased shift back down (the same all-integer
  * trick as the PQ ADC kernel, [[Quantize]]) — so decoded pixels are
  * a pure integer function of the quantized coefficients that an
  * external engine replays bit-for-bit from the SAME basis literals
  * (q267). Scaled-integer IDCTs are exactly how production decoders
  * implement T.81 (the spec permits approximation); pinning ONE
  * deterministic variant is what makes the decode oracle-checkable,
  * which no float IDCT could be.
  *
  * Scope: baseline DCT, 8-bit, in TWO component layouts — single
  * grayscale ([[decodeGray]], q267) and, since round 9, interleaved
  * 3-component YCbCr 4:2:0 ([[decodeColor420]], q314: per-component
  * quant/Huffman tables, per-MCU Y₀Y₁Y₂Y₃CbCr entropy order,
  * replication chroma upsampling, fixed-point color transform) — the
  * two shapes that cover the overwhelming share of real web-crawl
  * JPEGs — plus RESTART INTERVALS since round 9 (DRI/RSTn, T.81
  * §B.2.4.4/E.2.4: the error-resilience markers cameras and encoders
  * emit so a bit error can't corrupt the rest of the scan; the
  * decoder must byte-align, consume the cyclic RST marker, and reset
  * every DC predictor — exactly the machinery [[decodeGray]] now
  * runs, q316). Progressive streams still surface through
  * [[Multimodal.HeaderDecoder]]'s real SOFn header parse with
  * `format`-level features only (honest boundary).
  */
object Jpeg {

  /** Standard zigzag order: index j → natural position v·8+u. */
  val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.1 luminance quantization table, natural (row-major)
    * order. */
  val QuantLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K.2 chrominance quantization table, natural (row-major)
    * order. */
  val QuantChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Fixed-point JFIF/BT.601 YCbCr→RGB constants, round(c·2¹⁶):
    * R = Y + 1.402·(Cr−128), G = Y − 0.344136·(Cb−128) −
    * 0.714136·(Cr−128), B = Y + 1.772·(Cb−128). Each chroma term is
    * computed as ((k·d + 2¹⁵ + 2³⁰) >> 16) − 2¹⁴ — the same
    * keep-the-numerator-positive bias trick as [[idct]], so the shift
    * replays as truncating division cross-engine. */
  val CrR = 91881L   // round(1.402    * 65536)
  val CbG = 22554L   // round(0.344136 * 65536)
  val CrG = 46802L   // round(0.714136 * 65536)
  val CbB = 116130L  // round(1.772    * 65536)

  // Annex K.3.1 / K.3.2 luminance Huffman specs: (BITS counts for code
  // lengths 1..16, HUFFVAL symbol list).
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).map(_.toByte).toArray
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val AcVals: Array[Byte] = (Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte))

  // Annex K.3.2 chrominance Huffman specs (Tables K.4 and K.6).
  private val DcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).map(_.toByte).toArray
  private val AcChromaBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119)
  private val AcChromaVals: Array[Byte] = (Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte))
  require(AcChromaVals.length == AcChromaBits.sum,
    "chroma AC Huffman spec out of sync")

  /** Fixed-point IDCT basis: B[u][x] = round(C(u)·cos((2x+1)uπ/16)·2¹¹),
    * C(0) = 1/√2, else 1 (StrictMath for platform determinism). Shared
    * with the q267 oracle as injected literals. */
  val Basis: Array[Array[Long]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
    StrictMath.round(c * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0) * 2048.0)
  }

  /** Integer IDCT of one dequantized block (natural order) → 64
    * clamped pixels: p(x,y) = clamp(128 + ((Σ d·B[u][x]·B[v][y] +
    * 2²³ + 2⁴⁰) >> 24) − 2¹⁶). The 2⁴⁰ bias keeps the shifted
    * numerator positive so >> matches the replaying engine's
    * truncating integer division regardless of sign. */
  def idct(d: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0L
        var v = 0
        while (v < 8) {
          var u = 0
          val bv = Basis(v)(y)
          while (u < 8) {
            val c = d(v * 8 + u)
            if (c != 0) s += c.toLong * Basis(u)(x) * bv
            u += 1
          }
          v += 1
        }
        val t = ((s + 8388608L + 1099511627776L) >> 24) - 65536L
        val p = 128L + t
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p.toInt
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- canonical Huffman (T.81 Annex C) -----------------------------

  private final class HuffEncoder(bits: Array[Int], vals: Array[Byte]) {
    val codeOf = new Array[Int](256)
    val lenOf = new Array[Int](256)
    locally {
      var code = 0; var k = 0
      for (l <- 1 to 16) {
        for (_ <- 0 until bits(l - 1)) {
          codeOf(vals(k) & 0xff) = code
          lenOf(vals(k) & 0xff) = l
          code += 1; k += 1
        }
        code <<= 1
      }
    }
  }

  private final class HuffDecoder(bits: Array[Int], vals: Array[Byte]) {
    // mincode/maxcode/valptr per length (T.81 F.2.2.3)
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      for (l <- 1 to 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
      }
    }
    def decode(br: BitReader): Int = {
      var l = 1; var code = br.readBit()
      while (l <= 16 && (maxCode(l) < 0 || code > maxCode(l))) {
        code = (code << 1) | br.readBit(); l += 1
      }
      require(l <= 16, "corrupt Huffman stream")
      vals(valPtr(l) + code - minCode(l)) & 0xff
    }
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0; private var n = 0
    def write(v: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1); n += 1
        if (n == 8) { emit(acc); acc = 0; n = 0 }
        i -= 1
      }
    }
    private def emit(b: Int): Unit = {
      out.write(b)
      if (b == 0xff) out.write(0x00) // byte stuffing
    }
    def flush(): Unit = if (n > 0) { // pad with 1s (spec convention)
      acc = (acc << (8 - n)) | ((1 << (8 - n)) - 1)
      emit(acc); acc = 0; n = 0
    }
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0; private var n = 0
    /** Consume an expected RSTm marker at a restart boundary: discard
      * the pad bits of the current byte (the entropy segment before a
      * restart is byte-aligned by 1-padding, T.81 §B.2.4.4) and verify
      * the cyclic marker index — a demuxer that loses sync here would
      * silently misattribute every following MCU. */
    def expectRestart(m: Int): Unit = {
      n = 0 // byte-align: drop the pad bits
      require(pos + 1 < data.length && (data(pos) & 0xff) == 0xff &&
        (data(pos + 1) & 0xff) == (0xd0 | m),
        f"expected RST$m at $pos, got ${data(pos) & 0xff}%02x${data(pos + 1) & 0xff}%02x")
      pos += 2
    }
    def readBit(): Int = {
      if (n == 0) {
        val b = data(pos) & 0xff; pos += 1
        if (b == 0xff) {
          val m = data(pos) & 0xff
          require(m == 0x00, f"unexpected marker FF$m%02x in entropy data")
          pos += 1
        }
        acc = b; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def read(len: Int): Int = {
      var v = 0; var i = 0
      while (i < len) { v = (v << 1) | readBit(); i += 1 }
      v
    }
  }

  private def bitSize(v: Int): Int =
    32 - Integer.numberOfLeadingZeros(math.abs(v))

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  // ---- encoder ------------------------------------------------------

  private def seg(out: java.io.ByteArrayOutputStream, marker: Int,
                  body: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    val len = body.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(body, 0, body.length)
  }

  /** Encode `blocks` (each 64 QUANTIZED coefficients in ZIGZAG order)
    * as a baseline JFIF grayscale stream of `mcusX`×`mcusY` blocks
    * (width = 8·mcusX, height = 8·mcusY), Annex K tables. A positive
    * `restartInterval` emits a DRI segment and the T.81 §E.2.4 restart
    * machinery: after every `restartInterval` MCUs the entropy segment
    * is byte-aligned (1-padded), a cyclic RST0..RST7 marker is
    * written, and the DC predictor resets to 0. */
  def encodeGrayFromCoeffs(blocks: Array[Array[Int]], mcusX: Int,
                           mcusY: Int, restartInterval: Int = 0): Array[Byte] = {
    require(blocks.length == mcusX * mcusY, "block count != MCU grid")
    require(blocks.forall(_.length == 64), "blocks must carry 64 coefs")
    require(restartInterval >= 0, "negative restart interval")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    seg(out, 0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // DQT: Pq=0/Tq=0, zigzag-order entries
    seg(out, 0xdb, (Array(0x00) ++ ZigZag.map(QuantLuma)).map(_.toByte))
    // SOF0: precision 8, h, w, 1 component (id 1, sampling 1x1, Tq 0)
    val h = 8 * mcusY; val w = 8 * mcusX
    seg(out, 0xc0, Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff,
      w & 0xff, 1, 1, 0x11, 0).map(_.toByte))
    // DHT: DC class 0 id 0, AC class 1 id 0
    seg(out, 0xc4, (Array(0x00) ++ DcBits ++ DcVals.map(_ & 0xff)).map(_.toByte))
    seg(out, 0xc4, (Array(0x10) ++ AcBits ++ AcVals.map(_ & 0xff)).map(_.toByte))
    if (restartInterval > 0) // DRI: MCUs between restart markers
      seg(out, 0xdd, Array((restartInterval >> 8) & 0xff,
        restartInterval & 0xff).map(_.toByte))
    // SOS: 1 component (id 1, DC table 0 / AC table 0), Ss/Se/AhAl
    seg(out, 0xda, Array(1, 1, 0x00, 0, 63, 0).map(_.toByte))
    val dcH = new HuffEncoder(DcBits, DcVals)
    val acH = new HuffEncoder(AcBits, AcVals)
    val bw = new BitWriter(out)
    var pred = 0
    var mcuIdx = 0
    var rstIdx = 0
    for (blk <- blocks) {
      if (restartInterval > 0 && mcuIdx > 0 && mcuIdx % restartInterval == 0) {
        bw.flush() // byte-align the segment, then the cyclic marker
        out.write(0xff); out.write(0xd0 | rstIdx)
        rstIdx = (rstIdx + 1) & 7
        pred = 0 // predictors reset at every restart (T.81 E.2.4)
      }
      mcuIdx += 1
      val diff = blk(0) - pred
      pred = blk(0)
      val s = bitSize(diff)
      // T.81 bounds for 8-bit baseline: DC difference category <= 11.
      // Out-of-range input would look up an UNSET code and emit a
      // silently corrupt stream — fail loudly instead.
      require(s <= 11, s"DC difference $diff exceeds the baseline range")
      bw.write(dcH.codeOf(s), dcH.lenOf(s))
      if (s > 0)
        bw.write(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      var j = 1
      var run = 0
      while (j < 64) {
        val c = blk(j)
        if (c == 0) run += 1
        else {
          while (run > 15) {
            bw.write(acH.codeOf(0xf0), acH.lenOf(0xf0)); run -= 16
          }
          val sz = bitSize(c)
          require(sz <= 10, s"AC coefficient $c exceeds the baseline range")
          val rs = (run << 4) | sz
          bw.write(acH.codeOf(rs), acH.lenOf(rs))
          bw.write(if (c < 0) c + (1 << sz) - 1 else c, sz)
          run = 0
        }
        j += 1
      }
      if (run > 0) bw.write(acH.codeOf(0x00), acH.lenOf(0x00)) // EOB
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Encode an INTERLEAVED 4:2:0 YCbCr baseline JFIF stream from
    * quantized zigzag coefficient blocks — the dominant web-crawl
    * JPEG shape (3 components, luma sampled 2×2 per chroma sample).
    * `blocks` holds `6·mcusX·mcusY` blocks in T.81 interleaved MCU
    * order: Y₀ Y₁ Y₂ Y₃ (raster within the 16×16 MCU) then Cb, Cr.
    * Luma uses the Annex K.1 table + K.3.1/K.3.2 luma Huffman codes,
    * chroma K.2 + the K.4/K.6 chroma codes, per-component DC
    * predictors — exactly the table layout every libjpeg-compatible
    * encoder emits. Image = 16·mcusX × 16·mcusY. */
  def encodeColor420FromCoeffs(blocks: Array[Array[Int]], mcusX: Int,
                               mcusY: Int): Array[Byte] = {
    require(blocks.length == 6 * mcusX * mcusY, "need 6 blocks per MCU")
    require(blocks.forall(_.length == 64), "blocks must carry 64 coefs")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    seg(out, 0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(out, 0xdb, (Array(0x00) ++ ZigZag.map(QuantLuma)).map(_.toByte))
    seg(out, 0xdb, (Array(0x01) ++ ZigZag.map(QuantChroma)).map(_.toByte))
    // SOF0: 3 components — Y id 1 sampling 2x2 Tq0, Cb/Cr id 2/3 1x1 Tq1
    val h = 16 * mcusY; val w = 16 * mcusX
    seg(out, 0xc0, Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff,
      w & 0xff, 3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1).map(_.toByte))
    seg(out, 0xc4, (Array(0x00) ++ DcBits ++ DcVals.map(_ & 0xff)).map(_.toByte))
    seg(out, 0xc4, (Array(0x10) ++ AcBits ++ AcVals.map(_ & 0xff)).map(_.toByte))
    seg(out, 0xc4, (Array(0x01) ++ DcChromaBits ++ DcChromaVals.map(_ & 0xff))
      .map(_.toByte))
    seg(out, 0xc4, (Array(0x11) ++ AcChromaBits ++ AcChromaVals.map(_ & 0xff))
      .map(_.toByte))
    // SOS: Y → tables 0/0, Cb/Cr → tables 1/1
    seg(out, 0xda, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0).map(_.toByte))
    val dcY = new HuffEncoder(DcBits, DcVals)
    val acY = new HuffEncoder(AcBits, AcVals)
    val dcC = new HuffEncoder(DcChromaBits, DcChromaVals)
    val acC = new HuffEncoder(AcChromaBits, AcChromaVals)
    val bw = new BitWriter(out)
    val pred = new Array[Int](3) // per-component DC predictor
    def encBlock(blk: Array[Int], comp: Int): Unit = {
      val (dcH, acH) = if (comp == 0) (dcY, acY) else (dcC, acC)
      val diff = blk(0) - pred(comp)
      pred(comp) = blk(0)
      val s = bitSize(diff)
      require(s <= 11, s"DC difference $diff exceeds the baseline range")
      bw.write(dcH.codeOf(s), dcH.lenOf(s))
      if (s > 0)
        bw.write(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      var j = 1; var run = 0
      while (j < 64) {
        val c = blk(j)
        if (c == 0) run += 1
        else {
          while (run > 15) {
            bw.write(acH.codeOf(0xf0), acH.lenOf(0xf0)); run -= 16
          }
          val sz = bitSize(c)
          require(sz <= 10, s"AC coefficient $c exceeds the baseline range")
          val rs = (run << 4) | sz
          bw.write(acH.codeOf(rs), acH.lenOf(rs))
          bw.write(if (c < 0) c + (1 << sz) - 1 else c, sz)
          run = 0
        }
        j += 1
      }
      if (run > 0) bw.write(acH.codeOf(0x00), acH.lenOf(0x00)) // EOB
    }
    var mcu = 0
    while (mcu < mcusX * mcusY) {
      var i = 0
      while (i < 6) {
        encBlock(blocks(mcu * 6 + i), if (i < 4) 0 else if (i == 4) 1 else 2)
        i += 1
      }
      mcu += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  // ---- decoder ------------------------------------------------------

  final case class GrayJpeg(width: Int, height: Int,
                            coeffs: Array[Array[Int]],  // zigzag, quantized
                            pixels: Array[Byte])        // row-major

  /** Decode a baseline grayscale JPEG: full marker walk (unknown
    * APPn/COM skipped), tables read FROM THE STREAM (not assumed),
    * entropy decode with DC prediction, dequantize, integer [[idct]],
    * block raster into a row-major image. */
  def decodeGray(data: Array[Byte]): GrayJpeg = {
    require((data(0) & 0xff) == 0xff && (data(1) & 0xff) == 0xd8, "not a JPEG")
    var pos = 2
    val quant = new Array[Array[Int]](4)      // Tq → zigzag-order table
    val dcTabs = new Array[HuffDecoder](4)
    val acTabs = new Array[HuffDecoder](4)
    var width = 0; var height = 0
    var compDc = 0; var compAc = 0; var compTq = 0
    var restartInterval = 0
    def u16(o: Int) = ((data(o) & 0xff) << 8) | (data(o + 1) & 0xff)
    var scanAt = -1
    while (scanAt < 0) {
      require((data(pos) & 0xff) == 0xff, f"expected marker at $pos")
      val m = data(pos + 1) & 0xff
      val len = u16(pos + 2)
      val body = pos + 4
      m match {
        case 0xdb => // DQT (possibly several tables per segment)
          var o = body
          while (o < pos + 2 + len) {
            val pq = (data(o) & 0xf0) >> 4; val tq = data(o) & 0x0f
            require(pq == 0, "only 8-bit quant tables")
            quant(tq) = Array.tabulate(64)(j => data(o + 1 + j) & 0xff)
            o += 65
          }
        case 0xc4 => // DHT (possibly several tables per segment)
          var o = body
          while (o < pos + 2 + len) {
            val cls = (data(o) & 0xf0) >> 4; val id = data(o) & 0x0f
            val bits = Array.tabulate(16)(i => data(o + 1 + i) & 0xff)
            val n = bits.sum
            val vals = Array.tabulate(n)(i => data(o + 17 + i))
            val dec = new HuffDecoder(bits, vals)
            if (cls == 0) dcTabs(id) = dec else acTabs(id) = dec
            o += 17 + n
          }
        case 0xc0 => // SOF0 baseline
          require((data(body) & 0xff) == 8, "only 8-bit precision")
          height = u16(body + 1); width = u16(body + 3)
          val ncomp = data(body + 5) & 0xff
          require(ncomp == 1, s"grayscale decoder, got $ncomp components")
          require((data(body + 7) & 0xff) == 0x11, "no subsampling supported")
          compTq = data(body + 8) & 0xff
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
             0xcb | 0xcd | 0xce | 0xcf =>
          throw new IllegalArgumentException(f"unsupported SOF marker FF$m%02x")
        case 0xdd => // DRI: restart interval in MCUs
          restartInterval = u16(body)
        case 0xda => // SOS
          val ns = data(body) & 0xff
          require(ns == 1, "single-component scan expected")
          compDc = (data(body + 2) & 0xf0) >> 4
          compAc = data(body + 2) & 0x0f
          scanAt = pos + 2 + len
        case _ => () // APPn / COM / others: skip
      }
      if (scanAt < 0) pos += 2 + len
    }
    require(width > 0 && height > 0, "missing SOF0 before SOS")
    val q = quant(compTq); require(q != null, "missing DQT")
    val dcT = dcTabs(compDc); val acT = acTabs(compAc)
    require(dcT != null && acT != null, "missing DHT")
    val mcusX = (width + 7) / 8; val mcusY = (height + 7) / 8
    val br = new BitReader(data, scanAt)
    val blocks = new Array[Array[Int]](mcusX * mcusY)
    val pixels = new Array[Byte](width * height)
    var pred = 0
    var rstIdx = 0
    var b = 0
    while (b < blocks.length) {
      if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
        br.expectRestart(rstIdx) // byte-align + verify the cyclic marker
        rstIdx = (rstIdx + 1) & 7
        pred = 0 // DC predictor resets at every restart
      }
      val zz = new Array[Int](64)
      val s = dcT.decode(br)
      pred += extend(br.read(s), s)
      zz(0) = pred
      var j = 1
      var done = false
      while (j < 64 && !done) {
        val rs = acT.decode(br)
        val r = rs >> 4; val sz = rs & 0x0f
        if (sz == 0) {
          if (r == 15) j += 16 else done = true // ZRL vs EOB
        } else {
          j += r
          require(j < 64, "AC index overrun")
          zz(j) = extend(br.read(sz), sz)
          j += 1
        }
      }
      blocks(b) = zz
      // dequantize into natural order, IDCT, raster into the image
      val nat = new Array[Int](64)
      var j2 = 0
      while (j2 < 64) { nat(ZigZag(j2)) = zz(j2) * q(j2); j2 += 1 }
      val px = idct(nat)
      val bx = b % mcusX; val by = b / mcusX
      var y = 0
      while (y < 8) {
        val iy = by * 8 + y
        var x = 0
        while (x < 8) {
          val ix = bx * 8 + x
          if (ix < width && iy < height)
            pixels(iy * width + ix) = px(y * 8 + x).toByte
          x += 1
        }
        y += 1
      }
      b += 1
    }
    GrayJpeg(width, height, blocks, pixels)
  }

  final case class ColorJpeg(width: Int, height: Int,
                             coeffs: Array[Array[Int]], // 6/MCU, zigzag, quantized
                             r: Array[Byte], g: Array[Byte], b: Array[Byte])

  /** Decode a baseline INTERLEAVED 4:2:0 YCbCr JPEG (the web-crawl
    * shape [[encodeColor420FromCoeffs]] emits): full marker walk with
    * per-component quant/Huffman table ids read from the stream,
    * per-MCU entropy decode (Y₀Y₁Y₂Y₃ Cb Cr, per-component DC
    * prediction), integer [[idct]] per block, chroma upsampled by
    * SAMPLE REPLICATION (each chroma sample covers its 2×2 luma
    * quad — T.81 leaves the upsampling filter to the decoder; pinning
    * replication, libjpeg's -nosmooth variant, is what keeps the
    * pixels an exact integer function of the coefficients), then the
    * fixed-point [[CrR]]/[[CbG]]/[[CrG]]/[[CbB]] color transform with
    * positive-bias shifts. Pure integers end-to-end → replayable. */
  def decodeColor420(data: Array[Byte]): ColorJpeg = {
    require((data(0) & 0xff) == 0xff && (data(1) & 0xff) == 0xd8, "not a JPEG")
    var pos = 2
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffDecoder](4)
    val acTabs = new Array[HuffDecoder](4)
    var width = 0; var height = 0
    val compTq = new Array[Int](3) // by component index (0=Y, 1=Cb, 2=Cr)
    val compDc = new Array[Int](3)
    val compAc = new Array[Int](3)
    def u16(o: Int) = ((data(o) & 0xff) << 8) | (data(o + 1) & 0xff)
    var scanAt = -1
    while (scanAt < 0) {
      require((data(pos) & 0xff) == 0xff, f"expected marker at $pos")
      val m = data(pos + 1) & 0xff
      val len = u16(pos + 2)
      val body = pos + 4
      m match {
        case 0xdb =>
          var o = body
          while (o < pos + 2 + len) {
            val pq = (data(o) & 0xf0) >> 4; val tq = data(o) & 0x0f
            require(pq == 0, "only 8-bit quant tables")
            quant(tq) = Array.tabulate(64)(j => data(o + 1 + j) & 0xff)
            o += 65
          }
        case 0xc4 =>
          var o = body
          while (o < pos + 2 + len) {
            val cls = (data(o) & 0xf0) >> 4; val id = data(o) & 0x0f
            val bits = Array.tabulate(16)(i => data(o + 1 + i) & 0xff)
            val n = bits.sum
            val vals = Array.tabulate(n)(i => data(o + 17 + i))
            val dec = new HuffDecoder(bits, vals)
            if (cls == 0) dcTabs(id) = dec else acTabs(id) = dec
            o += 17 + n
          }
        case 0xc0 =>
          require((data(body) & 0xff) == 8, "only 8-bit precision")
          height = u16(body + 1); width = u16(body + 3)
          require((data(body + 5) & 0xff) == 3, "YCbCr decoder wants 3 components")
          for (c <- 0 until 3) {
            val o = body + 6 + 3 * c
            require((data(o) & 0xff) == c + 1, "component ids must be 1,2,3")
            val samp = data(o + 1) & 0xff
            require(samp == (if (c == 0) 0x22 else 0x11),
              f"4:2:0 decoder: component ${c + 1} has sampling $samp%02x")
            compTq(c) = data(o + 2) & 0xff
          }
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
             0xcb | 0xcd | 0xce | 0xcf =>
          throw new IllegalArgumentException(f"unsupported SOF marker FF$m%02x")
        case 0xda =>
          require((data(body) & 0xff) == 3, "three-component scan expected")
          for (c <- 0 until 3) {
            val o = body + 1 + 2 * c
            require((data(o) & 0xff) == c + 1, "scan order must be 1,2,3")
            compDc(c) = (data(o + 1) & 0xf0) >> 4
            compAc(c) = data(o + 1) & 0x0f
          }
          scanAt = pos + 2 + len
        case _ => ()
      }
      if (scanAt < 0) pos += 2 + len
    }
    require(width > 0 && height > 0, "missing SOF0 before SOS")
    require(width % 16 == 0 && height % 16 == 0,
      "4:2:0 decoder expects MCU-aligned dimensions")
    val mcusX = width / 16; val mcusY = height / 16
    val br = new BitReader(data, scanAt)
    val coeffs = new Array[Array[Int]](6 * mcusX * mcusY)
    val yPlane = new Array[Int](width * height)
    val cw = width / 2; val ch = height / 2
    val cbPlane = new Array[Int](cw * ch)
    val crPlane = new Array[Int](cw * ch)
    val pred = new Array[Int](3)
    def decBlock(comp: Int): (Array[Int], Array[Int]) = {
      val dcT = dcTabs(compDc(comp)); val acT = acTabs(compAc(comp))
      val q = quant(compTq(comp))
      require(dcT != null && acT != null && q != null, "missing tables")
      val zz = new Array[Int](64)
      val s = dcT.decode(br)
      pred(comp) += extend(br.read(s), s)
      zz(0) = pred(comp)
      var j = 1; var done = false
      while (j < 64 && !done) {
        val rs = acT.decode(br)
        val r = rs >> 4; val sz = rs & 0x0f
        if (sz == 0) {
          if (r == 15) j += 16 else done = true
        } else {
          j += r
          require(j < 64, "AC index overrun")
          zz(j) = extend(br.read(sz), sz)
          j += 1
        }
      }
      val nat = new Array[Int](64)
      var j2 = 0
      while (j2 < 64) { nat(ZigZag(j2)) = zz(j2) * q(j2); j2 += 1 }
      (zz, idct(nat))
    }
    var mcu = 0
    while (mcu < mcusX * mcusY) {
      val mx = mcu % mcusX; val my = mcu / mcusX
      var i = 0
      while (i < 6) {
        val comp = if (i < 4) 0 else if (i == 4) 1 else 2
        val (zz, px) = decBlock(comp)
        coeffs(mcu * 6 + i) = zz
        if (i < 4) { // luma block i at (i%2, i/2) within the MCU
          val ox = mx * 16 + (i % 2) * 8; val oy = my * 16 + (i / 2) * 8
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              yPlane((oy + y) * width + (ox + x)) = px(y * 8 + x); x += 1
            }
            y += 1
          }
        } else {
          val plane = if (i == 4) cbPlane else crPlane
          val ox = mx * 8; val oy = my * 8
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              plane((oy + y) * cw + (ox + x)) = px(y * 8 + x); x += 1
            }
            y += 1
          }
        }
        i += 1
      }
      mcu += 1
    }
    val r = new Array[Byte](width * height)
    val g = new Array[Byte](width * height)
    val b = new Array[Byte](width * height)
    def clamp(v: Long): Byte =
      (if (v < 0) 0 else if (v > 255) 255 else v).toByte
    var py = 0
    while (py < height) {
      var px2 = 0
      while (px2 < width) {
        val yv = yPlane(py * width + px2).toLong
        val ci = (py / 2) * cw + (px2 / 2)
        val dcb = cbPlane(ci).toLong - 128L
        val dcr = crPlane(ci).toLong - 128L
        val bias = 32768L + (1L << 30)
        val rT = ((CrR * dcr + bias) >> 16) - (1L << 14)
        val gT = ((CbG * dcb + CrG * dcr + bias) >> 16) - (1L << 14)
        val bT = ((CbB * dcb + bias) >> 16) - (1L << 14)
        val o = py * width + px2
        r(o) = clamp(yv + rT)
        g(o) = clamp(yv - gT)
        b(o) = clamp(yv + bT)
        px2 += 1
      }
      py += 1
    }
    ColorJpeg(width, height, coeffs, r, g, b)
  }

  // ---- progressive (SOF2) grayscale --------------------------------

  /** Encode `blocks` (64 QUANTIZED zigzag coefficients each) as a
    * PROGRESSIVE (SOF2) grayscale JFIF stream — T.81 Annex G, the
    * multi-scan shape web images use so a partial download renders a
    * coarse preview. Six scans exercising EVERY progressive mechanism:
    * spectral selection (the AC band splits 1–5 / 6–63), DC successive
    * approximation (DC>>1 DPCM at Al=1, then one RAW BIT per block at
    * Al=0 — refinement scans carry no DC entropy coding, G.1.2.1),
    * and AC successive approximation (first passes at Al=1 coding the
    * magnitude point transform sign·(|c|>>1), then the G.1.2.3
    * CORRECTION-BIT refinement protocol: newly-significant ±1
    * coefficients as (run,1)+sign, correction bits for every
    * already-nonzero coefficient buffered and appended after each
    * symbol's bits). End-of-band is coded as EOB0 per block (the
    * Annex K AC table defines no EOBn>0 symbols — aggregated EOBRUN
    * needs custom tables; the decoder handles general EOBRUN anyway). */
  def encodeGrayProgressiveFromCoeffs(blocks: Array[Array[Int]], mcusX: Int,
                                      mcusY: Int): Array[Byte] = {
    require(blocks.length == mcusX * mcusY, "block count != MCU grid")
    require(blocks.forall(_.length == 64), "blocks must carry 64 coefs")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    seg(out, 0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(out, 0xdb, (Array(0x00) ++ ZigZag.map(QuantLuma)).map(_.toByte))
    // SOF2: progressive DCT, same body layout as SOF0
    val h = 8 * mcusY; val w = 8 * mcusX
    seg(out, 0xc2, Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff,
      w & 0xff, 1, 1, 0x11, 0).map(_.toByte))
    seg(out, 0xc4, (Array(0x00) ++ DcBits ++ DcVals.map(_ & 0xff)).map(_.toByte))
    seg(out, 0xc4, (Array(0x10) ++ AcBits ++ AcVals.map(_ & 0xff)).map(_.toByte))
    val dcH = new HuffEncoder(DcBits, DcVals)
    val acH = new HuffEncoder(AcBits, AcVals)

    def sos(ss: Int, se: Int, ah: Int, al: Int): Unit =
      seg(out, 0xda, Array(1, 1, 0x00, ss, se, (ah << 4) | al).map(_.toByte))

    // the AC point transform is the MAGNITUDE shift sign·(|c|>>Al)
    // (toward zero), unlike DC's arithmetic shift (T.81 A.4)
    def acPt(c: Int, al: Int): Int =
      if (c < 0) -((-c) >> al) else c >> al

    // Scan 1 — DC first pass: DPCM over the point transform DC>>Al
    // (arithmetic shift, G.1.2.1), Huffman-coded like a baseline scan.
    sos(0, 0, ah = 0, al = 1)
    locally {
      val bw = new BitWriter(out)
      var pred = 0
      for (blk <- blocks) {
        val v = blk(0) >> 1
        val diff = v - pred
        pred = v
        val s = bitSize(diff)
        require(s <= 11, s"DC difference $diff exceeds the baseline range")
        bw.write(dcH.codeOf(s), dcH.lenOf(s))
        if (s > 0)
          bw.write(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      }
      bw.flush()
    }

    // Scan 2 — DC refinement: ONE raw bit per block (bit Al=0 of the
    // coefficient), no entropy coding.
    sos(0, 0, ah = 1, al = 0)
    locally {
      val bw = new BitWriter(out)
      for (blk <- blocks) bw.write(blk(0) & 1, 1)
      bw.flush()
    }

    // Scans 3 & 4 — AC spectral-band FIRST passes at Al=1: run-length
    // + EOB0 over the point-transformed values (|c|==1 coefficients
    // are invisible here; they arrive in the refinement scans).
    for ((ss, se) <- Seq((1, 5), (6, 63))) {
      sos(ss, se, ah = 0, al = 1)
      val bw = new BitWriter(out)
      for (blk <- blocks) {
        var last = -1
        var j = ss
        while (j <= se) { if (acPt(blk(j), 1) != 0) last = j; j += 1 }
        if (last < 0) {
          bw.write(acH.codeOf(0x00), acH.lenOf(0x00)) // EOB0: empty band
        } else {
          var run = 0
          j = ss
          while (j <= last) {
            val c = acPt(blk(j), 1)
            if (c == 0) run += 1
            else {
              while (run > 15) {
                bw.write(acH.codeOf(0xf0), acH.lenOf(0xf0)); run -= 16
              }
              val sz = bitSize(c)
              require(sz <= 10, s"AC coefficient $c exceeds the baseline range")
              bw.write(acH.codeOf((run << 4) | sz), acH.lenOf((run << 4) | sz))
              bw.write(if (c < 0) c + (1 << sz) - 1 else c, sz)
              run = 0
            }
            j += 1
          }
          if (last < se)
            bw.write(acH.codeOf(0x00), acH.lenOf(0x00)) // EOB0: zero tail
        }
      }
      bw.flush()
    }

    // Scans 5 & 6 — AC refinement (Ah=1, Al=0), the G.1.2.3 protocol:
    // runs count ZERO-HISTORY positions only; already-nonzero
    // coefficients crossed by a run contribute buffered correction
    // bits (|c| bit 0) emitted after the symbol's own bits; a
    // zero-history coefficient turning ±1 is coded as (run,1)+sign.
    for ((ss, se) <- Seq((1, 5), (6, 63))) {
      sos(ss, se, ah = 1, al = 0)
      val bw = new BitWriter(out)
      for (blk <- blocks) {
        // the segment since the last emitted symbol, in position order:
        // -1 = a zero-history zero, 0/1 = a correction bit for an
        // already-nonzero coefficient. The split matters: a ZRL's
        // advance consumes correction bits only up to its 16th zero,
        // so bits after that zero belong to the NEXT symbol's bits.
        val seg = scala.collection.mutable.ArrayBuffer.empty[Int]
        var j = ss
        while (j <= se) {
          val c = blk(j)
          val hist = acPt(c, 1) // what the first pass delivered
          if (hist != 0) seg += (math.abs(c) & 1)
          else if (c == 0) seg += -1
          else { // |c| == 1: newly significant in this scan
            while (seg.count(_ == -1) > 15) {
              bw.write(acH.codeOf(0xf0), acH.lenOf(0xf0)) // ZRL
              var zeros = 0
              while (zeros < 16) { // consume the 16-zero prefix + its bits
                val e = seg.remove(0)
                if (e == -1) zeros += 1 else bw.write(e, 1)
              }
            }
            val r = seg.count(_ == -1)
            bw.write(acH.codeOf((r << 4) | 1), acH.lenOf((r << 4) | 1))
            bw.write(if (c > 0) 1 else 0, 1) // sign: 1 → +1<<Al
            seg.foreach(e => if (e != -1) bw.write(e, 1)) // crossed bits
            seg.clear()
          }
          j += 1
        }
        if (seg.nonEmpty) {
          bw.write(acH.codeOf(0x00), acH.lenOf(0x00)) // EOB0
          seg.foreach(e => if (e != -1) bw.write(e, 1)) // tail bits
        }
      }
      bw.flush()
    }
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Decode a PROGRESSIVE (SOF2) grayscale JPEG: multi-scan marker
    * walk, per-scan spectral window (Ss..Se) and successive-
    * approximation state (Ah/Al), DC first+refinement passes, AC band
    * scans with GENERAL end-of-band runs (EOBn: run = (1<<r) + r raw
    * bits of extension, shared across consecutive blocks — the
    * mechanism progressive encoders with custom tables lean on), AND
    * the AC successive-approximation REFINEMENT protocol (G.1.2.3:
    * runs over zero-history positions, newly-significant ±1<<Al
    * placements, one correction bit per already-nonzero coefficient
    * crossed — including every nonzero coefficient of blocks inside
    * an EOB run), then one dequantize + integer [[idct]] over the
    * accumulated coefficients. */
  def decodeGrayProgressive(data: Array[Byte]): GrayJpeg = {
    require((data(0) & 0xff) == 0xff && (data(1) & 0xff) == 0xd8, "not a JPEG")
    var pos = 2
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffDecoder](4)
    val acTabs = new Array[HuffDecoder](4)
    var width = 0; var height = 0; var compTq = 0
    var coeffs: Array[Array[Int]] = null
    var sawEoi = false
    def u16(o: Int) = ((data(o) & 0xff) << 8) | (data(o + 1) & 0xff)
    while (!sawEoi) {
      require((data(pos) & 0xff) == 0xff, f"expected marker at $pos")
      val m = data(pos + 1) & 0xff
      if (m == 0xd9) { sawEoi = true }
      else {
        val len = u16(pos + 2)
        val body = pos + 4
        m match {
          case 0xdb =>
            var o = body
            while (o < pos + 2 + len) {
              val pq = (data(o) & 0xf0) >> 4; val tq = data(o) & 0x0f
              require(pq == 0, "only 8-bit quant tables")
              quant(tq) = Array.tabulate(64)(j => data(o + 1 + j) & 0xff)
              o += 65
            }
            pos += 2 + len
          case 0xc4 =>
            var o = body
            while (o < pos + 2 + len) {
              val cls = (data(o) & 0xf0) >> 4; val id = data(o) & 0x0f
              val bits = Array.tabulate(16)(i => data(o + 1 + i) & 0xff)
              val n = bits.sum
              val vals = Array.tabulate(n)(i => data(o + 17 + i))
              val dec = new HuffDecoder(bits, vals)
              if (cls == 0) dcTabs(id) = dec else acTabs(id) = dec
              o += 17 + n
            }
            pos += 2 + len
          case 0xc2 => // SOF2 progressive
            require((data(body) & 0xff) == 8, "only 8-bit precision")
            height = u16(body + 1); width = u16(body + 3)
            require((data(body + 5) & 0xff) == 1,
              "grayscale progressive decoder expects 1 component")
            require((data(body + 7) & 0xff) == 0x11, "no subsampling supported")
            compTq = data(body + 8) & 0xff
            coeffs = Array.fill((width + 7) / 8 * ((height + 7) / 8))(
              new Array[Int](64))
            pos += 2 + len
          case 0xc0 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
               0xcb | 0xcd | 0xce | 0xcf =>
            throw new IllegalArgumentException(
              f"progressive decoder: unsupported SOF marker FF$m%02x")
          case 0xda => // one scan of the progressive sequence
            require(coeffs != null, "SOS before SOF2")
            require((data(body) & 0xff) == 1, "single-component scan expected")
            val td = (data(body + 2) & 0xf0) >> 4
            val ta = data(body + 2) & 0x0f
            val ss = data(body + 3) & 0xff
            val se = data(body + 4) & 0xff
            val ah = (data(body + 5) & 0xf0) >> 4
            val al = data(body + 5) & 0x0f
            require(ss <= se && se <= 63, "bad spectral window")
            val br = new BitReader(data, pos + 2 + len)
            if (ss == 0) {
              require(se == 0, "DC scan must be Ss=Se=0 (T.81 G.1.1.1)")
              if (ah == 0) { // DC first pass: DPCM at point transform Al
                val dcT = dcTabs(td); require(dcT != null, "missing DC table")
                var pred = 0
                var b = 0
                while (b < coeffs.length) {
                  val s = dcT.decode(br)
                  pred += extend(br.read(s), s)
                  coeffs(b)(0) = pred << al
                  b += 1
                }
              } else { // DC refinement: one raw bit per block at Al
                var b = 0
                while (b < coeffs.length) {
                  if (br.readBit() == 1) coeffs(b)(0) |= 1 << al
                  b += 1
                }
              }
            } else if (ah == 0) { // AC spectral first pass
              val acT = acTabs(ta); require(acT != null, "missing AC table")
              var eobRun = 0
              var b = 0
              while (b < coeffs.length) {
                if (eobRun > 0) { eobRun -= 1 } // whole band stays zero
                else {
                  var k = ss
                  var done = false
                  while (k <= se && !done) {
                    val rs = acT.decode(br)
                    val r = rs >> 4; val sz = rs & 0x0f
                    if (sz == 0) {
                      if (r == 15) k += 16 // ZRL
                      else { // EOBn: (1<<r) + r extension bits bands
                        eobRun = (1 << r) + (if (r > 0) br.read(r) else 0) - 1
                        done = true
                      }
                    } else {
                      k += r
                      require(k <= se, "AC band overrun")
                      coeffs(b)(k) = extend(br.read(sz), sz) << al
                      k += 1
                    }
                  }
                }
                b += 1
              }
            } else { // AC refinement (G.1.2.3): correction-bit protocol
              val acT = acTabs(ta); require(acT != null, "missing AC table")
              val p1 = 1 << al; val m1 = -1 << al
              // one correction bit per already-nonzero coefficient
              // encountered — grow toward ±(next magnitude) on a 1 bit
              def correct(b: Int, k: Int): Unit =
                if (br.readBit() == 1) {
                  if (coeffs(b)(k) > 0) coeffs(b)(k) += p1
                  else coeffs(b)(k) -= p1
                }
              var eobRun = 0
              var b = 0
              while (b < coeffs.length) {
                if (eobRun > 0) {
                  // blocks inside an EOB run still refine every
                  // already-nonzero coefficient in the band
                  var k = ss
                  while (k <= se) {
                    if (coeffs(b)(k) != 0) correct(b, k)
                    k += 1
                  }
                  eobRun -= 1
                } else {
                  var k = ss
                  var done = false
                  while (k <= se && !done) {
                    val rs = acT.decode(br)
                    val r = rs >> 4; val sz = rs & 0x0f
                    if (sz == 0 && r != 15) { // EOBn: refine the tail
                      eobRun = (1 << r) + (if (r > 0) br.read(r) else 0) - 1
                      while (k <= se) {
                        if (coeffs(b)(k) != 0) correct(b, k)
                        k += 1
                      }
                      done = true
                    } else {
                      require(sz == 1 || (sz == 0 && r == 15),
                        "refinement scans carry only size-1 or ZRL symbols")
                      val newval =
                        if (sz == 1) { if (br.readBit() == 1) p1 else m1 }
                        else 0
                      // advance past `r` ZERO-HISTORY positions (16 for
                      // ZRL), refining nonzero-history ones on the way
                      var skip = if (sz == 0) 16 else r
                      var placed = sz == 0 // ZRL places nothing
                      while (k <= se && !placed) {
                        if (coeffs(b)(k) != 0) { correct(b, k); k += 1 }
                        else if (skip == 0) {
                          coeffs(b)(k) = newval; k += 1; placed = true
                        } else { skip -= 1; k += 1 }
                      }
                      if (sz == 0) { // ZRL: consume exactly 16 zeros
                        while (k <= se && skip > 0) {
                          if (coeffs(b)(k) != 0) correct(b, k)
                          else skip -= 1
                          k += 1
                        }
                      }
                      require(placed || sz == 0, "refinement band overrun")
                    }
                  }
                }
                b += 1
              }
            }
            // the next marker follows the entropy segment: skip pad
            // bytes and any 0xFF00 stuffing remnants
            var p = br.pos
            while (p + 1 < data.length &&
              !((data(p) & 0xff) == 0xff && (data(p + 1) & 0xff) != 0x00))
              p += 1
            pos = p
          case _ => pos += 2 + len // APPn / COM: skip
        }
      }
    }
    require(coeffs != null, "no SOF2 frame before EOI")
    val q = quant(compTq); require(q != null, "missing DQT")
    val mcusX = (width + 7) / 8; val mcusY = (height + 7) / 8
    val pixels = new Array[Byte](width * height)
    var b = 0
    while (b < coeffs.length) {
      val nat = new Array[Int](64)
      var j = 0
      while (j < 64) { nat(ZigZag(j)) = coeffs(b)(j) * q(j); j += 1 }
      val px = idct(nat)
      val bx = b % mcusX; val by = b / mcusX
      var y = 0
      while (y < 8) {
        val iy = by * 8 + y
        var x = 0
        while (x < 8) {
          val ix = bx * 8 + x
          if (ix < width && iy < height)
            pixels(iy * width + ix) = px(y * 8 + x).toByte
          x += 1
        }
        y += 1
      }
      b += 1
    }
    GrayJpeg(width, height, coeffs, pixels)
  }

  /** Deterministic coefficient synthesis for the q314 color payloads:
    * 6 blocks per MCU (Y₀..Y₃, Cb, Cr), block k drawing its 16
    * leading zigzag coefficients from payload bytes 16k..16k+15 —
    * DC = (b mod 101) − 50, AC_j = (b mod 21) − 10, rest zero.
    * Replayed verbatim by the oracle SQL. */
  def synthCoeffs420(bytes: Array[Byte], blocks: Int): Array[Array[Int]] =
    Array.tabulate(blocks) { k =>
      Array.tabulate(64) { j =>
        if (j >= 16) 0
        else {
          val b = bytes(16 * k + j) & 0xff
          if (j == 0) (b % 101) - 50 else (b % 21) - 10
        }
      }
    }

  /** Deterministic coefficient synthesis for the q267 payloads: block
    * k draws its 32 leading zigzag coefficients from payload bytes
    * 32k..32k+31 — DC = (b mod 101) − 50, AC_j = (b mod 21) − 10
    * (zeros land naturally → real run-length/EOB coding), positions
    * 32..63 zero. Replayed verbatim by the oracle SQL. */
  def synthCoeffs(bytes: Array[Byte], blocks: Int): Array[Array[Int]] =
    Array.tabulate(blocks) { k =>
      Array.tabulate(64) { j =>
        if (j >= 32) 0
        else {
          val b = bytes(32 * k + j) & 0xff
          if (j == 0) (b % 101) - 50 else (b % 21) - 10
        }
      }
    }
}
