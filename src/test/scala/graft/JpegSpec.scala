package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Jpeg

/** Pins the baseline JPEG codec the same way PngSpec pins the PNG
  * one: coefficient-domain round-trips (the identity a lossy codec
  * DOES guarantee), the specific entropy-coding structures (ZRL runs,
  * EOB, byte stuffing, DC prediction across blocks), and the integer
  * IDCT's block raster. The end-to-end decode is oracle-checked as
  * q267.
  */
class JpegSpec extends AnyFunSuite {

  private def block(f: Int => Int): Array[Int] = Array.tabulate(64)(f)

  test("coefficient round-trip: decode(encode(c)) == c, dims from SOF0") {
    val blocks = Array(
      block(j => if (j == 0) -37 else if (j < 32) ((j * 7) % 19) - 9 else 0),
      block(j => if (j == 0) 50 else if (j % 5 == 0 && j < 40) 10 - j % 21 else 0))
    val img = Jpeg.decodeGray(Jpeg.encodeGrayFromCoeffs(blocks, 2, 1))
    assert(img.width == 16 && img.height == 8)
    assert(img.coeffs.map(_.toSeq).toSeq == blocks.map(_.toSeq).toSeq)
  }

  test("ZRL: a >15 zero run inside a block survives the round-trip") {
    val b = block(j => if (j == 0) 12 else if (j == 21) 5 else if (j == 60) -3 else 0)
    val img = Jpeg.decodeGray(Jpeg.encodeGrayFromCoeffs(Array(b), 1, 1))
    assert(img.coeffs(0).toSeq == b.toSeq)
  }

  test("DC prediction chains across many blocks") {
    val blocks = Array.tabulate(8)(k => block(j => if (j == 0) k * 13 - 40 else 0))
    val img = Jpeg.decodeGray(Jpeg.encodeGrayFromCoeffs(blocks, 8, 1))
    assert(img.coeffs.map(_(0)).toSeq == blocks.map(_(0)).toSeq)
    assert(img.width == 64 && img.height == 8)
  }

  test("byte stuffing: streams containing FF00 still round-trip") {
    // sweep seeds until the entropy data actually contains a stuffed
    // FF00 (scan section only), then verify that stream decodes
    val found = (0 until 200).exists { seed =>
      val rnd = new scala.util.Random(seed)
      val blocks = Array.fill(4)(block(j =>
        if (j == 0) rnd.nextInt(101) - 50
        else if (j < 32) rnd.nextInt(21) - 10 else 0))
      val bytes = Jpeg.encodeGrayFromCoeffs(blocks, 4, 1)
      val scan = bytes.drop(2).dropRight(2)
      val stuffed = scan.indices.dropRight(1).exists(i =>
        (scan(i) & 0xff) == 0xff && (scan(i + 1) & 0xff) == 0x00)
      if (!stuffed) false
      else {
        val img = Jpeg.decodeGray(bytes)
        img.coeffs.map(_.toSeq).toSeq == blocks.map(_.toSeq).toSeq
      }
    }
    assert(found, "no seed produced a stuffed byte — stuffing untested")
  }

  test("round-trip sweep: large coefficients exercise the long Huffman codes") {
    // the q267 synthesis keeps |AC| <= 10 (category <= 4); this sweep
    // pushes AC category up to 10 (|AC| to 1023) and DC so its
    // DIFFERENCES reach category 11, covering the rare long-code rows
    // of the Annex K table plus both extension signs at every size.
    // (DC stays within ±1023 so chained differences respect the
    // baseline ±2047 bound — the first sweep deliberately violated it
    // and exposed a silent-corruption path, now an encoder require.)
    for (seed <- 0 until 50) {
      val rnd = new scala.util.Random(seed)
      val blocks = Array.fill(3)(block { j =>
        if (j == 0) rnd.nextInt(2047) - 1023
        else rnd.nextInt(5) match {
          case 0 => 0
          case 1 => rnd.nextInt(21) - 10
          case 2 => rnd.nextInt(2047) - 1023
          case _ => if (rnd.nextBoolean()) rnd.nextInt(7) - 3 else 0
        }
      })
      val img = Jpeg.decodeGray(Jpeg.encodeGrayFromCoeffs(blocks, 3, 1))
      assert(img.coeffs.map(_.toSeq).toSeq == blocks.map(_.toSeq).toSeq,
        s"round-trip diverged at seed $seed")
    }
  }

  test("DC-only block rasters to a constant 8x8 tile") {
    val img = Jpeg.decodeGray(Jpeg.encodeGrayFromCoeffs(
      Array(block(j => if (j == 0) 4 else 0)), 1, 1))
    val px = img.pixels.map(_ & 0xff).toSet
    assert(px.size == 1, s"DC-only block must be flat, got $px")
    // d = 4·16 (quant) = 64 ≈ 8 steps above mid-gray through the /8 DC
    // gain: 128 + round(64·1448²/2²⁴) = 136
    assert(px.head == 136)
  }

  test("idct basis is the fixed published table (spot values)") {
    assert(Jpeg.Basis(0)(0) == 1448)  // 2048/sqrt(2)
    assert(Jpeg.Basis(1)(0) == 2009)  // 2048·cos(pi/16)
    assert(Jpeg.Basis(4)(0) == 1448)  // 2048·cos(pi/4)
    assert(Jpeg.Basis(1)(7) == -2009) // symmetry
  }

  test("synthCoeffs: byte rules, zero tail, and the ≥64-byte contract") {
    val bytes = Array.tabulate(64)(i => ((i * 37 + 11) % 256).toByte)
    val cs = Jpeg.synthCoeffs(bytes, 2)
    assert(cs.length == 2 && cs.forall(_.length == 64))
    assert(cs(0)(0) == ((bytes(0) & 0xff) % 101) - 50)
    assert(cs(1)(5) == ((bytes(37) & 0xff) % 21) - 10)
    assert(cs.forall(b => (32 until 64).forall(j => b(j) == 0)))
  }

  test("encoder rejects out-of-baseline-range coefficients loudly") {
    intercept[IllegalArgumentException] {
      Jpeg.encodeGrayFromCoeffs(Array(block(j => if (j == 0) 3000 else 0)), 1, 1)
    }
    intercept[IllegalArgumentException] {
      Jpeg.encodeGrayFromCoeffs(
        Array(block(j => if (j == 5) 1500 else 0)), 1, 1)
    }
    ()
  }

  test("decoder rejects progressive streams instead of mis-decoding") {
    val ok = Jpeg.encodeGrayFromCoeffs(
      Array(block(j => if (j == 0) 1 else 0)), 1, 1)
    // flip SOF0 (FFC0) into SOF2 (FFC2 = progressive)
    val bad = ok.clone()
    val at = bad.indices.indexWhere(i =>
      (bad(i) & 0xff) == 0xff && (bad(i + 1) & 0xff) == 0xc0)
    bad(at + 1) = 0xc2.toByte
    intercept[IllegalArgumentException] { Jpeg.decodeGray(bad) }
    ()
  }

  // ---- 4:2:0 YCbCr (round 9) ----------------------------------------

  test("color 4:2:0: coefficient round-trip across interleaved MCUs") {
    // 2x1 MCUs = 12 blocks; distinct values per block exercise the
    // per-component DC predictors and both Huffman table pairs
    val blocks = Array.tabulate(12)(k =>
      block(j => if (j == 0) k * 9 - 40
      else if (j < 24) ((j * (k + 3)) % 19) - 9 else 0))
    val img = Jpeg.decodeColor420(Jpeg.encodeColor420FromCoeffs(blocks, 2, 1))
    assert(img.width == 32 && img.height == 16)
    assert(img.coeffs.map(_.toSeq).toSeq == blocks.map(_.toSeq).toSeq)
  }

  test("color 4:2:0: neutral chroma (Cb=Cr=128) decodes R=G=B=Y") {
    // Y DC = 16 -> luma 128+16*qDC*basis... use DC-only blocks; chroma
    // DC 0 dequantizes to 0 -> IDCT gives 128 (neutral)
    val blocks = Array.tabulate(6)(k =>
      block(j => if (j == 0 && k < 4) 3 else 0))
    val img = Jpeg.decodeColor420(Jpeg.encodeColor420FromCoeffs(blocks, 1, 1))
    val n = img.width * img.height
    // neutral chroma: the color transform's chroma terms are the bias
    // constants only -> R=G=B=Y everywhere
    assert((0 until n).forall(i => img.r(i) == img.g(i) && img.g(i) == img.b(i)))
    // and Y is the constant DC tile: 128 + round-trip of 3*16 via IDCT
    val y0 = img.r(0)
    assert((0 until n).forall(i => img.r(i) == y0))
  }

  test("color 4:2:0: red chroma shifts R up and G/B down vs neutral") {
    val neutral = Jpeg.decodeColor420(Jpeg.encodeColor420FromCoeffs(
      Array.tabulate(6)(k => block(j => if (j == 0 && k < 4) 5 else 0)), 1, 1))
    // positive Cr DC -> dcr > 0 -> R rises, G falls, B unchanged
    val red = Jpeg.decodeColor420(Jpeg.encodeColor420FromCoeffs(
      Array.tabulate(6)(k => block(j =>
        if (j == 0 && k < 4) 5 else if (j == 0 && k == 5) 2 else 0)), 1, 1))
    assert((red.r(0) & 0xff) > (neutral.r(0) & 0xff))
    assert((red.g(0) & 0xff) < (neutral.g(0) & 0xff))
    assert((red.b(0) & 0xff) == (neutral.b(0) & 0xff))
  }

  test("color 4:2:0: chroma upsampling replicates each sample to a 2x2 quad") {
    // one non-DC Cb coefficient makes the chroma plane non-constant;
    // every 2x2 luma quad must still share one chroma contribution.
    // Y constant => any R/G/B variation comes from chroma alone.
    val img = Jpeg.decodeColor420(Jpeg.encodeColor420FromCoeffs(
      Array.tabulate(6)(k => block(j =>
        if (j == 0 && k < 4) 5 else if (k == 4 && j == 1) 7 else 0)), 1, 1))
    for (qy <- 0 until 8; qx <- 0 until 8) {
      val quad = for (dy <- 0 to 1; dx <- 0 to 1)
        yield (img.b((qy * 2 + dy) * 16 + qx * 2 + dx) & 0xff)
      assert(quad.distinct.size == 1, s"quad ($qx,$qy) not uniform: $quad")
    }
    ()
  }

  test("color 4:2:0: synthCoeffs420 byte rules and zero tail") {
    val bytes = Array.tabulate(96)(i => ((i * 37 + 11) % 251).toByte)
    val cs = Jpeg.synthCoeffs420(bytes, 6)
    assert(cs.length == 6 && cs.forall(_.length == 64))
    assert(cs(0)(0) == ((bytes(0) & 0xff) % 101) - 50)
    assert(cs(5)(3) == ((bytes(83) & 0xff) % 21) - 10)
    assert(cs.forall(b => (16 until 64).forall(j => b(j) == 0)))
  }

  test("color 4:2:0: grayscale decoder refuses color streams and vice versa") {
    val color = Jpeg.encodeColor420FromCoeffs(
      Array.tabulate(6)(_ => block(_ => 0)), 1, 1)
    intercept[IllegalArgumentException] { Jpeg.decodeGray(color) }
    val gray = Jpeg.encodeGrayFromCoeffs(Array(block(_ => 0)), 1, 1)
    intercept[IllegalArgumentException] { Jpeg.decodeColor420(gray) }
    ()
  }

  // ---- restart intervals (DRI/RSTn, T.81 §E.2.4) --------------------

  private def restartBlocks(n: Int): Array[Array[Int]] =
    Array.tabulate(n)(k => block(j =>
      if (j == 0) k * 17 - 40 else if (j < 20 && (j + k) % 4 == 0) 6 - j % 13
      else 0))

  test("restart: coefficients and pixels identical to the no-restart stream") {
    val blocks = restartBlocks(6)
    val plain = Jpeg.decodeGray(Jpeg.encodeGrayFromCoeffs(blocks, 6, 1))
    val rst = Jpeg.decodeGray(Jpeg.encodeGrayFromCoeffs(blocks, 6, 1,
      restartInterval = 2))
    assert(rst.coeffs.map(_.toSeq).toSeq == blocks.map(_.toSeq).toSeq)
    assert(rst.pixels.toSeq == plain.pixels.toSeq)
  }

  test("restart: DRI segment and byte-aligned RST markers are in the stream") {
    val bytes = Jpeg.encodeGrayFromCoeffs(restartBlocks(6), 6, 1,
      restartInterval = 2)
    def hasMarker(m: Int) = bytes.indices.dropRight(1).exists(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == m)
    assert(hasMarker(0xdd), "missing DRI segment")
    assert(hasMarker(0xd0) && hasMarker(0xd1),
      "missing cyclic RST markers") // 6 MCUs / interval 2 → RST0, RST1
    val plain = Jpeg.encodeGrayFromCoeffs(restartBlocks(6), 6, 1)
    assert(bytes.length > plain.length, "restart stream must carry markers")
  }

  test("restart: interval not dividing the MCU count still round-trips") {
    val blocks = restartBlocks(5)
    val img = Jpeg.decodeGray(Jpeg.encodeGrayFromCoeffs(blocks, 5, 1,
      restartInterval = 2))
    assert(img.coeffs.map(_.toSeq).toSeq == blocks.map(_.toSeq).toSeq)
  }

  test("restart: marker index wraps past RST7 (cyclic modulo 8)") {
    val blocks = restartBlocks(12) // interval 1 → RST0..RST7, RST0, …
    val img = Jpeg.decodeGray(Jpeg.encodeGrayFromCoeffs(blocks, 12, 1,
      restartInterval = 1))
    assert(img.coeffs.map(_.toSeq).toSeq == blocks.map(_.toSeq).toSeq)
  }

  test("restart: an out-of-sequence RST marker is rejected loudly") {
    val bytes = Jpeg.encodeGrayFromCoeffs(restartBlocks(6), 6, 1,
      restartInterval = 2)
    // flip the FIRST restart marker (RST0) to RST5: a demuxer that
    // lost a whole restart segment would see exactly this skew
    val i = bytes.indices.dropRight(1).find(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xd0).get
    val corrupt = bytes.clone()
    corrupt(i + 1) = 0xd5.toByte
    intercept[IllegalArgumentException] { Jpeg.decodeGray(corrupt) }
    ()
  }

  // ---- progressive (SOF2, T.81 Annex G) -----------------------------

  test("progressive: coefficients round-trip and pixels equal sequential") {
    val blocks = Array(
      block(j => if (j == 0) -37 else if (j < 32) ((j * 7) % 19) - 9 else 0),
      block(j => if (j == 0) 50 else if (j % 5 == 0 && j < 40) 10 - j % 21 else 0),
      block(j => if (j == 0) -3 else 0), // odd negative DC: refinement bit
      block(_ => 0))
    val prog = Jpeg.decodeGrayProgressive(
      Jpeg.encodeGrayProgressiveFromCoeffs(blocks, 4, 1))
    val seq = Jpeg.decodeGray(Jpeg.encodeGrayFromCoeffs(blocks, 4, 1))
    assert(prog.coeffs.map(_.toSeq).toSeq == blocks.map(_.toSeq).toSeq)
    assert(prog.pixels.toSeq == seq.pixels.toSeq,
      "progressive and sequential must decode identical pixels")
    assert(prog.width == 32 && prog.height == 8)
  }

  test("progressive: the stream is genuinely multi-scan (SOF2 + 6 SOS)") {
    val bytes = Jpeg.encodeGrayProgressiveFromCoeffs(
      Array.fill(2)(block(j => if (j == 0) 12 else if (j == 3) 4 else 0)), 2, 1)
    def countMarker(m: Int) = bytes.indices.dropRight(1).count(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == m)
    assert(countMarker(0xc2) == 1, "missing SOF2")
    assert(countMarker(0xc0) == 0, "must not carry SOF0")
    assert(countMarker(0xda) == 6,
      "expected 6 scans: DC, DC refine, 2 AC first passes, 2 AC refines")
  }

  test("progressive AC refinement: ±1 coefficients arrive only in the refine scan") {
    // |c| == 1 is invisible to the Al=1 first pass (point transform
    // zeroes it); only the correction-bit scan can place it
    val b = block(j => if (j == 0) 4 else if (j == 2) 1 else if (j == 9) -1 else 0)
    val img = Jpeg.decodeGrayProgressive(
      Jpeg.encodeGrayProgressiveFromCoeffs(Array(b), 1, 1))
    assert(img.coeffs(0).toSeq == b.toSeq)
  }

  test("progressive AC refinement: odd magnitudes need their correction bit") {
    // ±odd values with |c|>=2 survive only if the refinement bit is
    // generated AND applied with the right sign direction
    val b = block(j => if (j == 0) 0 else if (j < 16) Seq(3, -7, 2, -2, 9, -9, 5, 0)(j % 8) else 0)
    val img = Jpeg.decodeGrayProgressive(
      Jpeg.encodeGrayProgressiveFromCoeffs(Array(b), 1, 1))
    assert(img.coeffs(0).toSeq == b.toSeq)
  }

  test("progressive AC refinement: ZRL splits correction bits at its 16th zero") {
    // band 6–63: nonzero-history at 6 and 24, a 20-zero gap, and a
    // newly-significant +1 at 28 — the ZRL's advance must consume only
    // the correction bits interleaved before its 16th zero, the (4,1)
    // symbol the rest; a flat flush desyncs the whole scan
    val b = block(j =>
      if (j == 6) 5 else if (j == 24) 9 else if (j == 28) 1 else 0)
    val img = Jpeg.decodeGrayProgressive(
      Jpeg.encodeGrayProgressiveFromCoeffs(Array(b), 1, 1))
    assert(img.coeffs(0).toSeq == b.toSeq)
  }

  test("progressive AC refinement: tail correction bits ride the EOB symbol") {
    // nonzero-history coefficients AFTER the last newly-significant
    // one get their bits appended after EOB0 — and must come back
    val b = block(j =>
      if (j == 1) 1 else if (j == 40) 6 else if (j == 50) 7 else 0)
    val img = Jpeg.decodeGrayProgressive(
      Jpeg.encodeGrayProgressiveFromCoeffs(Array(b), 1, 1))
    assert(img.coeffs(0).toSeq == b.toSeq)
  }

  test("progressive: DC successive approximation covers odd/negative DCs") {
    // every (sign, parity) combination — the refinement bit must OR
    // into the arithmetic-shifted first-pass value correctly
    val dcs = Seq(-4, -3, 0, 1, 7, 33, -33, 2)
    val blocks = dcs.map(v => block(j => if (j == 0) v else 0)).toArray
    val img = Jpeg.decodeGrayProgressive(
      Jpeg.encodeGrayProgressiveFromCoeffs(blocks, 8, 1))
    assert(img.coeffs.map(_(0)).toSeq == dcs)
  }

  test("progressive: ZRL inside a spectral band survives") {
    // nonzeros at zigzag 6 and 60: the 6..63 band carries a >16-zero
    // run between them → ZRL + run-length coding inside the band
    val b = block(j => if (j == 0) 9 else if (j == 6) 5 else if (j == 60) -2 else 0)
    val img = Jpeg.decodeGrayProgressive(
      Jpeg.encodeGrayProgressiveFromCoeffs(Array(b), 1, 1))
    assert(img.coeffs(0).toSeq == b.toSeq)
  }

  test("progressive decoder rejects sequential streams and vice versa") {
    val blocks = Array(block(j => if (j == 0) 5 else 0))
    intercept[IllegalArgumentException] {
      Jpeg.decodeGrayProgressive(Jpeg.encodeGrayFromCoeffs(blocks, 1, 1))
    }
    intercept[IllegalArgumentException] {
      Jpeg.decodeGray(Jpeg.encodeGrayProgressiveFromCoeffs(blocks, 1, 1))
    }
    ()
  }

  test("restart: DC prediction must RESET at the boundary, not chain") {
    // Two identical-DC blocks straddling the restart: with reset the
    // second block's diff re-encodes the full DC; a decoder that kept
    // chaining the predictor would read a diff of 0 and decode a
    // different (doubled) DC. Round-trip equality proves the reset.
    val blocks = Array.fill(2)(block(j => if (j == 0) 33 else 0))
    val img = Jpeg.decodeGray(Jpeg.encodeGrayFromCoeffs(blocks, 2, 1,
      restartInterval = 1))
    assert(img.coeffs.map(_(0)).toSeq == Seq(33, 33))
  }
}
