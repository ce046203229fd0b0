package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Wav

/** Pins the WAV PCM codec's structural behaviors the q274 oracle diff
  * can't name: chunk-walk robustness (unknown chunks, RIFF odd-size
  * padding), format enforcement, endianness, and the exact sample
  * round-trip.
  */
class WavSpec extends AnyFunSuite {

  private val tone: Array[Short] =
    Array.tabulate(48)(i => ((i % 7) * 4001 - 12000).toShort)

  test("PCM16 round-trip: decode(encode(s)) == s, rate preserved") {
    val a = Wav.decodePcm16(Wav.encodePcm16Mono(tone, 44100))
    assert(a.sampleRate == 44100 && a.channels == 1)
    assert(a.samples.toSeq == tone.toSeq)
  }

  test("negative samples survive the little-endian round-trip") {
    val s = Array[Short](-1, -32768, 32767, 0, -255, 256)
    assert(Wav.decodePcm16(Wav.encodePcm16Mono(s, 8000)).samples.toSeq == s.toSeq)
  }

  test("chunk walk skips unknown chunks (incl. odd-size RIFF padding)") {
    val base = Wav.encodePcm16Mono(tone, 8000)
    // splice a 5-byte (odd → padded) LIST chunk between WAVE and fmt
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 12)
    out.write("LIST".getBytes("US-ASCII"))
    out.write(Array[Byte](5, 0, 0, 0)) // little-endian size 5
    out.write(Array[Byte](1, 2, 3, 4, 5, 0)) // body + pad byte
    out.write(base, 12, base.length - 12)
    val spliced = out.toByteArray
    // fix the RIFF size field (bytes 4..7) for the added 14 bytes
    val grown = spliced.length - 8
    spliced(4) = (grown & 0xff).toByte
    spliced(5) = ((grown >> 8) & 0xff).toByte
    val a = Wav.decodePcm16(spliced)
    assert(a.samples.toSeq == tone.toSeq && a.sampleRate == 8000)
  }

  test("non-PCM and block-align-inconsistent streams are rejected") {
    val base = Wav.encodePcm16Mono(tone, 8000)
    val float = base.clone(); float(20) = 3 // fmt tag: IEEE float
    intercept[IllegalArgumentException] { Wav.decodePcm16(float) }
    // claiming stereo while block align still says mono must fail —
    // a decoder that trusted the channel count alone would de-frame
    // every sample after the first
    val badAlign = base.clone(); badAlign(22) = 2 // channel count only
    intercept[IllegalArgumentException] { Wav.decodePcm16(badAlign) }
    // >2 channels stays outside the decoder's declared scope
    val surround = Wav.encodePcm16Mono(tone, 8000).clone()
    surround(22) = 6; surround(32) = 12 // channels + matching align
    intercept[IllegalArgumentException] { Wav.decodePcm16(surround) }
    ()
  }

  test("stereo round-trip: interleaved frames, block align 4, rate kept") {
    val inter = Array.tabulate(48)(i =>
      (if (i % 2 == 0) i * 331 - 7000 else 9000 - i * 173).toShort)
    val a = Wav.decodePcm16(Wav.encodePcm16(inter, 22050, channels = 2))
    assert(a.channels == 2 && a.sampleRate == 22050)
    assert(a.samples.toSeq == inter.toSeq)
  }

  test("stereo de-interleave: even positions are L, odd are R") {
    val left = Array.tabulate(8)(i => (i * 1000).toShort)
    val right = Array.tabulate(8)(i => (-i * 1000).toShort)
    val inter = new Array[Short](16)
    for (i <- 0 until 8) { inter(2 * i) = left(i); inter(2 * i + 1) = right(i) }
    val a = Wav.decodePcm16(Wav.encodePcm16(inter, 8000, channels = 2))
    val l = (0 until 8).map(i => a.samples(2 * i))
    val r = (0 until 8).map(i => a.samples(2 * i + 1))
    assert(l == left.toSeq && r == right.toSeq)
  }

  test("stereo encoder rejects a half-frame (odd interleaved count)") {
    intercept[IllegalArgumentException] {
      Wav.encodePcm16(new Array[Short](7), 8000, channels = 2)
    }
    ()
  }

  test("synthSamples: signed LE int16 from byte pairs") {
    val bytes = Array[Byte](0x34, 0x12, 0xff.toByte, 0xff.toByte, 0x00, 0x80.toByte)
    val s = Wav.synthSamples(bytes, 3)
    assert(s.toSeq == Seq[Short](0x1234, -1, -32768))
  }

  // ------------------------------------------------------------------
  // G.711 companding (q322) — pins the quantizer behaviors the oracle
  // diff can't name: known code points, sign structure, companding
  // fixed point, error bounds, and container-level law enforcement.
  // ------------------------------------------------------------------

  test("mu-law known points: silence is code 0xFF and decodes to 0") {
    assert((Wav.mulawEncode(0) & 0xff) == 0xff)
    assert(Wav.mulawDecode(0xff.toByte) == 0)
    // full-scale positive saturates to code 0x80 (uval 0x7F ^ 0xFF)
    assert((Wav.mulawEncode(32767) & 0xff) == 0x80)
    assert(Wav.mulawDecode(0x80.toByte) == 32124)
  }

  test("A-law known points: zero decodes to +8 (no zero level)") {
    assert(Wav.alawDecode(Wav.alawEncode(0)) == 8)
    assert(Wav.alawDecode(Wav.alawEncode(-1)) == -8)
    // full-scale magnitude hits the top segment's last level
    assert(Wav.alawDecode(Wav.alawEncode(32767)) == 32256)
  }

  test("companding is a fixed point: decode∘encode is idempotent") {
    var s = -32768
    while (s <= 32767) {
      val mu1 = Wav.mulawDecode(Wav.mulawEncode(s.toShort))
      assert(Wav.mulawDecode(Wav.mulawEncode(mu1)) == mu1)
      val al1 = Wav.alawDecode(Wav.alawEncode(s.toShort))
      assert(Wav.alawDecode(Wav.alawEncode(al1)) == al1)
      s += 257 // stride covers all segments incl. both signs
    }
  }

  test("quantization error is segment-bounded over the full domain") {
    var s = -32768
    while (s <= 32767) {
      val mu = Wav.mulawDecode(Wav.mulawEncode(s.toShort)).toInt
      // mu-law: worst case is the clip region (|s| in (32636, 32768])
      assert(math.abs(mu - s) <= 1024,
        s"mu-law error ${math.abs(mu - s)} at $s")
      val al = Wav.alawDecode(Wav.alawEncode(s.toShort)).toInt
      assert(math.abs(al - s) <= 1024,
        s"A-law error ${math.abs(al - s)} at $s")
      s += 1
    }
  }

  test("mu-law decode is odd-symmetric across the code inversion") {
    // code c and c^0x80 decode to negatives of each other
    for (c <- 0 until 256) {
      val pos = Wav.mulawDecode(c.toByte).toInt
      val neg = Wav.mulawDecode((c ^ 0x80).toByte).toInt
      assert(pos == -neg, s"code $c: $pos vs $neg")
    }
  }

  test("G.711 container round-trip carries codes verbatim") {
    val codes = Array.tabulate(33)(i => (i * 7 % 256).toByte) // odd → pad
    for (tag <- Seq(Wav.FormatAlaw, Wav.FormatMulaw)) {
      val a = Wav.decodeG711(Wav.encodeG711(codes, 8000, tag))
      assert(a.sampleRate == 8000 && a.channels == 1)
      val expect =
        if (tag == Wav.FormatMulaw) codes.map(Wav.mulawDecode)
        else codes.map(Wav.alawDecode)
      assert(a.samples.toSeq == expect.toSeq)
    }
  }

  // ------------------------------------------------------------------
  // IMA ADPCM (q325) — the predictive codec's state machine.
  // ------------------------------------------------------------------

  private def adpcmRoundTrip(s: Array[Short]): Array[Short] =
    Wav.decodeImaAdpcm(Wav.encodeImaAdpcm(s, 8000)).samples

  test("ADPCM: header sample is verbatim; constant signal converges") {
    val s = Array.fill(33)(1234.toShort)
    val dec = adpcmRoundTrip(s)
    assert(dec.length == 33 && dec(0) == 1234)
    // residuals are tiny at the smallest step; the tail must hug the
    // constant within the initial step size
    dec.tail.foreach(v => assert(math.abs(v - 1234) <= 8, v.toString))
  }

  test("ADPCM: step adaptation tracks a large jump within a few samples") {
    val s = (Array.fill(1)(0) ++ Array.fill(32)(20000)).map(_.toShort)
    val dec = adpcmRoundTrip(s)
    // the adaptive step must close a 20000 gap well before the end
    assert(math.abs(dec.last - 20000) < 2000, dec.last.toString)
    // and the approach is monotone nondecreasing while far below target
    val approach = dec.toSeq.slice(1, 8)
    assert(approach == approach.sorted, approach.toString)
  }

  test("ADPCM: encoder state equals decoder state (lockstep property)") {
    // encode twice: once via the container, once stepping the state
    // machine manually — the nibble streams must agree, which holds
    // only if the encoder advances with the DECODER's reconstruction
    val s = Array.tabulate(33)(i => ((i * 2731 % 32768) - 16384).toShort)
    var st = Wav.AdpcmState(s(0).toInt, 0)
    val manual = (1 until 33).map { i =>
      val (n, st2) = Wav.adpcmEncodeStep(s(i).toInt, st)
      st = st2; n
    }
    val wav = Wav.encodeImaAdpcm(s, 8000)
    val data = wav.slice(wav.length - 16, wav.length)
    val packed = manual.grouped(2).map(p => p.head | (p(1) << 4)).toSeq
    assert(data.map(_ & 0xff).toSeq == packed)
  }

  test("ADPCM: clamps hold at the domain edges") {
    val s = (Seq(32767) ++ Seq.fill(16)(-32768) ++ Seq.fill(16)(32767))
      .map(_.toShort).toArray
    val dec = adpcmRoundTrip(s)
    dec.foreach(v => assert(v >= -32768 && v <= 32767))
    // step index saturates high then must recover — decode succeeds
    assert(dec.length == 33)
  }

  test("ADPCM: decoder rejects malformed containers") {
    val good = Wav.encodeImaAdpcm(Array.fill(33)(100.toShort), 8000)
    intercept[IllegalArgumentException] { // PCM stream to ADPCM decoder
      Wav.decodeImaAdpcm(Wav.encodePcm16Mono(tone, 8000))
    }
    val badIdx = good.clone()
    // block header step index beyond the table
    val dataOff = good.length - 20
    badIdx(dataOff + 2) = 90.toByte
    intercept[IllegalArgumentException] { Wav.decodeImaAdpcm(badIdx) }
    val badSpb = good.clone()
    badSpb(46) = 7 // samplesPerBlock inconsistent with block align
    intercept[IllegalArgumentException] { Wav.decodeImaAdpcm(badSpb) }
    ()
  }

  test("law enforcement: G.711 decoder rejects PCM and vice versa") {
    val pcm = Wav.encodePcm16Mono(tone, 8000)
    intercept[IllegalArgumentException] { Wav.decodeG711(pcm) }
    val g711 = Wav.encodeG711(Array.tabulate(32)(_.toByte), 8000,
      Wav.FormatMulaw)
    intercept[IllegalArgumentException] { Wav.decodePcm16(g711) }
    ()
  }
}
