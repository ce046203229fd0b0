package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Avi, Jpeg}

/** Pins the AVI (RIFF) MJPEG container codec the same way WavSpec pins
  * the RIFF/WAVE one: byte-exact frame round-trips (the container is
  * lossless framing), header metadata, RIFF padding of odd-sized
  * chunks, unknown-chunk skipping, and the validation failures a real
  * demuxer must raise. The end-to-end demux+decode is oracle-checked
  * as q315.
  */
class AviSpec extends AnyFunSuite {

  private def frame(seed: Int, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 31 + seed * 7 + 3) % 251).toByte)

  test("round-trip: frame bytes, order, dims, and timing survive") {
    val frames = Array(frame(1, 40), frame(2, 55), frame(3, 48))
    val avi = Avi.encodeMjpeg(frames, width = 8, height = 8,
      microSecPerFrame = 100000)
    val v = Avi.decodeMjpeg(avi)
    assert(v.width == 8 && v.height == 8 && v.microSecPerFrame == 100000)
    assert(v.frames.length == 3)
    assert(v.frames.map(_.toSeq).toSeq == frames.map(_.toSeq).toSeq)
  }

  test("odd-sized frames are padded per RIFF but round-trip byte-exact") {
    val frames = Array(frame(4, 33), frame(5, 47)) // both odd
    val v = Avi.decodeMjpeg(Avi.encodeMjpeg(frames, 8, 8, 41667))
    assert(v.frames.map(_.length).toSeq == Seq(33, 47))
    assert(v.frames.map(_.toSeq).toSeq == frames.map(_.toSeq).toSeq)
  }

  test("unknown top-level chunks (JUNK) are skipped by declared size") {
    val base = Avi.encodeMjpeg(Array(frame(6, 20), frame(7, 20)), 8, 8, 1)
    // splice a JUNK chunk right after the RIFF form type and widen the
    // RIFF size — the alignment padding real muxers emit
    val junkBody = Array.tabulate(13)(_.toByte) // odd → exercises padding
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array((junkBody.length & 0xff).toByte,
        ((junkBody.length >> 8) & 0xff).toByte, 0.toByte, 0.toByte) ++
      junkBody ++ Array(0.toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 12)
    out.write(junk, 0, junk.length)
    out.write(base, 12, base.length - 12)
    val spliced = out.toByteArray
    val newLen = spliced.length - 8
    spliced(4) = (newLen & 0xff).toByte
    spliced(5) = ((newLen >> 8) & 0xff).toByte
    spliced(6) = ((newLen >> 16) & 0xff).toByte
    spliced(7) = ((newLen >> 24) & 0xff).toByte
    val v = Avi.decodeMjpeg(spliced)
    assert(v.frames.length == 2 && v.frames(0).length == 20)
  }

  test("non-AVI RIFF (a WAV) and non-RIFF bytes are rejected") {
    intercept[IllegalArgumentException] {
      Avi.decodeMjpeg(graft.ops.Wav.encodePcm16Mono(
        Array.tabulate(32)(_.toShort), 8000))
    }
    intercept[IllegalArgumentException] {
      Avi.decodeMjpeg(Array.tabulate(64)(_.toByte))
    }
    ()
  }

  test("avih frame count is cross-checked against the movi chunks") {
    val avi = Avi.encodeMjpeg(Array(frame(8, 24), frame(9, 24)), 8, 8, 1)
    // avih body starts after RIFF(12) + LIST hdr(12) + 'avih'+size(8);
    // dwTotalFrames is at body offset 16
    val off = 12 + 12 + 8 + 16
    val corrupt = avi.clone()
    corrupt(off) = 3 // declare 3 frames, carry 2
    intercept[IllegalArgumentException] { Avi.decodeMjpeg(corrupt) }
    ()
  }

  test("multi-stream AVIs are rejected (single-stream demuxer)") {
    val avi = Avi.encodeMjpeg(Array(frame(10, 24)), 8, 8, 1)
    val off = 12 + 12 + 8 + 24 // avih dwStreams at body offset 24
    val corrupt = avi.clone()
    corrupt(off) = 2
    intercept[IllegalArgumentException] { Avi.decodeMjpeg(corrupt) }
    ()
  }

  test("a chunk overrunning its parent is rejected, not mis-read") {
    val avi = Avi.encodeMjpeg(Array(frame(11, 24)), 8, 8, 1)
    val truncated = java.util.Arrays.copyOf(avi, avi.length - 6)
    // keep the RIFF size field honest for the shorter buffer
    val newLen = truncated.length - 8
    truncated(4) = (newLen & 0xff).toByte
    truncated(5) = ((newLen >> 8) & 0xff).toByte
    truncated(6) = ((newLen >> 16) & 0xff).toByte
    truncated(7) = ((newLen >> 24) & 0xff).toByte
    intercept[IllegalArgumentException] { Avi.decodeMjpeg(truncated) }
    ()
  }

  test("demux + in-house JPEG decode: sampled frames carry their coefficients") {
    val payload = Array.tabulate(128)(i => ((i * 37 + 5) % 249).toByte)
    val coeffs = Jpeg.synthCoeffs(payload, blocks = 4)
    val frames = coeffs.map(b =>
      Jpeg.encodeGrayFromCoeffs(Array(b), mcusX = 1, mcusY = 1))
    val v = Avi.decodeMjpeg(Avi.encodeMjpeg(frames, 8, 8, 100000))
    // stride-2 sample: frames 0 and 2 decode to exactly their blocks
    for (f <- Seq(0, 2)) {
      val img = Jpeg.decodeGray(v.frames(f))
      assert(img.coeffs(0).toSeq == coeffs(f).toSeq, s"frame $f diverged")
    }
    ()
  }
}
