package graft.ops

/** Pure-JVM WAV (RIFF/WAVE) PCM codec — the audio analog of [[Png]]
  * and [[Jpeg]]: closes the "audio samples header-only" gap for the
  * UNCOMPRESSED format, which is lossless and therefore fully
  * oracle-checkable. A real decoder: RIFF header validation, a
  * generic chunk WALK (unknown chunks — LIST/fact/cue — are skipped
  * by their declared size, exactly as a production reader must),
  * `fmt ` parsing with PCM/bit-depth enforcement, and little-endian
  * 16-bit sample extraction from `data`. The encoder synthesizes
  * valid mono PCM16 streams so queries/tests can round-trip chosen
  * samples (q274 pattern: samples derive deterministically from
  * payload bytes, the oracle replays them straight from source).
  *
  * Compressed audio (MP3/AAC) remains header-only in [[Multimodal]]
  * — those genuinely need codec libs this container doesn't ship.
  */
object Wav {

  final case class PcmAudio(sampleRate: Int, channels: Int,
                            samples: Array[Short])

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def putLe16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }

  private def putLe32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }

  /** Encode PCM16 samples as a canonical RIFF/WAVE stream. For
    * `channels = 2` the samples are CHANNEL-INTERLEAVED L R L R …
    * frames (the RIFF/WAVE layout) with block align 2·channels. */
  def encodePcm16(samples: Array[Short], sampleRate: Int,
                  channels: Int): Array[Byte] = {
    require(channels == 1 || channels == 2, s"mono/stereo only, got $channels")
    require(samples.length % channels == 0,
      "interleaved sample count must be a whole number of frames")
    val out = new java.io.ByteArrayOutputStream()
    val dataLen = samples.length * 2
    out.write("RIFF".getBytes("US-ASCII"))
    putLe32(out, 36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    putLe32(out, 16)                    // PCM fmt chunk size
    putLe16(out, 1)                     // audio format: PCM
    putLe16(out, channels)
    putLe32(out, sampleRate)
    putLe32(out, sampleRate * 2 * channels) // byte rate
    putLe16(out, 2 * channels)          // block align
    putLe16(out, 16)                    // bits per sample
    out.write("data".getBytes("US-ASCII"))
    putLe32(out, dataLen)
    samples.foreach(s => putLe16(out, s & 0xffff))
    out.toByteArray
  }

  /** Encode mono PCM16 samples as a canonical RIFF/WAVE stream. */
  def encodePcm16Mono(samples: Array[Short], sampleRate: Int): Array[Byte] =
    encodePcm16(samples, sampleRate, channels = 1)

  /** Decode a PCM16 WAV: chunk walk (unknown chunks skipped by size,
    * odd sizes padded per RIFF), `fmt ` validated as PCM/16-bit with
    * byte-rate/block-align consistency, samples from `data`
    * little-endian. Mono or stereo; stereo samples stay
    * channel-interleaved in the returned array (frame i = samples
    * 2i/2i+1), exactly as they sit in the stream. */
  def decodePcm16(bytes: Array[Byte]): PcmAudio = {
    require(bytes.length >= 44, "truncated WAV")
    require(new String(bytes.slice(0, 4), "US-ASCII") == "RIFF" &&
      new String(bytes.slice(8, 12), "US-ASCII") == "WAVE", "not RIFF/WAVE")
    var pos = 12
    var sampleRate = 0; var channels = 0; var bits = 0
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length && (samples == null || sampleRate == 0)) {
      val id = new String(bytes.slice(pos, pos + 4), "US-ASCII")
      val len = le32(bytes, pos + 4)
      require(len >= 0 && pos + 8 + len <= bytes.length,
        s"chunk '$id' overruns the stream")
      id match {
        case "fmt " =>
          val fmt = le16(bytes, pos + 8)
          require(fmt == 1, s"only PCM supported, got format $fmt")
          channels = le16(bytes, pos + 10)
          require(channels == 1 || channels == 2,
            s"mono/stereo decoder, got $channels channels")
          sampleRate = le32(bytes, pos + 12)
          require(le16(bytes, pos + 20) == 2 * channels,
            "block align inconsistent with channel count")
          bits = le16(bytes, pos + 22)
          require(bits == 16, s"16-bit PCM expected, got $bits")
        case "data" =>
          require(len % 2 == 0, "odd PCM16 data length")
          samples = Array.tabulate(len / 2)(i =>
            le16(bytes, pos + 8 + 2 * i).toShort)
        case _ => () // LIST / fact / cue / bext …: skip
      }
      pos += 8 + len + (len & 1) // RIFF pads odd chunks
    }
    require(sampleRate > 0, "missing fmt chunk")
    require(samples != null, "missing data chunk")
    if (channels == 2)
      require(samples.length % 2 == 0, "stereo data must be whole frames")
    PcmAudio(sampleRate, channels, samples)
  }

  /** Deterministic sample synthesis for q274: sample i is the signed
    * little-endian int16 of payload bytes (2i, 2i+1). */
  def synthSamples(bytes: Array[Byte], n: Int): Array[Short] =
    Array.tabulate(n)(i => le16(bytes, 2 * i).toShort)

  // --------------------------------------------------------------------
  // G.711 companding (µ-law / A-law) — the first LOSSY audio member of
  // the decoder family that is still exactly replayable: unlike MP3/AAC
  // (transform codecs needing float DSP), G.711 quantizes each sample
  // INDEPENDENTLY through a pure integer segment/mantissa map, so
  // decode∘encode is a closed-form integer function an external engine
  // can replay per sample. The variant pinned here is the canonical
  // public-domain Sun Microsystems g711.c formulation of ITU-T G.711
  // (BIAS 0x84, µ CLIP 8159 in the 14-bit domain, A-law on the 13-bit
  // domain, transmitted-code inversions included).
  // --------------------------------------------------------------------

  /** WAVE format tag for G.711 A-law (WAVE_FORMAT_ALAW). */
  final val FormatAlaw = 6
  /** WAVE format tag for G.711 µ-law (WAVE_FORMAT_MULAW). */
  final val FormatMulaw = 7

  private final val Bias = 0x84  // 132
  private final val MuClip = 8159 // µ-law clip in the 14-bit domain

  // segment end tables (Sun g711.c): smallest seg with value <= end(seg)
  private final val MuSegEnd =
    Array(0x3f, 0x7f, 0xff, 0x1ff, 0x3ff, 0x7ff, 0xfff, 0x1fff)
  private final val ASegEnd =
    Array(0x1f, 0x3f, 0x7f, 0xff, 0x1ff, 0x3ff, 0x7ff, 0xfff)

  private def segOf(v: Int, ends: Array[Int]): Int = {
    var s = 0
    while (s < 8 && v > ends(s)) s += 1
    s
  }

  /** 16-bit PCM → 8-bit µ-law code (Sun linear2ulaw: >>2 to the
    * 14-bit domain, clip 8159, bias 33, segment/mantissa pack, code
    * inversion — positive mask 0xFF, negative 0x7F). */
  def mulawEncode(s: Short): Byte = {
    val p = s >> 2 // arithmetic shift into the 14-bit domain
    val (mag, mask) = if (p < 0) (-p, 0x7f) else (p, 0xff)
    val v = math.min(mag, MuClip) + (Bias >> 2) // + 33
    val seg = segOf(v, MuSegEnd)
    val uval =
      if (seg >= 8) 0x7f
      else (seg << 4) | ((v >> (seg + 1)) & 0xf)
    ((uval ^ mask) & 0xff).toByte
  }

  /** 8-bit µ-law code → 16-bit PCM (Sun ulaw2linear). */
  def mulawDecode(code: Byte): Short = {
    val u = ~code & 0xff
    var t = ((u & 0xf) << 3) + Bias
    t <<= (u & 0x70) >> 4
    (if ((u & 0x80) != 0) Bias - t else t - Bias).toShort
  }

  /** 16-bit PCM → 8-bit A-law code (Sun linear2alaw: >>3 to the
    * 13-bit domain, negative magnitude −p−1, segment/mantissa pack
    * with the seg<2 half-step, even-bit toggle 0x55 and sign 0x80
    * folded into the masks 0xD5/0x55). */
  def alawEncode(s: Short): Byte = {
    val p = s >> 3 // arithmetic shift into the 13-bit domain
    val (mag, mask) = if (p >= 0) (p, 0xd5) else (-p - 1, 0x55)
    val seg = segOf(mag, ASegEnd)
    val aval =
      if (seg >= 8) 0x7f
      else (seg << 4) | ((mag >> (if (seg < 2) 1 else seg)) & 0xf)
    ((aval ^ mask) & 0xff).toByte
  }

  /** 8-bit A-law code → 16-bit PCM (Sun alaw2linear). */
  def alawDecode(code: Byte): Short = {
    val a = (code ^ 0x55) & 0xff
    var t = (a & 0xf) << 4
    val seg = (a & 0x70) >> 4
    if (seg == 0) t += 8
    else if (seg == 1) t += 0x108
    else { t += 0x108; t <<= seg - 1 }
    (if ((a & 0x80) != 0) t else -t).toShort
  }

  // --------------------------------------------------------------------
  // IMA ADPCM (DVI4) — the PREDICTIVE member of the audio family:
  // unlike PCM (verbatim) and G.711 (per-sample stateless companding),
  // ADPCM carries a STATE MACHINE across samples — a 16-bit predictor
  // plus an adaptive step-size index, with each 4-bit nibble coding the
  // prediction residual at the current step. The algorithm is the
  // public IMA Digital Audio Focus Group specification (the WAV format
  // tag 0x0011 codec; also RTP DVI4, RFC 3551 §4.5.1): 89-entry step
  // table, 16-entry index-adaptation table, and the shift-add residual
  // reconstruction. All-integer and encoder-embeds-decoder, so
  // decode∘encode is exactly replayable as a sequential recurrence.
  // --------------------------------------------------------------------

  /** WAVE format tag for IMA ADPCM (WAVE_FORMAT_IMA_ADPCM). */
  final val FormatImaAdpcm = 0x11

  private final val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Index adaptation depends only on the nibble's magnitude bits. */
  private def indexDelta(nibble: Int): Int = (nibble & 7) match {
    case 4 => 2
    case 5 => 4
    case 6 => 6
    case 7 => 8
    case _ => -1
  }

  private def clampSample(v: Int): Int =
    math.max(-32768, math.min(32767, v))
  private def clampIndex(v: Int): Int = math.max(0, math.min(88, v))

  /** ADPCM codec state: `pred` is the reconstructed previous sample. */
  final case class AdpcmState(pred: Int, index: Int)

  /** Encode one sample against the state: choose the nibble by the
    * standard successive-comparison quantizer, then run the DECODER's
    * reconstruction to advance the state (the encoder embeds the
    * decoder, which is what keeps encoder and decoder predictors in
    * lockstep). Returns (nibble, nextState). */
  def adpcmEncodeStep(s: Int, st: AdpcmState): (Int, AdpcmState) = {
    val step = StepTable(st.index)
    val delta = s - st.pred
    val sign = if (delta < 0) 8 else 0
    var d = math.abs(delta)
    var n = sign
    if (d >= step) { n |= 4; d -= step }
    if (d >= (step >> 1)) { n |= 2; d -= step >> 1 }
    if (d >= (step >> 2)) n |= 1
    (n, adpcmDecodeStep(n, st)._2)
  }

  /** Decode one nibble against the state: shift-add residual
    * reconstruction diff = step/8 + b0·step/4 + b1·step/2 + b2·step,
    * sign from bit 3, sample clamp, index adaptation. Returns
    * (decodedSample, nextState). */
  def adpcmDecodeStep(nibble: Int, st: AdpcmState): (Int, AdpcmState) = {
    val step = StepTable(st.index)
    var diff = step >> 3
    if ((nibble & 1) != 0) diff += step >> 2
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 4) != 0) diff += step
    val pred = clampSample(
      if ((nibble & 8) != 0) st.pred - diff else st.pred + diff)
    (pred, AdpcmState(pred, clampIndex(st.index + indexDelta(nibble))))
  }

  /** Encode mono PCM16 samples as a single-block IMA ADPCM RIFF/WAVE
    * stream: the standard 4-byte block header (predictor = sample 0
    * verbatim, initial step index, reserved byte) followed by nibbles
    * for samples 1..n−1, two per byte LOW NIBBLE FIRST. The fmt chunk
    * carries the tag-0x11 extension (cbSize 2, samplesPerBlock). */
  def encodeImaAdpcm(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    require(samples.length >= 1, "need at least the header sample")
    require(samples.length % 2 == 1,
      "samples after the header sample must pair into whole nibble bytes")
    val nNib = samples.length - 1
    val blockAlign = 4 + nNib / 2
    val out = new java.io.ByteArrayOutputStream()
    val dataLen = blockAlign
    out.write("RIFF".getBytes("US-ASCII"))
    putLe32(out, 40 + dataLen + (dataLen & 1))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    putLe32(out, 20)                    // 16 + cbSize(2) + extra(2)
    putLe16(out, FormatImaAdpcm)
    putLe16(out, 1)                     // mono
    putLe32(out, sampleRate)
    // byte rate for one block per samplesPerBlock samples
    putLe32(out, sampleRate * blockAlign / samples.length)
    putLe16(out, blockAlign)
    putLe16(out, 4)                     // bits per (coded) sample
    putLe16(out, 2)                     // cbSize
    putLe16(out, samples.length)        // samplesPerBlock
    out.write("data".getBytes("US-ASCII"))
    putLe32(out, dataLen)
    // block header: predictor = sample 0 verbatim, step index 0
    putLe16(out, samples(0) & 0xffff)
    out.write(0)                        // initial step index
    out.write(0)                        // reserved
    var st = AdpcmState(samples(0).toInt, 0)
    var i = 1
    while (i < samples.length) {
      val (lo, st1) = adpcmEncodeStep(samples(i).toInt, st)
      val (hi, st2) = adpcmEncodeStep(samples(i + 1).toInt, st1)
      out.write(lo | (hi << 4))
      st = st2
      i += 2
    }
    if ((dataLen & 1) == 1) out.write(0)
    out.toByteArray
  }

  /** Decode a single-block IMA ADPCM WAV produced by
    * [[encodeImaAdpcm]]-shaped encoders: chunk walk, tag-0x11 fmt
    * validation (4-bit, extension present, block align vs
    * samplesPerBlock cross-check), block-header state seed, then the
    * nibble state machine — sample 0 is the header predictor
    * verbatim, each subsequent sample the reconstruction of one
    * nibble (low nibble of each byte first). */
  def decodeImaAdpcm(bytes: Array[Byte]): PcmAudio = {
    require(bytes.length >= 48, "truncated WAV")
    require(new String(bytes.slice(0, 4), "US-ASCII") == "RIFF" &&
      new String(bytes.slice(8, 12), "US-ASCII") == "WAVE", "not RIFF/WAVE")
    var pos = 12
    var sampleRate = 0; var blockAlign = 0; var samplesPerBlock = 0
    var data: Array[Byte] = null
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes.slice(pos, pos + 4), "US-ASCII")
      val len = le32(bytes, pos + 4)
      require(len >= 0 && pos + 8 + len <= bytes.length,
        s"chunk '$id' overruns the stream")
      id match {
        case "fmt " =>
          require(le16(bytes, pos + 8) == FormatImaAdpcm,
            s"IMA ADPCM decoder: format tag must be 0x11")
          require(le16(bytes, pos + 10) == 1, "ADPCM decoder is mono")
          sampleRate = le32(bytes, pos + 12)
          blockAlign = le16(bytes, pos + 20)
          require(le16(bytes, pos + 22) == 4, "IMA ADPCM codes 4 bits")
          require(len >= 20, "tag-0x11 fmt requires the extension")
          require(le16(bytes, pos + 24) == 2, "cbSize must be 2")
          samplesPerBlock = le16(bytes, pos + 26)
          require(samplesPerBlock == 1 + (blockAlign - 4) * 2,
            "samplesPerBlock inconsistent with block align")
        case "data" =>
          data = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
        case _ => ()
      }
      pos += 8 + len + (len & 1)
    }
    require(sampleRate > 0, "missing fmt chunk")
    require(data != null, "missing data chunk")
    require(data.length == blockAlign, "single-block decoder scope")
    val pred0 = le16(data, 0).toShort.toInt
    val idx0 = data(2) & 0xff
    require(idx0 <= 88, s"step index $idx0 out of table range")
    require(data(3) == 0, "reserved header byte must be zero")
    val samples = new Array[Short](samplesPerBlock)
    samples(0) = pred0.toShort
    var st = AdpcmState(pred0, idx0)
    var si = 1
    var bi = 4
    while (si < samplesPerBlock) {
      val b = data(bi) & 0xff
      val (s1, st1) = adpcmDecodeStep(b & 0xf, st)
      samples(si) = s1.toShort
      val (s2, st2) = adpcmDecodeStep((b >> 4) & 0xf, st1)
      samples(si + 1) = s2.toShort
      st = st2
      si += 2
      bi += 1
    }
    PcmAudio(sampleRate, 1, samples)
  }

  /** Encode 8-bit G.711 codes as a canonical RIFF/WAVE stream with
    * format tag [[FormatMulaw]] or [[FormatAlaw]] (bits 8, block
    * align = channels, byte rate = rate·channels). */
  def encodeG711(codes: Array[Byte], sampleRate: Int,
                 formatTag: Int): Array[Byte] = {
    require(formatTag == FormatAlaw || formatTag == FormatMulaw,
      s"G.711 format tag must be 6 (A-law) or 7 (mu-law), got $formatTag")
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    putLe32(out, 36 + codes.length + (codes.length & 1))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    putLe32(out, 16)
    putLe16(out, formatTag)
    putLe16(out, 1)                     // mono
    putLe32(out, sampleRate)
    putLe32(out, sampleRate)            // byte rate: 1 byte/sample
    putLe16(out, 1)                     // block align
    putLe16(out, 8)                     // bits per sample
    out.write("data".getBytes("US-ASCII"))
    putLe32(out, codes.length)
    out.write(codes)
    if ((codes.length & 1) == 1) out.write(0) // RIFF pads odd chunks
    out.toByteArray
  }

  /** Decode a G.711 WAV: same chunk walk as [[decodePcm16]], but the
    * `fmt ` chunk must carry tag 6/7 with 8-bit samples, and each
    * `data` byte EXPANDS through the matching law's decode map into a
    * 16-bit PCM sample. Rejects PCM streams — the caller chose a
    * companded decode, silently passing raw PCM16 through a law table
    * would decode garbage. */
  def decodeG711(bytes: Array[Byte]): PcmAudio = {
    require(bytes.length >= 44, "truncated WAV")
    require(new String(bytes.slice(0, 4), "US-ASCII") == "RIFF" &&
      new String(bytes.slice(8, 12), "US-ASCII") == "WAVE", "not RIFF/WAVE")
    var pos = 12
    var sampleRate = 0; var formatTag = -1
    var samples: Array[Short] = null
    var data: Array[Byte] = null
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes.slice(pos, pos + 4), "US-ASCII")
      val len = le32(bytes, pos + 4)
      require(len >= 0 && pos + 8 + len <= bytes.length,
        s"chunk '$id' overruns the stream")
      id match {
        case "fmt " =>
          formatTag = le16(bytes, pos + 8)
          require(formatTag == FormatAlaw || formatTag == FormatMulaw,
            s"G.711 decoder: format tag must be 6/7, got $formatTag")
          require(le16(bytes, pos + 10) == 1, "G.711 decoder is mono")
          sampleRate = le32(bytes, pos + 12)
          require(le16(bytes, pos + 20) == 1,
            "block align must be 1 for 8-bit mono G.711")
          require(le16(bytes, pos + 22) == 8,
            "G.711 carries 8-bit codes")
        case "data" =>
          data = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
        case _ => () // LIST / fact / cue …: skip
      }
      pos += 8 + len + (len & 1)
    }
    require(sampleRate > 0, "missing fmt chunk")
    require(data != null, "missing data chunk")
    samples =
      if (formatTag == FormatMulaw) data.map(mulawDecode)
      else data.map(alawDecode)
    PcmAudio(sampleRate, 1, samples)
  }
}
