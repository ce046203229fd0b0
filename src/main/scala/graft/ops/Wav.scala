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
}
