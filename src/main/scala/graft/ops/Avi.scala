package graft.ops

/** Pure-JVM AVI (RIFF) MJPEG container codec — the VIDEO member of the
  * decoder family ([[Png]]/[[Jpeg]]/[[Bmp]]/[[Gif]]/[[Wav]]): upgrades
  * the round-4 frame-sample STAND-IN ([[Multimodal]]'s fixed-stride
  * payload chunking) to a real container parse. AVI is the RIFF form
  * `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
  * 00dc…) idx1)` (Microsoft AVI RIFF spec; RIFF itself is the same
  * chunk grammar [[Wav]] already walks), and MJPEG ('MJPG') stores
  * each frame as a standalone baseline JPEG — which this engine
  * decodes natively, so a sampled frame's pixels stay an exact
  * integer function of the frame bytes (q315).
  *
  * The reader is a genuine chunk walk: fourcc validation, LIST
  * recursion into `hdrl`/`movi`, unknown chunks (idx1, JUNK, vprp,
  * INFO…) skipped by declared size with RIFF odd-byte padding, `avih`
  * cross-checked against the collected `00dc` frames. Frame PIXEL
  * decode is delegated to [[Jpeg.decodeGray]] — container and codec
  * are separate layers exactly as in a production demuxer.
  *
  * Inter-frame codecs (H.264 …) genuinely need codec libs this
  * container doesn't ship — those stay header-only in [[Multimodal]].
  */
object Avi {

  final case class MjpegVideo(width: Int, height: Int,
                              microSecPerFrame: Int,
                              frames: Array[Array[Byte]])

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  private def putLe16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }

  private def putLe32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }

  private def putCc(out: java.io.ByteArrayOutputStream, cc: String): Unit =
    out.write(cc.getBytes("US-ASCII"))

  /** One complete RIFF chunk: fourcc, little-endian size, body, odd pad. */
  private def chunk(cc: String, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    putCc(out, cc); putLe32(out, body.length)
    out.write(body, 0, body.length)
    if ((body.length & 1) == 1) out.write(0) // RIFF pads odd chunks
    out.toByteArray
  }

  /** A LIST chunk: 'LIST' size listType children…. */
  private def list(listType: String, children: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    putCc(out, "LIST"); putLe32(out, 4 + children.length)
    putCc(out, listType)
    out.write(children, 0, children.length)
    out.toByteArray
  }

  /** Encode MJPEG frames as a standard single-stream AVI: real `avih`
    * (frame timing, counts, dimensions), `strh` ('vids'/'MJPG',
    * scale/rate, length), `strf` (BITMAPINFOHEADER, biCompression
    * 'MJPG'), one `00dc` chunk per frame inside LIST `movi`, and a
    * standard `idx1` (one AVIIF_KEYFRAME entry per frame — every
    * MJPEG frame is independently decodable). */
  def encodeMjpeg(frames: Array[Array[Byte]], width: Int, height: Int,
                  microSecPerFrame: Int): Array[Byte] = {
    require(frames.nonEmpty, "empty MJPEG stream")
    val maxFrame = frames.map(_.length).max

    val avih = {
      val out = new java.io.ByteArrayOutputStream()
      putLe32(out, microSecPerFrame)
      putLe32(out, if (microSecPerFrame > 0) // dwMaxBytesPerSec
        (maxFrame.toLong * 1000000L / microSecPerFrame).toInt else 0)
      putLe32(out, 0)               // dwPaddingGranularity
      putLe32(out, 0x10)            // dwFlags: AVIF_HASINDEX
      putLe32(out, frames.length)   // dwTotalFrames
      putLe32(out, 0)               // dwInitialFrames
      putLe32(out, 1)               // dwStreams
      putLe32(out, maxFrame)        // dwSuggestedBufferSize
      putLe32(out, width); putLe32(out, height)
      (0 until 4).foreach(_ => putLe32(out, 0)) // dwReserved
      out.toByteArray
    }

    val strh = {
      val out = new java.io.ByteArrayOutputStream()
      putCc(out, "vids"); putCc(out, "MJPG")
      putLe32(out, 0); putLe16(out, 0); putLe16(out, 0) // flags, prio, lang
      putLe32(out, 0)               // dwInitialFrames
      putLe32(out, microSecPerFrame) // dwScale …
      putLe32(out, 1000000)          // … per dwRate: rate/scale = fps
      putLe32(out, 0)               // dwStart
      putLe32(out, frames.length)   // dwLength (in frames)
      putLe32(out, maxFrame)        // dwSuggestedBufferSize
      putLe32(out, -1)              // dwQuality: default
      putLe32(out, 0)               // dwSampleSize: 0 → one sample/chunk
      putLe16(out, 0); putLe16(out, 0) // rcFrame
      putLe16(out, width); putLe16(out, height)
      out.toByteArray
    }

    val strf = { // BITMAPINFOHEADER
      val out = new java.io.ByteArrayOutputStream()
      putLe32(out, 40)              // biSize
      putLe32(out, width); putLe32(out, height)
      putLe16(out, 1)               // biPlanes
      putLe16(out, 24)              // biBitCount
      putCc(out, "MJPG")            // biCompression
      putLe32(out, width * height * 3) // biSizeImage (uncompressed bound)
      putLe32(out, 0); putLe32(out, 0) // pels/meter
      putLe32(out, 0); putLe32(out, 0) // clrUsed/Important
      out.toByteArray
    }

    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val moviChildren = frames.flatMap(f => chunk("00dc", f))
    val movi = list("movi", moviChildren)

    val idx1 = { // offsets are relative to the 'movi' list-type fourcc
      val out = new java.io.ByteArrayOutputStream()
      var off = 4
      frames.foreach { f =>
        putCc(out, "00dc")
        putLe32(out, 0x10)          // AVIIF_KEYFRAME
        putLe32(out, off)
        putLe32(out, f.length)
        off += 8 + f.length + (f.length & 1)
      }
      out.toByteArray
    }

    val body = hdrl ++ movi ++ chunk("idx1", idx1)
    val out = new java.io.ByteArrayOutputStream()
    putCc(out, "RIFF"); putLe32(out, 4 + body.length); putCc(out, "AVI ")
    out.write(body, 0, body.length)
    out.toByteArray
  }

  /** Demux an MJPEG AVI: RIFF/'AVI ' validation, top-level chunk walk
    * (LIST recursion into `hdrl` for `avih`, into `movi` for the
    * `00dc` frame chunks; everything else — idx1, JUNK, INFO — skipped
    * by size with odd padding), `avih` dimensions/frame-count
    * cross-checked against the collected frames. Returns the frame
    * BYTES; pixel decode is the codec layer's job ([[Jpeg]]). */
  def decodeMjpeg(bytes: Array[Byte]): MjpegVideo = {
    require(bytes.length >= 24, "truncated AVI")
    require(fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "AVI ",
      "not a RIFF/AVI stream")
    val riffEnd = math.min(bytes.length.toLong, 8L + le32(bytes, 4)).toInt
    var width = 0; var height = 0; var uspf = 0; var totalFrames = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val id = fourcc(bytes, pos)
        val len = le32(bytes, pos + 4)
        require(len >= 0 && pos + 8 + len <= to,
          s"chunk '$id' overruns its parent")
        id match {
          case "LIST" =>
            val lt = fourcc(bytes, pos + 8)
            if (lt == "hdrl" || lt == "strl" || lt == "movi")
              walk(pos + 12, pos + 8 + len, inMovi = lt == "movi")
          // else: INFO and friends — skip
          case "avih" =>
            require(len >= 56, "short avih")
            uspf = le32(bytes, pos + 8)
            totalFrames = le32(bytes, pos + 24)
            require(le32(bytes, pos + 32) == 1,
              "single-stream demuxer: dwStreams != 1")
            width = le32(bytes, pos + 40)
            height = le32(bytes, pos + 44)
          case "00dc" if inMovi =>
            frames += java.util.Arrays.copyOfRange(bytes, pos + 8,
              pos + 8 + len)
          case _ => () // strh/strf/idx1/JUNK…: skip by size
        }
        pos += 8 + len + (len & 1)
      }
    }

    walk(12, riffEnd, inMovi = false)
    require(totalFrames >= 0, "missing avih header")
    require(frames.nonEmpty, "no 00dc frames in movi")
    require(frames.length == totalFrames,
      s"avih declares $totalFrames frames, movi carries ${frames.length}")
    MjpegVideo(width, height, uspf, frames.toArray)
  }
}
