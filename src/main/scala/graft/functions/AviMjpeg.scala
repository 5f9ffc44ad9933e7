package graft.functions

import java.io.ByteArrayOutputStream

/** Minimal Motion-JPEG AVI container writer + parser (RIFF/AVI is a
  * published Microsoft format; MJPEG is the frame-per-JPEG video
  * codec every webcam and many capture pipelines emit). Dependency
  * free: the container is plain little-endian RIFF chunk framing, and
  * the frames are JPEGs the JDK's own `javax.imageio` codec encodes
  * and decodes — together they make a REAL video decode path
  * (container parse + per-frame codec) with no native libraries.
  *
  * The writer emits the canonical minimal structure:
  *   RIFF('AVI ')
  *     LIST('hdrl') avih LIST('strl') strh strf
  *     LIST('movi') '00dc' <jpeg> ... (even-padded)
  *     'idx1'
  * The parser walks chunk framing only (never assumes offsets), which
  * is what makes the round-trip a container TEST: a framing bug
  * misplaces every subsequent chunk and the frame count collapses.
  */
object AviMjpeg {

  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Wrap pre-encoded JPEG frames into an MJPEG AVI. */
  def write(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty, "AVI needs at least one frame")
    val maxFrame = frames.map(_.length).max

    def chunk(cc: String, body: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(fourcc(cc)); out.write(le32(body.length)); out.write(body)
      if (body.length % 2 == 1) out.write(0) // RIFF even padding
      out.toByteArray
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(fourcc("LIST")); out.write(le32(body.length + 4))
      out.write(fourcc(listType)); out.write(body)
      out.toByteArray
    }

    // avih: MainAVIHeader (14 DWORDs)
    val avih = {
      val o = new ByteArrayOutputStream()
      o.write(le32(1000000 / fps)) // dwMicroSecPerFrame
      o.write(le32(maxFrame * fps)) // dwMaxBytesPerSec
      o.write(le32(0)) // padding granularity
      o.write(le32(0x10)) // AVIF_HASINDEX
      o.write(le32(frames.length))
      o.write(le32(0)) // initial frames
      o.write(le32(1)) // streams
      o.write(le32(maxFrame)) // suggested buffer
      o.write(le32(width)); o.write(le32(height))
      (0 until 4).foreach(_ => o.write(le32(0)))
      o.toByteArray
    }
    // strh: AVIStreamHeader
    val strh = {
      val o = new ByteArrayOutputStream()
      o.write(fourcc("vids")); o.write(fourcc("MJPG"))
      o.write(le32(0)); o.write(le16(0)); o.write(le16(0)) // flags, prio, lang
      o.write(le32(0)) // initial frames
      o.write(le32(1)); o.write(le32(fps)) // scale, rate
      o.write(le32(0)); o.write(le32(frames.length)) // start, length
      o.write(le32(maxFrame)); o.write(le32(-1)) // bufsize, quality
      o.write(le32(0)) // sample size
      o.write(le16(0)); o.write(le16(0)); o.write(le16(width)); o.write(le16(height))
      o.toByteArray
    }
    // strf: BITMAPINFOHEADER with MJPG compression
    val strf = {
      val o = new ByteArrayOutputStream()
      o.write(le32(40)); o.write(le32(width)); o.write(le32(height))
      o.write(le16(1)); o.write(le16(24))
      o.write(fourcc("MJPG"))
      o.write(le32(width * height * 3))
      o.write(le32(0)); o.write(le32(0)); o.write(le32(0)); o.write(le32(0))
      o.toByteArray
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val moviBody = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    frames.foreach { f =>
      offsets += ((moviBody.size() + 4, f.length)) // offset AFTER 'movi' tag
      moviBody.write(chunk("00dc", f))
    }
    val movi = list("movi", moviBody.toByteArray)
    val idx1 = {
      val o = new ByteArrayOutputStream()
      offsets.foreach { case (off, len) =>
        o.write(fourcc("00dc")); o.write(le32(0x10)) // AVIIF_KEYFRAME
        o.write(le32(off)); o.write(le32(len))
      }
      chunk("idx1", o.toByteArray)
    }
    val riffBody = fourcc("AVI ") ++ hdrl ++ movi ++ idx1
    val out = new ByteArrayOutputStream()
    out.write(fourcc("RIFF")); out.write(le32(riffBody.length)); out.write(riffBody)
    out.toByteArray
  }

  private def readLe32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)

  private def cc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "US-ASCII")

  /** Container validity: RIFF framing with the AVI form type. */
  def isAvi(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && cc(bytes, 0) == "RIFF" && cc(bytes, 8) == "AVI "

  /** Extract the video frames ('00dc' chunks) by WALKING the chunk
    * framing — top-level chunks until the 'movi' LIST, then its
    * subchunks. Throws on malformed framing rather than guessing.
    */
  def readFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    require(isAvi(bytes), "not a RIFF/AVI stream")
    val end = math.min(bytes.length, 8 + readLe32(bytes, 4))
    var p = 12
    var movi: Option[(Int, Int)] = None // (bodyStart, bodyEnd) after type
    while (p + 8 <= end && movi.isEmpty) {
      val tag = cc(bytes, p)
      val size = readLe32(bytes, p + 4)
      if (tag == "LIST" && p + 12 <= end && cc(bytes, p + 8) == "movi")
        movi = Some((p + 12, p + 8 + size))
      p += 8 + size + (size % 2)
    }
    val (s, e) = movi.getOrElse(
      throw new IllegalArgumentException("AVI has no movi list"))
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var q = s
    while (q + 8 <= e) {
      val tag = cc(bytes, q)
      val size = readLe32(bytes, q + 4)
      if (tag.endsWith("dc") || tag.endsWith("db"))
        frames += java.util.Arrays.copyOfRange(bytes, q + 8, q + 8 + size)
      q += 8 + size + (size % 2)
    }
    frames.toSeq
  }
}
