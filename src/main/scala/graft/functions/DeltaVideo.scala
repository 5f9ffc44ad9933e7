package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Deflater, Inflater}

/** GVD1 — a dependency-free INTER-FRAME video codec: keyframes plus
  * temporal-delta predicted frames, the I/P-frame structure every
  * dedicated video codec (H.264/VP9/AV1) is built around, realized
  * with the primitives this container ships (JDK zlib). This is NOT
  * an H.264 implementation — there is no DCT, no motion search, no
  * entropy-coded bitstream — but it is a real temporal codec: P-frame
  * payloads carry only the wrap-around residual against the previous
  * frame, so smooth motion compresses far below keyframe cost, decode
  * order matters, and random access is only possible at GOP
  * boundaries. Those three properties — not the specific transform —
  * are what a 100 TB video-ingest pipeline has to engineer around
  * (GOP-aligned sharding, keyframe-seek sampling), and they are
  * exactly what the graft query surface exercises end-to-end.
  *
  * Layout (all integers little-endian):
  *   "GVD1" | w:i32 | h:i32 | nFrames:i32 | gop:i32
  *   then per frame: type:u8 ('I'|'P') | len:i32 | zlib payload
  * I payload inflates to the raw w*h luma plane; P inflates to the
  * byte-wise residual (cur − prev mod 256). Lossless by construction
  * — the round-trip is EXACT, unlike the MJPEG path, so recon checks
  * are equality, not tolerance bands.
  */
object DeltaVideo {

  private val Magic = Array[Byte]('G', 'V', 'D', '1')

  final case class Parsed(w: Int, h: Int, gop: Int,
      frameTypes: Seq[Char], frames: Seq[Array[Byte]])

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(comp: Array[Byte], outLen: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(comp)
    val out = new Array[Byte](outLen)
    var off = 0
    while (off < outLen && !inf.finished()) {
      val n = inf.inflate(out, off, outLen - off)
      if (n == 0 && inf.needsInput())
        throw new java.io.IOException("GVD1: truncated zlib payload")
      off += n
    }
    inf.end()
    if (off != outLen)
      throw new java.io.IOException(s"GVD1: payload inflated to $off, want $outLen")
    out
  }

  /** Encode w*h luma planes; a keyframe every `gop` frames. */
  def write(frames: Seq[Array[Byte]], w: Int, h: Int, gop: Int): Array[Byte] = {
    require(gop >= 1 && frames.forall(_.length == w * h),
      s"GVD1: planes must be ${w}x$h and gop >= 1")
    val out = new java.io.ByteArrayOutputStream()
    def i32(v: Int): Unit = out.write(
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array())
    out.write(Magic); i32(w); i32(h); i32(frames.length); i32(gop)
    var prev: Array[Byte] = null
    frames.zipWithIndex.foreach { case (cur, f) =>
      val key = f % gop == 0
      val payload = deflate(
        if (key) cur
        else Array.tabulate(cur.length)(i => (cur(i) - prev(i)).toByte))
      out.write(if (key) 'I' else 'P')
      i32(payload.length)
      out.write(payload)
      prev = cur
    }
    out.toByteArray
  }

  def isGvd(bytes: Array[Byte]): Boolean =
    bytes.length >= 20 && Magic.indices.forall(i => bytes(i) == Magic(i))

  /** Largest luma plane a single record may claim: an untrusted
    * header must not be able to drive a multi-GB allocation (or an
    * Int-overflowing w*h) before the payload walk even starts. 64 MP
    * is far above any plane this pipeline shards.
    */
  private val MaxPlaneBytes = 64L * 1024 * 1024

  /** Header + per-record framing fields come from UNTRUSTED bytes:
    * every field is validated so corrupt/crafted streams fail with
    * the same clean IOException the magic/truncation paths raise,
    * never a NegativeArraySizeException / AIOOBE / giant allocation
    * (r8 advice).
    */
  private def header(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    if (!isGvd(bytes)) throw new java.io.IOException("GVD1: bad magic")
    val bb = ByteBuffer.wrap(bytes, 4, 16).order(ByteOrder.LITTLE_ENDIAN)
    val (w, h, n, gop) = (bb.getInt, bb.getInt, bb.getInt, bb.getInt)
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPlaneBytes)
      throw new java.io.IOException(s"GVD1: bad plane dims ${w}x$h")
    if (n < 0 || gop < 1)
      throw new java.io.IOException(s"GVD1: bad frame count $n / gop $gop")
    (w, h, n, gop)
  }

  /** Validated read of one frame record's (type, len) at `off`;
    * guarantees off+5+len is in bounds and len >= 0.
    */
  private def frameHeader(bytes: Array[Byte], off: Int): (Char, Int) = {
    if (off + 5 > bytes.length)
      throw new java.io.IOException("GVD1: truncated frame header")
    val t = bytes(off).toChar
    if (t != 'I' && t != 'P')
      throw new java.io.IOException(s"GVD1: bad frame type '$t'")
    val len = ByteBuffer.wrap(bytes, off + 1, 4)
      .order(ByteOrder.LITTLE_ENDIAN).getInt
    if (len < 0 || len > bytes.length - off - 5)
      throw new java.io.IOException(s"GVD1: bad frame length $len")
    (t, len)
  }

  /** Full decode: reconstruct every plane through the I/P chain. */
  def read(bytes: Array[Byte]): Parsed = {
    val (w, h, n, gop) = header(bytes)
    val types = Seq.newBuilder[Char]
    val frames = Seq.newBuilder[Array[Byte]]
    var prev: Array[Byte] = null
    var off = 20
    for (f <- 0 until n) {
      val (t, len) = frameHeader(bytes, off)
      val payload = inflate(
        java.util.Arrays.copyOfRange(bytes, off + 5, off + 5 + len), w * h)
      val cur =
        if (t == 'I') payload
        else if (prev == null)
          throw new java.io.IOException(s"GVD1: P-frame $f without reference")
        else Array.tabulate(w * h)(i => (prev(i) + payload(i)).toByte)
      types += t; frames += cur; prev = cur
      off += 5 + len
    }
    Parsed(w, h, gop, types.result(), frames.result())
  }

  /** Random access: decode ONLY the GOP containing `frameIdx` —
    * records before it are SKIPPED by length (never inflated), records
    * after it never read (the method works on a stream truncated right
    * after the target frame, which DeltaVideoSpec proves). This is the
    * keyframe-seek primitive frame-sampling pipelines rely on: cost is
    * O(gop) per sampled frame, not O(position).
    */
  def readGop(bytes: Array[Byte], frameIdx: Int): Array[Byte] = {
    val (w, h, n, gop) = header(bytes)
    require(frameIdx >= 0 && frameIdx < n, s"frame $frameIdx of $n")
    val gopStart = frameIdx - frameIdx % gop
    var off = 20
    var f = 0
    var prev: Array[Byte] = null
    while (f <= frameIdx) {
      val (t, len) = frameHeader(bytes, off)
      if (f >= gopStart) {
        val payload = inflate(
          java.util.Arrays.copyOfRange(bytes, off + 5, off + 5 + len), w * h)
        prev =
          if (t == 'I') payload
          else if (prev == null)
            throw new java.io.IOException(s"GVD1: P-frame $f without reference")
          else Array.tabulate(w * h)(i => (prev(i) + payload(i)).toByte)
      }
      off += 5 + len
      f += 1
    }
    prev
  }
}
