package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Deflater, Inflater}

/** GVD1 — a dependency-free INTER-FRAME video codec: keyframes plus
  * temporally-predicted frames, the I/P-frame structure every
  * dedicated video codec (H.264/VP9/AV1) is built around, realized
  * with the primitives this container ships (JDK zlib). Prediction
  * comes in two forms: plain temporal deltas ('P') and — since r9 —
  * real MOTION-COMPENSATED blocks ('M': exhaustive ±4 px block match
  * per 8×8 block, one vector byte per block + residual), so
  * translating content compresses to near-nothing where a plain
  * delta would carry the whole texture difference. This is still NOT
  * an H.264 implementation — no DCT, no sub-pel interpolation, no
  * entropy-coded bitstream — but keyframe cadence, decode-order
  * dependency, GOP-bounded random access, AND block motion search +
  * residual coding are all real. Those properties — not the specific
  * transform — are what a 100 TB video-ingest pipeline has to
  * engineer around (GOP-aligned sharding, keyframe-seek sampling),
  * and they are exactly what the graft query surface exercises
  * end-to-end.
  *
  * Layout (all integers little-endian):
  *   "GVD1" | w:i32 | h:i32 | nFrames:i32 | gop:i32
  *   then per frame: type:u8 ('I'|'P'|'M') | len:i32 | zlib payload
  * I payload inflates to the raw w*h luma plane; P inflates to the
  * byte-wise residual (cur − prev mod 256); M inflates to one vector
  * byte per block followed by the residual against the
  * motion-predicted plane. Lossless by construction in ALL frame
  * types (residual coding absorbs whatever the search picks) — the
  * round-trip is EXACT, unlike the MJPEG path, so recon checks are
  * equality, not tolerance bands.
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

  // ---- motion compensation (frame type 'M', r9) ----------------------
  // Real block-matched inter prediction: the plane splits into
  // BlockSize² blocks; each block exhaustively searches a ±SearchR
  // window in the PREVIOUS frame for the minimum-SAD reference
  // (deterministic: row-major candidate scan, strict < to replace, so
  // the first minimum wins), and the payload carries one vector byte
  // per block ((dy+R)·(2R+1)+(dx+R) ∈ [0, 80]) followed by the
  // byte-wise residual against the motion-predicted plane. Residual
  // coding keeps the codec LOSSLESS whatever the search picks — the
  // vectors only decide how small the residual deflates. Reference
  // sampling is BORDER-EXTENDED (coordinates clamp to the plane, the
  // published unrestricted-motion-vector treatment, H.263 Annex
  // D / H.264 UMV): without it, edge blocks have no legal vector equal
  // to the true motion and a simple pan leaves a third of the plane as
  // raw residual — measured 6.7 KB vs 9.8 KB plain-P on a 40×24 pan;
  // clamped, the same stream is ~1/3 of plain-P.
  private val BlockSize = 8
  private val SearchR = 4

  private def blocksAcross(dim: Int): Int = (dim + BlockSize - 1) / BlockSize

  /** Border-extended reference sample. */
  @inline private def refAt(prev: Array[Byte], w: Int, h: Int,
      x: Int, y: Int): Int = {
    val cx = if (x < 0) 0 else if (x >= w) w - 1 else x
    val cy = if (y < 0) 0 else if (y >= h) h - 1 else y
    prev(cy * w + cx) & 0xff
  }

  /** Motion-search `cur` against `prev`: returns (vectorBytes, residual). */
  private def motionEncode(cur: Array[Byte], prev: Array[Byte],
      w: Int, h: Int): (Array[Byte], Array[Byte]) = {
    val nbx = blocksAcross(w); val nby = blocksAcross(h)
    val vecs = new Array[Byte](nbx * nby)
    val resid = new Array[Byte](w * h)
    var by = 0
    while (by < nby) {
      var bx = 0
      while (bx < nbx) {
        val x0 = bx * BlockSize; val y0 = by * BlockSize
        val bw = math.min(BlockSize, w - x0)
        val bh = math.min(BlockSize, h - y0)
        var bestSad = Int.MaxValue; var bestDx = 0; var bestDy = 0
        var dy = -SearchR
        while (dy <= SearchR) {
          var dx = -SearchR
          while (dx <= SearchR) {
            var sad = 0; var yy = 0
            while (yy < bh && sad < bestSad) {
              var xx = 0
              val rowC = (y0 + yy) * w + x0
              while (xx < bw) {
                sad += math.abs((cur(rowC + xx) & 0xff) -
                  refAt(prev, w, h, x0 + dx + xx, y0 + dy + yy))
                xx += 1
              }
              yy += 1
            }
            if (sad < bestSad) { bestSad = sad; bestDx = dx; bestDy = dy }
            dx += 1
          }
          dy += 1
        }
        vecs(by * nbx + bx) =
          ((bestDy + SearchR) * (2 * SearchR + 1) + (bestDx + SearchR)).toByte
        var yy = 0
        while (yy < bh) {
          var xx = 0
          val rowC = (y0 + yy) * w + x0
          while (xx < bw) {
            resid(rowC + xx) = (cur(rowC + xx) -
              refAt(prev, w, h, x0 + bestDx + xx, y0 + bestDy + yy)).toByte
            xx += 1
          }
          yy += 1
        }
        bx += 1
      }
      by += 1
    }
    (vecs, resid)
  }

  /** Reconstruct an 'M' frame from its reference + (vectors ++ residual). */
  private def motionDecode(payload: Array[Byte], prev: Array[Byte],
      w: Int, h: Int): Array[Byte] = {
    val nbx = blocksAcross(w); val nby = blocksAcross(h)
    val nVec = (2 * SearchR + 1) * (2 * SearchR + 1)
    val cur = new Array[Byte](w * h)
    var by = 0
    while (by < nby) {
      var bx = 0
      while (bx < nbx) {
        val v = payload(by * nbx + bx) & 0xff
        if (v >= nVec)
          throw new java.io.IOException(
            s"GVD1: bad motion vector byte $v at block ($bx,$by)")
        val dy = v / (2 * SearchR + 1) - SearchR
        val dx = v % (2 * SearchR + 1) - SearchR
        val x0 = bx * BlockSize; val y0 = by * BlockSize
        val bw = math.min(BlockSize, w - x0)
        val bh = math.min(BlockSize, h - y0)
        var yy = 0
        while (yy < bh) {
          var xx = 0
          val rowC = (y0 + yy) * w + x0
          while (xx < bw) {
            cur(rowC + xx) =
              (refAt(prev, w, h, x0 + dx + xx, y0 + dy + yy) +
                payload(nbx * nby + rowC + xx)).toByte
            xx += 1
          }
          yy += 1
        }
        bx += 1
      }
      by += 1
    }
    cur
  }

  /** Encode w*h luma planes; a keyframe every `gop` frames. Predicted
    * frames are plain temporal deltas ('P') by default; `motion = true`
    * block-matches each predicted frame against its reference and
    * writes motion vectors + residual ('M') — smooth TRANSLATION then
    * compresses to near-nothing where a plain delta would carry the
    * whole texture difference. Both forms are lossless.
    */
  def write(frames: Seq[Array[Byte]], w: Int, h: Int, gop: Int,
      motion: Boolean = false): Array[Byte] = {
    require(gop >= 1 && frames.forall(_.length == w * h),
      s"GVD1: planes must be ${w}x$h and gop >= 1")
    val out = new java.io.ByteArrayOutputStream()
    def i32(v: Int): Unit = out.write(
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array())
    out.write(Magic); i32(w); i32(h); i32(frames.length); i32(gop)
    var prev: Array[Byte] = null
    frames.zipWithIndex.foreach { case (cur, f) =>
      val key = f % gop == 0
      val (t, raw) =
        if (key) ('I', cur)
        else if (motion) {
          val (vecs, resid) = motionEncode(cur, prev, w, h)
          ('M', vecs ++ resid)
        } else
          ('P', Array.tabulate(cur.length)(i => (cur(i) - prev(i)).toByte))
      val payload = deflate(raw)
      out.write(t)
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
    if (t != 'I' && t != 'P' && t != 'M')
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
      val outLen =
        if (t == 'M') blocksAcross(w) * blocksAcross(h) + w * h else w * h
      val payload = inflate(
        java.util.Arrays.copyOfRange(bytes, off + 5, off + 5 + len), outLen)
      val cur =
        if (t == 'I') payload
        else if (prev == null)
          throw new java.io.IOException(s"GVD1: $t-frame $f without reference")
        else if (t == 'M') motionDecode(payload, prev, w, h)
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
        val outLen =
          if (t == 'M') blocksAcross(w) * blocksAcross(h) + w * h else w * h
        val payload = inflate(
          java.util.Arrays.copyOfRange(bytes, off + 5, off + 5 + len), outLen)
        prev =
          if (t == 'I') payload
          else if (prev == null)
            throw new java.io.IOException(s"GVD1: $t-frame $f without reference")
          else if (t == 'M') motionDecode(payload, prev, w, h)
          else Array.tabulate(w * h)(i => (prev(i) + payload(i)).toByte)
      }
      off += 5 + len
      f += 1
    }
    prev
  }
}
