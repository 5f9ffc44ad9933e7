package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.DeltaVideo

/** GVD1 inter-frame codec: exact round-trip, GOP/keyframe structure,
  * corruption fatality, temporal-gain economics, and the property that
  * makes keyframe seek REAL — decoding a middle frame must not touch
  * bytes past its GOP (proved on a truncated stream).
  */
class DeltaVideoSpec extends AnyFunSuite {

  private def smooth(n: Int, w: Int, h: Int): Seq[Array[Byte]] =
    (0 until n).map { f =>
      Array.tabulate(w * h)(i => ((i % w) * 2 + (i / w) * 2 + f * 5 + 28).toByte)
    }

  test("lossless round-trip through the I/P chain, any gop") {
    for (gop <- Seq(1, 3, 4, 7)) {
      val frames = smooth(9, 20, 12)
      val p = DeltaVideo.read(DeltaVideo.write(frames, 20, 12, gop))
      assert(p.w == 20 && p.h == 12 && p.frames.size == 9 && p.gop == gop)
      p.frames.zip(frames).foreach { case (got, want) =>
        assert(java.util.Arrays.equals(got, want))
      }
      assert(p.frameTypes.zipWithIndex.forall { case (t, f) =>
        t == (if (f % gop == 0) 'I' else 'P') })
    }
  }

  test("random noise frames round-trip too (wrap-around residuals)") {
    val rng = new scala.util.Random(7)
    val frames = (0 until 5).map(_ =>
      Array.fill(16 * 16)(rng.nextInt(256).toByte).asInstanceOf[Array[Byte]])
    val p = DeltaVideo.read(DeltaVideo.write(frames, 16, 16, 2))
    p.frames.zip(frames).foreach { case (g, w) =>
      assert(java.util.Arrays.equals(g, w))
    }
  }

  test("temporal gain: P-frames beat all-I on smooth motion, not on noise") {
    val sm = smooth(12, 24, 16)
    assert(DeltaVideo.write(sm, 24, 16, 4).length
      < DeltaVideo.write(sm, 24, 16, 1).length)
    val rng = new scala.util.Random(3)
    val noise = (0 until 12).map(_ => Array.fill(24 * 16)(rng.nextInt(256).toByte))
    val gvdN = DeltaVideo.write(noise, 24, 16, 4).length
    val allIN = DeltaVideo.write(noise, 24, 16, 1).length
    // independent noise has no temporal redundancy to exploit
    assert(math.abs(gvdN - allIN) < allIN / 10)
  }

  test("corrupted magic and truncated payload are fatal, not garbage") {
    val gvd = DeltaVideo.write(smooth(6, 16, 16), 16, 16, 4)
    val bad = gvd.clone(); bad(0) = 'X'
    intercept[java.io.IOException](DeltaVideo.read(bad))
    intercept[Exception](
      DeltaVideo.read(java.util.Arrays.copyOf(gvd, gvd.length - 3)))
  }

  /** Deterministic pseudo-random texture over an infinite plane —
    * incompressible locally, so a PLAIN temporal delta of a
    * translating view is itself pseudo-random (deflate can't touch
    * it), while a motion-compensated block match recovers the shift
    * and leaves a near-zero residual.
    */
  private def tex(x: Int, y: Int): Byte = {
    // real avalanche mixing: a merely-linear function of (x, y) has
    // near-constant shifted differences, which deflate flattens and
    // the "plain P gains nothing" premise breaks
    var m = x * 0x9E3779B9 ^ y * 0x85EBCA6B
    m ^= m >>> 13; m *= 0xC2B2AE35; m ^= m >>> 16
    ((m & 0x7fffffff) % 200 + 28).toByte
  }

  /** n frames of a (2,1)-per-frame scrolling window over the texture. */
  private def scrolled(n: Int, w: Int, h: Int): Seq[Array[Byte]] =
    (0 until n).map { f =>
      Array.tabulate(w * h)(i => tex(i % w + 2 * f, i / w + f))
    }

  test("motion frames ('M'): lossless round-trip, typed as M, seekable") {
    val frames = scrolled(10, 40, 24)
    val gvd = DeltaVideo.write(frames, 40, 24, 4, motion = true)
    val p = DeltaVideo.read(gvd)
    assert(p.frameTypes.zipWithIndex.forall { case (t, f) =>
      t == (if (f % 4 == 0) 'I' else 'M') })
    p.frames.zip(frames).foreach { case (g, want) =>
      assert(java.util.Arrays.equals(g, want))
    }
    for (target <- Seq(0, 2, 5, 9))
      assert(java.util.Arrays.equals(
        DeltaVideo.readGop(gvd, target), frames(target)))
  }

  test("motion compensation WINS on translating texture where plain P cannot") {
    val frames = scrolled(10, 40, 24)
    val mc = DeltaVideo.write(frames, 40, 24, 4, motion = true).length
    val plainP = DeltaVideo.write(frames, 40, 24, 4).length
    val allI = DeltaVideo.write(frames, 40, 24, 1).length
    // plain deltas of scrolling NOISE are themselves noise — no gain
    assert(plainP > allI * 8 / 10, s"plainP=$plainP allI=$allI")
    // block match recovers the (2,1) shift: vectors + ~zero residual
    assert(mc < plainP / 2, s"mc=$mc plainP=$plainP")
    // and on noise with NO temporal structure, M still round-trips
    // (residual absorbs everything) — lossless whatever the search picks
    val rng = new scala.util.Random(11)
    val noise = (0 until 6).map(_ => Array.fill(24 * 16)(rng.nextInt(256).toByte))
    val p = DeltaVideo.read(DeltaVideo.write(noise, 24, 16, 3, motion = true))
    p.frames.zip(noise).foreach { case (g, w) =>
      assert(java.util.Arrays.equals(g, w)) }
  }

  test("motion frames on non-block-aligned planes (edge blocks clipped)") {
    // 21x13: ragged right and bottom block edges
    val frames = (0 until 7).map { f =>
      Array.tabulate(21 * 13)(i => tex(i % 21 + 2 * f, i / 21 + f))
    }
    val p = DeltaVideo.read(DeltaVideo.write(frames, 21, 13, 3, motion = true))
    p.frames.zip(frames).foreach { case (g, w) =>
      assert(java.util.Arrays.equals(g, w)) }
  }

  test("crafted headers fail clean: every framing field is validated (r8 advice)") {
    val gvd = DeltaVideo.write(smooth(6, 16, 16), 16, 16, 4)
    def patched(off: Int, v: Int): Array[Byte] = {
      val b = gvd.clone()
      java.nio.ByteBuffer.wrap(b, off, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v)
      b
    }
    // negative / zero / Int-overflowing w*h must be IOException, not a
    // NegativeArraySizeException or a multi-GB allocation attempt
    intercept[java.io.IOException](DeltaVideo.read(patched(4, -16)))
    intercept[java.io.IOException](DeltaVideo.read(patched(8, 0)))
    intercept[java.io.IOException](DeltaVideo.read(patched(4, 1 << 30))) // w*h overflows Int
    // bad frame count / gop
    intercept[java.io.IOException](DeltaVideo.read(patched(12, -1)))
    intercept[java.io.IOException](DeltaVideo.read(patched(16, 0)))
    // per-frame length field: negative and past-the-end both clean
    intercept[java.io.IOException](DeltaVideo.read(patched(21, -7)))
    intercept[java.io.IOException](DeltaVideo.read(patched(21, gvd.length)))
    // bad frame-type byte
    val badType = gvd.clone(); badType(20) = 'Q'
    intercept[java.io.IOException](DeltaVideo.read(badType))
    // a P-frame claiming to start a stream (no reference) — craft a
    // stream whose first record type byte is flipped to 'P'
    val flipped = gvd.clone(); flipped(20) = 'P'
    intercept[java.io.IOException](DeltaVideo.read(flipped))
    intercept[java.io.IOException](DeltaVideo.readGop(flipped, 0))
    // readGop gets the same framing validation
    intercept[java.io.IOException](DeltaVideo.readGop(patched(21, -7), 1))
  }

  test("keyframe seek is GOP-local: works on a stream truncated after the target") {
    val frames = smooth(11, 16, 16)
    val gvd = DeltaVideo.write(frames, 16, 16, 4)
    for (target <- Seq(0, 3, 5, 10)) {
      // full-stream seek equals the full decode
      assert(java.util.Arrays.equals(
        DeltaVideo.readGop(gvd, target), frames(target)))
    }
    // drop every byte after frame 5's record: frames 6..10 are GONE,
    // yet seeking frame 5 (GOP 4..7, needs records 4 and 5 only) works
    // — proof the seek never reads past its GOP
    val p = DeltaVideo.read(gvd)
    var off = 20
    for (f <- 0 to 5)
      off += 5 + java.nio.ByteBuffer.wrap(gvd, off + 1, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    val truncated = java.util.Arrays.copyOf(gvd, off)
    assert(java.util.Arrays.equals(
      DeltaVideo.readGop(truncated, 5), frames(5)))
    assert(p.frames.size == 11) // sanity: the full stream had them all
  }

  // ---- lossy DCT mode ('K'/'R', r10) --------------------------------

  /** A DCT-friendly scene: smooth gradients plus a soft moving blob —
    * energy concentrates in low frequencies, so quantization has
    * something to cut (pure noise would show no rate lever).
    */
  private def scene(n: Int, w: Int, h: Int): Seq[Array[Byte]] =
    (0 until n).map { f =>
      Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        val cx = (w / 4 + f * 2) % w; val cy = h / 2
        val d2 = (x - cx) * (x - cx) + (y - cy) * (y - cy)
        val blob = (80.0 * math.exp(-d2 / 40.0)).toInt
        val grad = (x * 140) / w + (y * 60) / h
        DeltaVideoSpec.clamp255(20 + grad + blob).toByte
      }
    }

  test("lossy round-trip: typed K/R, dims preserved, PSNR in the quality band") {
    val frames = scene(9, 48, 32)
    val enc = DeltaVideo.writeLossy(frames, 48, 32, gop = 4, quality = 50)
    val p = DeltaVideo.read(enc)
    assert(p.w == 48 && p.h == 32 && p.frames.size == 9)
    assert(p.frameTypes.zipWithIndex.forall { case (t, f) =>
      t == (if (f % 4 == 0) 'K' else 'R') })
    p.frames.zip(frames).foreach { case (got, want) =>
      val db = DeltaVideo.psnr(got, want)
      assert(db > 30.0, s"q50 PSNR $db dB")
    }
  }

  test("rate-distortion: size and PSNR both increase monotonically with quality") {
    val frames = scene(8, 48, 32)
    val qs = Seq(10, 50, 90)
    val encs = qs.map(q => DeltaVideo.writeLossy(frames, 48, 32, 4, q))
    val sizes = encs.map(_.length)
    val psnrs = encs.map { e =>
      val p = DeltaVideo.read(e)
      p.frames.zip(frames).map { case (g, w0) => DeltaVideo.psnr(g, w0) }.min
    }
    assert(sizes(0) < sizes(1) && sizes(1) < sizes(2),
      s"sizes not monotone: $sizes")
    assert(psnrs(0) < psnrs(1) && psnrs(1) < psnrs(2),
      s"PSNR not monotone: $psnrs")
    // and the lossy stream must actually be SMALLER than lossless
    val lossless = DeltaVideo.write(frames, 48, 32, 4)
    assert(sizes(1) < lossless.length,
      s"q50 ${sizes(1)} not below lossless ${lossless.length}")
  }

  test("closed-loop prediction: no drift across a long GOP") {
    // with open-loop prediction (predicting from the source instead of
    // the reconstruction) the decoder error compounds every R frame;
    // closed-loop keeps the last frame of a 16-frame GOP in the same
    // PSNR class as the first
    val frames = scene(16, 48, 32)
    val p = DeltaVideo.read(DeltaVideo.writeLossy(frames, 48, 32, 16, 50))
    val dbs = p.frames.zip(frames).map { case (g, w0) => DeltaVideo.psnr(g, w0) }
    val firstPredicted = dbs(1)
    val last = dbs.last
    assert(last > firstPredicted - 3.0,
      s"drift: frame1 $firstPredicted dB -> frame15 $last dB")
    assert(dbs.forall(_ > 30.0), s"GOP PSNR floor violated: $dbs")
  }

  test("lossy seek: readGop reconstructs the same plane as the full decode") {
    val frames = scene(11, 40, 24)
    val enc = DeltaVideo.writeLossy(frames, 40, 24, 4, 60)
    val full = DeltaVideo.read(enc)
    for (target <- Seq(0, 2, 5, 10))
      assert(java.util.Arrays.equals(
        DeltaVideo.readGop(enc, target), full.frames(target)))
  }

  test("lossy payloads validate like the lossless ones (bad quality byte is fatal)") {
    val frames = scene(2, 16, 16)
    val enc = DeltaVideo.writeLossy(frames, 16, 16, 4, 50)
    // non-block-aligned dims still work
    val odd = scene(5, 23, 13)
    val pOdd = DeltaVideo.read(DeltaVideo.writeLossy(odd, 23, 13, 3, 50))
    assert(pOdd.frames.size == 5 &&
      pOdd.frames.zip(odd).forall { case (g, w0) => DeltaVideo.psnr(g, w0) > 28.0 })
    // flip the frame type of record 0 to an unknown letter: fatal
    val bad = enc.clone(); bad(20) = 'X'.toByte
    intercept[java.io.IOException](DeltaVideo.read(bad))
  }
}

object DeltaVideoSpec {
  def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
}
