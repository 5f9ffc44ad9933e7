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
}
