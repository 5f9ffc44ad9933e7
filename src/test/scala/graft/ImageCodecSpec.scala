package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Real-image-codec path (operators/Multimodal.imageDecode): the
  * oracle already pins PNG's lossless round-trip feature-for-feature;
  * this spec covers what SQL cannot — that the bytes on the wire are a
  * real PNG a third-party decoder-agnostic check accepts, and that the
  * JDK's LOSSY codec (JPEG) also works in this container, which is the
  * fact the old "environment-blocked" claim got wrong.
  */
class ImageCodecSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("image_decode features equal an independent pixel-model recompute") {
    val got = SparkEntry.queries("image_decode")(spark, sf)
      .orderBy("doc_id").limit(20).collect()
    got.foreach { r =>
      val d = r.getLong(0)
      val (w, h) = ((8 + d % 9).toInt, (4 + d % 5).toInt)
      assert(r.getInt(1) == w && r.getInt(2) == h)
      assert(r.getBoolean(3), s"doc $d: encoder did not produce a PNG")
      var (sr, ck) = (0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val red = (d * 7 + x * 31 + y * 131) % 256
        val g = (d * 11 + x * 17 + y * 29) % 256
        val b = (d * 13 + x * 23 + y * 37) % 256
        sr += red
        ck += (red * 65536 + g * 256 + b) * (y * w + x + 1)
      }
      assert(r.getLong(4) == sr, s"doc $d sum_r")
      assert(r.getLong(7) == ck, s"doc $d px_checksum")
    }
  }

  test("audio_decode parses the real RIFF container, not assumed offsets") {
    // corrupting the format chunk must make the REAL parser reject the
    // stream — a fake decoder reading fixed offsets would march on
    val d = 3L
    val n = (256 + (d % 64) * 16).toInt
    val pcm = new Array[Byte](n * 2)
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    wav(8) = 'X' // RIFF form type "WAVE" -> "XAVE"
    intercept[javax.sound.sampled.UnsupportedAudioFileException] {
      javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
    }
    // and the registered op's features come off the decoded stream:
    // spot-check one doc against an independent sample-model recompute
    val row = SparkEntry.queries("audio_decode")(spark, sf)
      .where(org.apache.spark.sql.functions.col("doc_id") === d)
      .collect()(0)
    var (sumAbs, ck) = (0L, 0L)
    for (i <- 0 until n) {
      val s = (d * 1103 + i * 31 + 7) % 65536 - 32768
      sumAbs += math.abs(s); ck += s * (i + 1)
    }
    assert(row.getLong(1) == n && row.getInt(2) == 16000 && row.getBoolean(3))
    assert(row.getLong(4) == sumAbs && row.getLong(7) == ck)
  }

  test("AVI parser walks chunk framing — junk chunks skipped, corruption fatal") {
    import graft.functions.AviMjpeg
    val frame = Array.tabulate[Byte](64)(i => i.toByte)
    val avi = AviMjpeg.write(Seq(frame, frame, frame), 8, 8)
    assert(AviMjpeg.isAvi(avi))
    assert(AviMjpeg.readFrames(avi).map(_.toSeq) == Seq.fill(3)(frame.toSeq))
    // a foreign top-level chunk BEFORE movi must be walked over, not
    // tripped over — proves the parser never assumes fixed offsets
    // size 10 is even — RIFF pads only odd-sized bodies, so none here
    val junkBody = Array.fill[Byte](10)(0x55)
    val padded = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](10, 0, 0, 0) ++ junkBody
    val hdrlEnd = {
      // locate end of the hdrl LIST (first LIST after the 12-byte header)
      val size = (avi(16) & 0xff) | ((avi(17) & 0xff) << 8) |
        ((avi(18) & 0xff) << 16) | ((avi(19) & 0xff) << 24)
      12 + 8 + size
    }
    val withJunk = avi.slice(0, 4) ++ {
      val newLen = (avi.length - 8) + padded.length
      Array((newLen & 0xff).toByte, ((newLen >> 8) & 0xff).toByte,
        ((newLen >> 16) & 0xff).toByte, ((newLen >> 24) & 0xff).toByte)
    } ++ avi.slice(8, hdrlEnd) ++ padded ++ avi.slice(hdrlEnd, avi.length)
    assert(AviMjpeg.readFrames(withJunk).length == 3,
      "parser must skip unknown chunks by their declared size")
    // corrupting the movi list type must fail loudly, not return junk
    val broken = withJunk.clone()
    val moviAt = withJunk.indexOfSlice("movi".getBytes("US-ASCII"))
    broken(moviAt) = 'x'
    intercept[IllegalArgumentException] { AviMjpeg.readFrames(broken) }
    // non-AVI bytes are rejected at the signature
    assert(!AviMjpeg.isAvi("RIFFxxxxWAVE".getBytes("US-ASCII")))
  }

  test("the container's JDK really ships lossy codecs too (JPEG)") {
    javax.imageio.ImageIO.setUseCache(false)
    val img = new java.awt.image.BufferedImage(
      16, 9, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 9; x <- 0 until 16)
      img.setRGB(x, y, (x * 31 + y * 7) * 65793 & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos),
      "no JPEG writer registered")
    val jpg = bos.toByteArray
    // JFIF signature
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpg))
    // lossy: dimensions survive exactly, pixels only approximately
    assert(back.getWidth == 16 && back.getHeight == 9)
    val err = (for (y <- 0 until 9; x <- 0 until 16) yield {
      val a = img.getRGB(x, y); val b = back.getRGB(x, y)
      math.abs(((a >> 16) & 0xff) - ((b >> 16) & 0xff))
    }).max
    assert(err < 64, s"JPEG decode wildly off (max channel err $err)")
  }
}
