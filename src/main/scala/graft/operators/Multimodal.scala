package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Op, Tables}

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * Codec reality, by modality: IMAGE decode is REAL — the JDK ships
  * PNG/JPEG/BMP/GIF codecs (`javax.imageio`), and [[imageDecode]] /
  * [[imageShardPipeline]] drive the actual encoder and decoder per
  * row, oracle-checked through PNG's lossless round-trip identity.
  * AUDIO decode is REAL too — [[audioDecode]] round-trips 16-bit PCM
  * through the JDK's RIFF/WAVE codec (`javax.sound.sampled`).
  * VIDEO decode is real at the Motion-JPEG level — [[videoDecode]]
  * parses a real RIFF/AVI container ([[graft.functions.AviMjpeg]])
  * and decodes every frame with the JDK JPEG codec; only a DEDICATED
  * inter-frame video codec (H.264-class) is absent from the
  * container. [[decodeBatch]] keeps its clearly-marked deterministic
  * fake as the generic plumbing exhibit — binary schema, metadata
  * struct, per-frame explode shape, typed mapPartitions batch path —
  * that an arbitrary native codec would slot into.
  */
object Multimodal {

  /** Tar-shard staging dirs, deleted recursively at JVM exit (ADVICE
    * r7: bench min-of-N, stall-retime, and three-SF sweeps each mint a
    * fresh dir — per-invocation freshness is correct, but unbounded
    * /tmp growth across a long session is not). Deletion can't happen
    * any earlier: the returned DataFrames are LAZY and may re-read the
    * shards on every downstream action.
    */
  private val stagedDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val purgeHookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      stagedDirs.forEach { root =>
        try {
          import java.nio.file._
          Files.walk(root).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { Files.deleteIfExists(p); () })
        } catch { case _: Throwable => () } // best-effort at exit
      }))
  private def trackedTempDir(prefix: String): String = {
    purgeHookInstalled
    // Stage ephemeral shard/media dirs in tmpfs, NOT java.io.tmpdir
    // (r10 opt, guide §6): the VM's root disk shows multi-second
    // D-state stalls under writes — the spark.local.dir rationale in
    // Sessions — so a timed pipeline that tars shards through /tmp
    // measures the disk, not the engine. Same env-override discipline
    // as GRAFT_LOCAL_DIR; correctness never depends on the location
    // (the round-trip reads whatever was written back through the
    // same path).
    val base = java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_STAGE_DIR", "/dev/shm/graft-stage"))
    java.nio.file.Files.createDirectories(base)
    val p = java.nio.file.Files.createTempDirectory(base, prefix)
    stagedDirs.add(p)
    p.toString
  }

  /** Media table: binary payload + typed metadata derived from
    * documents (UTF-8 bytes standing in for an encoded image).
    */
  private def media(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        col("source").as("container"),
        col("n_chars").as("declared_len"),
      )

  private val mediaSql =
    """SELECT doc_id AS media_id, encode(text) AS payload,
      |  source AS container, n_chars AS declared_len
      |FROM documents""".stripMargin

  /** Metadata extraction over binary payloads: real byte length, a
    * header probe (first byte), and a validity flag — the schema-level
    * half of a decode stage.
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    media(spark, dir)
      .select(
        col("media_id"),
        col("container"),
        octet_length(col("payload")).as("n_bytes"),
        (octet_length(col("payload")) === col("declared_len")).as("len_ok"),
        ascii(decode(substr(col("payload"), lit(1), lit(1)), "UTF-8")).as("header_byte"),
      )

  private val multimodalMetaSql =
    """SELECT media_id, container,
      |  octet_length(payload) AS n_bytes,
      |  octet_length(payload) = declared_len AS len_ok,
      |  ascii(substring(text, 1, 1)) AS header_byte
      |FROM (SELECT doc_id AS media_id, encode(text) AS payload,
      |        source AS container, n_chars AS declared_len, text
      |      FROM documents)""".stripMargin

  /** Frame sampling: one row per sampled frame (every ~64 bytes), with
    * the frame's byte slice — the explode shape a video pipeline uses.
    * FAKE-DECODE: `frame_feature` is deterministic byte arithmetic in
    * place of a codec; swap the expression for a real kernel on a
    * cluster with codecs installed.
    */
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame =
    media(spark, dir)
      .select(col("media_id"), col("payload"),
        // sequence(0, -1) would generate a DESCENDING [0, -1] — guard
        // the zero-frame case explicitly.
        explode(expr("CASE WHEN octet_length(payload) >= 64 THEN " +
          "sequence(0, CAST(octet_length(payload) / 64 AS INT) - 1) " +
          "ELSE CAST(array() AS array<int>) END"))
          .as("frame_idx"))
      .select(
        col("media_id"),
        col("frame_idx"),
        octet_length(substr(col("payload"), col("frame_idx") * 64 + 1, lit(64)))
          .as("frame_bytes"),
        ascii(decode(substr(col("payload"), col("frame_idx") * 64 + 1, lit(1)), "UTF-8"))
          .as("frame_feature"),
      )

  private val multimodalFramesSql =
    """SELECT media_id, frame_idx,
      |  octet_length(encode(substring(text, CAST(frame_idx * 64 + 1 AS INTEGER), 64))) AS frame_bytes,
      |  ascii(substring(text, CAST(frame_idx * 64 + 1 AS INTEGER), 1)) AS frame_feature
      |FROM (
      |  SELECT media_id, payload, text,
      |    unnest(range(0, CAST(floor(octet_length(payload) / 64.0) AS BIGINT))) AS frame_idx
      |  FROM (SELECT doc_id AS media_id, encode(text) AS payload, text
      |        FROM documents))""".stripMargin

  /** Typed batch-decode path: the mapPartitions shape a real codec
    * plugs into — one partition = one batch, per-batch codec init
    * amortized, Encoder-backed rows in/out (the JVM analog of a
    * pandas-batch UDF).
    */
  final case class MediaIn(media_id: Long, payload: Array[Byte], container: String)
  final case class MediaFeature(media_id: Long, n_bytes: Int, checksum: Long,
      feature: Array[Float])

  /** FAKE-DECODE kernel: deterministic byte statistics standing in for
    * VIDEO frame decode (the one modality with no codec anywhere in
    * the container — image and audio have real JDK codec paths above).
    * The per-partition `init` marks where a codec context would be
    * constructed once per batch.
    */
  def decodeBatch(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[MediaFeature] = {
    import spark.implicits._
    media(spark, dir)
      .select(col("media_id"), col("payload"), col("container"))
      .as[MediaIn]
      .mapPartitions { batch =>
        // codec context would initialize here, once per partition
        batch.map { m =>
          var sum = 0L
          val hist = new Array[Float](8)
          var i = 0
          while (i < m.payload.length) {
            val b = m.payload(i) & 0xff
            sum = sum * 31 + b
            hist(b % 8) += 1f
            i += 1
          }
          MediaFeature(m.media_id, m.payload.length, sum, hist)
        }
      }
  }

  /** Resize/downsample stage: stride-4 byte sampling (the structural
    * analog of image downscaling — pick every k-th sample), keeping
    * original + resized metadata. ASCII corpus ⇒ char ops == byte ops
    * in both engines.
    */
  def multimodalResize(spark: SparkSession, dir: String): DataFrame =
    media(spark, dir)
      .select(
        col("media_id"),
        octet_length(col("payload")).as("n_bytes"),
        expr("concat_ws('', transform(sequence(1, octet_length(payload), 4), " +
          "i -> substring(decode(payload, 'UTF-8'), i, 1)))").as("resized"),
      )
      .withColumn("resized_bytes", octet_length(col("resized")))

  private val multimodalResizeSql =
    """SELECT media_id, octet_length(payload) AS n_bytes,
      |  array_to_string(list_transform(range(1, octet_length(payload) + 1, 4),
      |    i -> substring(text, CAST(i AS INTEGER), 1)), '') AS resized,
      |  octet_length(encode(array_to_string(list_transform(range(1, octet_length(payload) + 1, 4),
      |    i -> substring(text, CAST(i AS INTEGER), 1)), ''))) AS resized_bytes
      |FROM (SELECT doc_id AS media_id, encode(text) AS payload, text
      |      FROM documents)""".stripMargin

  /** SQL mirror of [[decodeBatch]]'s fake-decode kernel: the byte fold
    * sum = sum*31 + b as a list_reduce in HUGEINT, wrapped mod 2^64
    * each step to reproduce Java Long two's-complement overflow, then
    * re-signed at the end; hist_i as filtered byte counts. ASCII corpus
    * ⇒ per-char ascii() equals the UTF-8 byte sequence.
    */
  private val multimodalDecodeBatchSql: String = {
    val hists = (0 until 8).map(i =>
      s"  CAST(len(list_filter(bs, b -> b % 8 = $i)) AS FLOAT) AS hist_$i").mkString(",\n")
    s"""WITH bytes AS (
       |  SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
       |    list_transform(range(1, len(text) + 1),
       |      i -> ascii(substring(text, CAST(i AS INTEGER), 1))) AS bs
       |  FROM documents),
       |folded AS (
       |  SELECT media_id, n_bytes, bs,
       |    list_reduce(list_prepend(CAST(0 AS HUGEINT),
       |        list_transform(bs, b -> CAST(b AS HUGEINT))),
       |      (acc, b) -> (acc * 31 + b) % CAST('18446744073709551616' AS HUGEINT)) AS u
       |  FROM bytes)
       |SELECT media_id, CAST(n_bytes AS INTEGER) AS n_bytes,
       |  CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
       |       THEN u - CAST('18446744073709551616' AS HUGEINT) ELSE u END AS BIGINT) AS checksum,
       |$hists
       |FROM folded""".stripMargin
  }

  /** WebDataset tar-shard ROUND-TRIP as an oracle-checked query: the
    * documents table is written as tar shards of 100 samples
    * (`<id>.txt` + `<id>.json` per sample — the standard multimodal
    * training layout, [[graft.sources.WebDataset]]), read back through
    * the distributed binaryFile + tar-parse path, and the reassembled
    * samples are compared against what DuckDB derives from the parquet
    * directly — byte lengths, metadata fields, component counts, and
    * shard membership all have to survive the format. The write is the
    * amortized once-per-ingest cost, same convention as
    * `bucketed_join_agg`'s bucketed tables.
    */
  def webdatasetRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    // a FRESH temp dir per invocation (review r14): a fixed hash-keyed
    // path could collide across fixture dirs or concurrent sessions,
    // and a still-lazy DataFrame from a prior call could read a
    // half-deleted directory
    val out = trackedTempDir("graft_wds_")
    graft.sources.WebDataset.writeShards(
      Tables.documents(spark, dir), out, samplesPerShard = 100)
    // the shard column is parsed from the ACTUAL tar file the sample
    // came back from — deriving it from doc_id would make the oracle's
    // shard-membership check vacuous (review r14)
    graft.sources.WebDataset.readSamples(spark, out)
      .select(col("doc_id"),
        regexp_extract(col("shard_file"), "shard-(\\d+)\\.tar", 1)
          .cast("long").as("shard"),
        col("n_components"),
        octet_length(col("text")).cast("long").as("n_text_bytes"),
        col("lang"), col("source"))
  }

  private val webdatasetRoundtripSql =
    """SELECT doc_id, doc_id // 100 AS shard, CAST(2 AS BIGINT) AS n_components,
      |  CAST(strlen(text) AS BIGINT) AS n_text_bytes, lang, source
      |FROM documents""".stripMargin

  final case class ImgIn(doc_id: Long)
  final case class ImgFeat(doc_id: Long, width: Int, height: Int,
      png_valid: Boolean, sum_r: Long, sum_g: Long, sum_b: Long,
      px_checksum: Long, half_sum_rgb: Long)

  /** Deterministic per-document test image, ENCODED as real PNG bytes
    * through the JDK codec. Executor-side; callers set
    * `ImageIO.setUseCache(false)` once per partition.
    */
  private[graft] def pngFor(d: Long): Array[Byte] = {
    val w = (8 + d % 9).toInt
    val h = (4 + d % 5).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((d * 7 + x * 31 + y * 131) % 256).toInt
        val g = ((d * 11 + x * 17 + y * 29) % 256).toInt
        val b = ((d * 13 + x * 23 + y * 37) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL decode: features computed from `ImageIO.read` of the PNG
    * bytes only — never from the generating arithmetic.
    */
  private[graft] def decodeFeatures(d: Long, png: Array[Byte]): ImgFeat = {
    val valid = png.length > 8 && (png(0) & 0xff) == 0x89 &&
      png(1) == 'P' && png(2) == 'N' && png(3) == 'G'
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    // ImageIO.read returns NULL (no exception) when no reader claims
    // the bytes — fail with the sample's identity, not a bare NPE, so
    // a tar-framing or shard-corruption bug is diagnosable
    if (back == null) throw new IllegalArgumentException(
      s"image_decode: doc $d payload (${png.length} bytes, " +
        s"png_signature=$valid) is not decodable by any registered reader")
    val (bw, bh) = (back.getWidth, back.getHeight)
    var (sr, sg, sb, ck, half) = (0L, 0L, 0L, 0L, 0L)
    val (hw, hh) = (bw / 2, bh / 2)
    var y = 0
    while (y < bh) {
      var x = 0
      while (x < bw) {
        val rgb = back.getRGB(x, y) & 0xffffff
        sr += (rgb >> 16) & 0xff
        sg += (rgb >> 8) & 0xff
        sb += rgb & 0xff
        ck += rgb.toLong * (y.toLong * bw + x + 1)
        if (x % 2 == 0 && y % 2 == 0 && x / 2 < hw && y / 2 < hh)
          half += rgb
        x += 1
      }
      y += 1
    }
    ImgFeat(d, bw, bh, valid, sr, sg, sb, ck, half)
  }

  /** REAL image decode through the JDK's bundled PNG codec
    * (`javax.imageio` — present on every JVM; the "no codecs in the
    * container" limitation only ever applied to native/Python codec
    * libraries). Per document: deterministic RGB pixels are rendered
    * into a BufferedImage, ENCODED to real PNG bytes, DECODED back
    * through `ImageIO.read`, and every output feature is computed from
    * the DECODED image only. PNG is lossless, so the oracle can state
    * the same features as closed-form pixel arithmetic in SQL — any
    * encoder/decoder infidelity, channel swap, or row-order bug breaks
    * the hash. `png_valid` pins the signature bytes of the real
    * encoder output (the tolerance-band-oracle pattern: the engine
    * outputs its own verdict, the oracle expects literal TRUE) without
    * hashing encoder-version-specific compression details.
    *
    * The half_* features are a REAL nearest-neighbor 2x downscale of
    * the decoded pixels — the resize stage of an image-training
    * pipeline, exact by construction.
    *
    * Scale shape: one mapPartitions projection, no exchange at all —
    * decode parallelism is scan parallelism, the same shape a 100 TB
    * image-corpus featurization runs (per-partition codec init,
    * row-local work, no shuffle).
    */
  def imageDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id")).as[ImgIn]
      .mapPartitions { batch =>
        // per-partition codec setup: no disk-backed stream cache
        javax.imageio.ImageIO.setUseCache(false)
        batch.map(in => decodeFeatures(in.doc_id, pngFor(in.doc_id)))
      }.toDF()
  }

  private val imageDecodeSql =
    """WITH px AS (
      |  SELECT doc_id, 8 + doc_id % 9 AS w, 4 + doc_id % 5 AS h,
      |    unnest(range((8 + doc_id % 9) * (4 + doc_id % 5))) AS i
      |  FROM documents),
      |v AS (
      |  SELECT doc_id, w, h, i, i % w AS x, i // w AS y,
      |    (doc_id * 7 + (i % w) * 31 + (i // w) * 131) % 256 AS r,
      |    (doc_id * 11 + (i % w) * 17 + (i // w) * 29) % 256 AS g,
      |    (doc_id * 13 + (i % w) * 23 + (i // w) * 37) % 256 AS b
      |  FROM px)
      |SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
      |  TRUE AS png_valid,
      |  CAST(SUM(r) AS BIGINT) AS sum_r,
      |  CAST(SUM(g) AS BIGINT) AS sum_g,
      |  CAST(SUM(b) AS BIGINT) AS sum_b,
      |  CAST(SUM((r * 65536 + g * 256 + b) * (i + 1)) AS BIGINT) AS px_checksum,
      |  CAST(SUM(CASE WHEN x % 2 = 0 AND y % 2 = 0
      |      AND x < 2 * (w // 2) AND y < 2 * (h // 2)
      |      THEN r * 65536 + g * 256 + b ELSE 0 END) AS BIGINT) AS half_sum_rgb
      |FROM v GROUP BY doc_id, w, h""".stripMargin

  final case class AudioFeat(doc_id: Long, n_samples: Long, sample_rate: Int,
      wav_valid: Boolean, sum_abs: Long, energy: Long, zero_crossings: Long,
      smp_checksum: Long)

  /** REAL audio decode through the JDK's bundled WAV/PCM codec
    * (`javax.sound.sampled` — same situation as [[imageDecode]]: the
    * JVM has always shipped this; only native audio libraries are
    * absent). Per document: a deterministic 16-bit mono PCM signal is
    * ENCODED into a real RIFF/WAVE container via `AudioSystem.write`,
    * DECODED back via `AudioSystem.getAudioInputStream`, and every
    * feature — sample count, rate, magnitude sum, energy,
    * zero-crossings, positional checksum — is computed from the
    * DECODED byte stream only. PCM is lossless, so the oracle states
    * the same features as closed-form sample arithmetic; a byte-order,
    * header-offset, or channel bug breaks the hash. Exchange-free,
    * like every row-local codec stage.
    */
  def audioDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id")).as[ImgIn]
      .mapPartitions { batch =>
        batch.map { in =>
          val d = in.doc_id
          val n = (256 + (d % 64) * 16).toInt
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = ((d * 1103 + i.toLong * 31 + 7) % 65536 - 32768).toInt
            pcm(2 * i) = (s & 0xff).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1,
            true, false) // signed, little-endian
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          val wav = bos.toByteArray
          val valid = wav.length > 12 && wav(0) == 'R' && wav(1) == 'I' &&
            wav(2) == 'F' && wav(3) == 'F' &&
            wav(8) == 'W' && wav(9) == 'A' && wav(10) == 'V' && wav(11) == 'E'
          // decode: features from the round-tripped stream ONLY
          val back = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(wav))
          val rate = back.getFormat.getSampleRate.toInt
          val out = back.readAllBytes()
          val m = out.length / 2
          var (sumAbs, energy, crossings, ck) = (0L, 0L, 0L, 0L)
          var prevNonNeg = false
          i = 0
          while (i < m) {
            // little-endian signed 16-bit, as the written format declares
            val s = ((out(2 * i) & 0xff) | (out(2 * i + 1) << 8)).toShort.toInt
            sumAbs += math.abs(s)
            energy += s.toLong * s
            if (i > 0 && (s >= 0) != prevNonNeg) crossings += 1
            prevNonNeg = s >= 0
            ck += s.toLong * (i + 1)
            i += 1
          }
          AudioFeat(d, m.toLong, rate, valid, sumAbs, energy, crossings, ck)
        }
      }.toDF()
  }

  private val audioDecodeSql =
    """WITH s AS (
      |  SELECT doc_id, 256 + (doc_id % 64) * 16 AS n,
      |    unnest(range(256 + (doc_id % 64) * 16)) AS i
      |  FROM documents),
      |v AS (
      |  SELECT doc_id, n, i,
      |    (doc_id * 1103 + i * 31 + 7) % 65536 - 32768 AS smp,
      |    CASE WHEN i > 0
      |      THEN (doc_id * 1103 + (i - 1) * 31 + 7) % 65536 - 32768 END AS prev
      |  FROM s)
      |SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
      |  CAST(16000 AS INTEGER) AS sample_rate,
      |  TRUE AS wav_valid,
      |  CAST(SUM(abs(smp)) AS BIGINT) AS sum_abs,
      |  CAST(SUM(smp * smp) AS BIGINT) AS energy,
      |  CAST(SUM(CASE WHEN prev IS NOT NULL
      |      AND (smp >= 0) <> (prev >= 0) THEN 1 ELSE 0 END) AS BIGINT)
      |    AS zero_crossings,
      |  CAST(SUM(smp * (i + 1)) AS BIGINT) AS smp_checksum
      |FROM v GROUP BY doc_id, n""".stripMargin

  final case class VideoFeat(doc_id: Long, container_ok: Boolean,
      n_frames: Long, width: Int, height: Int, frames_decoded: Long,
      brightness_ok: Boolean)

  /** REAL video decode: Motion-JPEG in a RIFF/AVI container — the
    * webcam/capture format whose container is plain chunk framing
    * ([[graft.functions.AviMjpeg]], dependency-free) and whose frames
    * are JPEGs the JDK codec decodes. Per document: deterministic
    * smooth grayscale frames are JPEG-ENCODED, wrapped into a real
    * AVI, then the bytes are PARSED back through the chunk walk and
    * every frame DECODED with `ImageIO.read`. Exact facts (container
    * signature, frame count, dimensions) are oracle-hashed directly;
    * the lossy brightness feature uses the tolerance-band pattern —
    * the engine emits its own verdict (every decoded frame's mean
    * within ±8 of the closed-form model; JPEG on smooth gray content
    * drifts ~1-2), the oracle expects literal TRUE. With this, every
    * modality has a real codec path; only a DEDICATED video codec
    * (H.264-class inter-frame compression) remains absent from the
    * container. Exchange-free scan-parallel, like every codec stage.
    */
  def videoDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id")).as[ImgIn]
      .mapPartitions { batch =>
        javax.imageio.ImageIO.setUseCache(false)
        batch.map { in =>
          val d = in.doc_id
          val nf = (3 + d % 4).toInt
          val w = (16 + (d % 2) * 8).toInt
          val h = 16
          def pixel(f: Int, x: Int, y: Int): Int =
            ((d * 3 + x * 2 + y * 2 + f * 5) % 200 + 28).toInt
          val frames = (0 until nf).map { f =>
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = pixel(f, x, y)
                img.setRGB(x, y, (v << 16) | (v << 8) | v)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "jpg", bos)
            bos.toByteArray
          }
          val avi = graft.functions.AviMjpeg.write(frames, w, h)
          // ---- decode side: every feature comes from the BYTES ----
          val ok = graft.functions.AviMjpeg.isAvi(avi)
          val parsed = graft.functions.AviMjpeg.readFrames(avi)
          var decoded = 0L
          var (bw, bh) = (0, 0)
          var bright = true
          parsed.zipWithIndex.foreach { case (jpeg, f) =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(jpeg))
            if (img != null) {
              decoded += 1
              bw = img.getWidth; bh = img.getHeight
              var sum = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  sum += (img.getRGB(x, y) >> 16) & 0xff
                  x += 1
                }
                y += 1
              }
              val mean = sum.toDouble / (img.getWidth * img.getHeight)
              var model = 0L
              y = 0
              while (y < h) {
                var x = 0
                while (x < w) { model += pixel(f, x, y); x += 1 }
                y += 1
              }
              val modelMean = model.toDouble / (w * h)
              if (math.abs(mean - modelMean) > 8.0) bright = false
            }
          }
          VideoFeat(d, ok, parsed.length.toLong, bw, bh, decoded, bright)
        }
      }.toDF()
  }

  private val videoDecodeSql =
    """SELECT doc_id,
      |  TRUE AS container_ok,
      |  CAST(3 + doc_id % 4 AS BIGINT) AS n_frames,
      |  CAST(16 + (doc_id % 2) * 8 AS INTEGER) AS width,
      |  CAST(16 AS INTEGER) AS height,
      |  CAST(3 + doc_id % 4 AS BIGINT) AS frames_decoded,
      |  TRUE AS brightness_ok
      |FROM documents""".stripMargin

  final case class VideoDeltaFeat(doc_id: Long, container_ok: Boolean,
      n_frames: Long, width: Int, height: Int, frames_decoded: Long,
      recon_ok: Boolean, gop_ok: Boolean, temporal_gain_ok: Boolean,
      seek_ok: Boolean, mc_recon_ok: Boolean, mc_gain_ok: Boolean)

  /** INTER-FRAME video codec round-trip ([[graft.functions.DeltaVideo]]
    * — GVD1: zlib keyframes + temporal-delta P-frames in 4-frame GOPs,
    * and since r9 MOTION-COMPENSATED 'M' frames: exhaustive ±4 px
    * block match per 8×8 block with border-extended references, one
    * vector byte per block + residual). It exercises the properties a
    * video-ingest pipeline engineers around: decode-order dependency
    * (P/M need their reference), GOP structure (keyframe cadence
    * verified), keyframe-seek random access (the middle frame decoded
    * through its GOP alone must equal the full-decode frame), and
    * motion search + residual coding (a per-doc PANNING pseudo-random
    * texture clip must reconstruct byte-exactly through 'M' frames
    * AND compress below the plain-delta encoding of the same frames —
    * plain deltas of translating noise are themselves noise, so the
    * gain can only come from the block match finding the shift).
    * The codec is LOSSLESS in every frame type, so reconstruction
    * checks are byte EQUALITY against the generator model — stronger
    * than the MJPEG path's tolerance bands; temporal gain is verified
    * from the bytes (the gop=4 stream must be smaller than the same
    * frames all-I). Exact facts (counts, dims) oracle-hash directly;
    * verdicts ride as booleans the oracle expects TRUE. Exchange-free
    * scan-parallel.
    */
  def videoDeltaCodec(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id")).as[ImgIn]
      .mapPartitions { batch =>
        batch.map { in =>
          val d = in.doc_id
          val nf = (6 + d % 5).toInt
          val w = (16 + (d % 2) * 8).toInt
          val h = 16
          val gop = 4
          def plane(f: Int): Array[Byte] = {
            val p = new Array[Byte](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                p(y * w + x) = ((d * 3 + x * 2 + y * 2 + f * 5) % 200 + 28).toByte
                x += 1
              }
              y += 1
            }
            p
          }
          val frames = (0 until nf).map(plane)
          val gvd = graft.functions.DeltaVideo.write(frames, w, h, gop)
          val allI = graft.functions.DeltaVideo.write(frames, w, h, gop = 1)
          // ---- decode side: every feature comes from the BYTES ----
          val ok = graft.functions.DeltaVideo.isGvd(gvd)
          val parsed = graft.functions.DeltaVideo.read(gvd)
          val reconOk = parsed.frames.size == nf &&
            parsed.frames.zipWithIndex.forall { case (got, f) =>
              java.util.Arrays.equals(got, plane(f)) }
          val gopOk = parsed.frameTypes.zipWithIndex.forall { case (t, f) =>
            t == (if (f % gop == 0) 'I' else 'P') }
          val mid = nf / 2
          val seekOk = java.util.Arrays.equals(
            graft.functions.DeltaVideo.readGop(gvd, mid), plane(mid))
          // ---- motion-compensation leg: a (2,1)-per-frame PAN over a
          // per-doc avalanche-mixed texture (locally incompressible, so
          // plain deltas of the pan are themselves noise) ----
          def tex(x: Int, y: Int): Byte = {
            var m = (x + d.toInt * 7) * 0x9E3779B9 ^ y * 0x85EBCA6B
            m ^= m >>> 13; m *= 0xC2B2AE35; m ^= m >>> 16
            ((m & 0x7fffffff) % 200 + 28).toByte
          }
          val pan = (0 until nf).map { f =>
            Array.tabulate(w * h)(i => tex(i % w + 2 * f, i / w + f))
          }
          val mc = graft.functions.DeltaVideo.write(pan, w, h, gop,
            motion = true)
          val plainP = graft.functions.DeltaVideo.write(pan, w, h, gop)
          val mcParsed = graft.functions.DeltaVideo.read(mc)
          val mcReconOk = mcParsed.frames.zipWithIndex.forall { case (g, f) =>
            java.util.Arrays.equals(g, pan(f)) } &&
            mcParsed.frameTypes.zipWithIndex.forall { case (t, f) =>
              t == (if (f % gop == 0) 'I' else 'M') }
          VideoDeltaFeat(d, ok, parsed.frames.size.toLong, parsed.w, parsed.h,
            parsed.frames.size.toLong, reconOk, gopOk,
            temporal_gain_ok = gvd.length < allI.length, seek_ok = seekOk,
            mc_recon_ok = mcReconOk,
            mc_gain_ok = mc.length < plainP.length)
        }
      }.toDF()
  }

  private val videoDeltaCodecSql =
    """SELECT doc_id,
      |  TRUE AS container_ok,
      |  CAST(6 + doc_id % 5 AS BIGINT) AS n_frames,
      |  CAST(16 + (doc_id % 2) * 8 AS INTEGER) AS width,
      |  CAST(16 AS INTEGER) AS height,
      |  CAST(6 + doc_id % 5 AS BIGINT) AS frames_decoded,
      |  TRUE AS recon_ok, TRUE AS gop_ok,
      |  TRUE AS temporal_gain_ok, TRUE AS seek_ok,
      |  TRUE AS mc_recon_ok, TRUE AS mc_gain_ok
      |FROM documents""".stripMargin

  final case class VideoLossyFeat(doc_id: Long, n_frames: Long,
      width: Int, height: Int, types_ok: Boolean, psnr_ok: Boolean,
      rd_size_monotone: Boolean, rd_psnr_monotone: Boolean,
      beats_lossless: Boolean, no_drift: Boolean, seek_ok: Boolean)

  /** LOSSY DCT+quantization video leg (r10, the r9 stretch): GVD1
    * 'K'/'R' frames — 8×8 DCT-II, IJG quality-scaled JPEG luminance
    * quant table, motion-compensated DCT-coded residuals, CLOSED-LOOP
    * prediction ([[graft.functions.DeltaVideo.writeLossy]]). Per doc:
    * a DCT-friendly synthetic scene (gradient + soft moving blob)
    * encodes at three qualities and the verdict booleans pin the
    * rate-distortion economics a 100 TB video pipeline plans around —
    * size AND min-PSNR strictly monotone in quality, the q50 stream
    * strictly below the LOSSLESS encoding of the same frames, PSNR >
    * 30 dB at q50, no drift across the GOP (closed loop), and
    * keyframe-seek equal to the full decode. Exact facts (counts,
    * dims) oracle-hash directly; verdicts ride as booleans the oracle
    * expects TRUE (the [[videoDeltaCodec]] discipline). Exchange-free
    * scan-parallel; per-row work is bounded by the fixed plane size.
    */
  def videoLossyCodec(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id")).as[ImgIn]
      .mapPartitions { batch =>
        batch.map { in =>
          val d = in.doc_id
          val nf = (6 + d % 5).toInt
          val w = (32 + (d % 2) * 16).toInt
          val h = 32
          val gop = 4
          def plane(f: Int): Array[Byte] = {
            val p = new Array[Byte](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val cx = (w / 4 + f * 2 + (d % 7)).toInt % w
                val d2 = (x - cx) * (x - cx) + (y - h / 2) * (y - h / 2)
                val blob = (80.0 * math.exp(-d2 / 40.0)).toInt
                val grad = (x * 140) / w + (y * 60) / h + (d % 11).toInt
                val v = 20 + grad + blob
                p(y * w + x) = (if (v > 255) 255 else v).toByte
                x += 1
              }
              y += 1
            }
            p
          }
          val frames = (0 until nf).map(plane)
          val qs = Seq(10, 50, 90)
          val encs = qs.map(q =>
            graft.functions.DeltaVideo.writeLossy(frames, w, h, gop, q))
          val sizes = encs.map(_.length)
          val parsed = graft.functions.DeltaVideo.read(encs(1))
          val dbs = parsed.frames.zip(frames).map { case (g, want) =>
            graft.functions.DeltaVideo.psnr(g, want) }
          val minDbs = qs.indices.map { i =>
            val p = graft.functions.DeltaVideo.read(encs(i))
            p.frames.zip(frames).map { case (g, want) =>
              graft.functions.DeltaVideo.psnr(g, want) }.min
          }
          val lossless = graft.functions.DeltaVideo.write(frames, w, h, gop)
          val mid = nf / 2
          VideoLossyFeat(d, parsed.frames.size.toLong, parsed.w, parsed.h,
            types_ok = parsed.frameTypes.zipWithIndex.forall { case (t, f) =>
              t == (if (f % gop == 0) 'K' else 'R') },
            psnr_ok = dbs.forall(_ > 30.0),
            rd_size_monotone = sizes(0) < sizes(1) && sizes(1) < sizes(2),
            rd_psnr_monotone = minDbs(0) < minDbs(1) && minDbs(1) < minDbs(2),
            beats_lossless = sizes(1) < lossless.length,
            no_drift = dbs.last > dbs(1) - 3.0,
            seek_ok = java.util.Arrays.equals(
              graft.functions.DeltaVideo.readGop(encs(1), mid),
              parsed.frames(mid)))
        }
      }.toDF()
  }

  private val videoLossyCodecSql =
    """SELECT doc_id,
      |  CAST(6 + doc_id % 5 AS BIGINT) AS n_frames,
      |  CAST(32 + (doc_id % 2) * 16 AS INTEGER) AS width,
      |  CAST(32 AS INTEGER) AS height,
      |  TRUE AS types_ok, TRUE AS psnr_ok,
      |  TRUE AS rd_size_monotone, TRUE AS rd_psnr_monotone,
      |  TRUE AS beats_lossless, TRUE AS no_drift, TRUE AS seek_ok
      |FROM documents""".stripMargin

  final case class DocMedia(doc_id: Long, text: String, lang: String,
      source: String)

  /** End-to-end multimodal ingest: REAL PNG components written into
    * WebDataset tar shards next to their text + metadata (the standard
    * image-caption training layout), read back through the distributed
    * binaryFile + tar-parse path, and decoded with the REAL JDK codec
    * off the storage read — features oracle-checked against the same
    * closed-form pixel arithmetic as `image_decode`, plus the shard
    * membership the tar filename carries. Any corruption in tar entry
    * framing, binary-vs-text handling, shard assignment, or codec
    * round-trip breaks the hash.
    *
    * Scale shape: encode is scan-parallel; the write's only exchange
    * is the by-shard repartition every sharded ingest pays once; the
    * read is one task per shard (how WebDataset loaders parallelize);
    * decode rides the read partitions — no further exchange.
    */
  def imageShardPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // fresh temp dir per invocation (the webdataset_roundtrip rationale)
    val out = trackedTempDir("graft_imgwds_")
    val withPng = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .as[DocMedia]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map(d => (d.doc_id, d.text, d.lang, d.source, pngFor(d.doc_id)))
      }.toDF("doc_id", "text", "lang", "source", "png")
    graft.sources.WebDataset.writeShards(withPng, out,
      samplesPerShard = 100, binaryComponents = Seq("png" -> "png"))
    graft.sources.WebDataset.readEntries(spark, out)
      .where(col("ext") === "png")
      .select(col("shard_file"), col("key"), col("data"))
      .as[(String, Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (shardFile, key, png) =>
          val f = decodeFeatures(key, png)
          (key, shardFile, f.width, f.height, f.png_valid,
            f.sum_r, f.sum_g, f.sum_b, f.px_checksum)
        }
      }
      .toDF("doc_id", "shard_file", "width", "height", "png_valid",
        "sum_r", "sum_g", "sum_b", "px_checksum")
      .select(col("doc_id"),
        // shard from the ACTUAL tar file the component came back from
        regexp_extract(col("shard_file"), "shard-(\\d+)\\.tar", 1)
          .cast("long").as("shard"),
        col("width"), col("height"), col("png_valid"),
        col("sum_r"), col("sum_g"), col("sum_b"), col("px_checksum"))
  }

  private val imageShardPipelineSql =
    """WITH px AS (
      |  SELECT doc_id, 8 + doc_id % 9 AS w, 4 + doc_id % 5 AS h,
      |    unnest(range((8 + doc_id % 9) * (4 + doc_id % 5))) AS i
      |  FROM documents),
      |v AS (
      |  SELECT doc_id, w, h, i,
      |    (doc_id * 7 + (i % w) * 31 + (i // w) * 131) % 256 AS r,
      |    (doc_id * 11 + (i % w) * 17 + (i // w) * 29) % 256 AS g,
      |    (doc_id * 13 + (i % w) * 23 + (i // w) * 37) % 256 AS b
      |  FROM px)
      |SELECT doc_id, doc_id // 100 AS shard,
      |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
      |  TRUE AS png_valid,
      |  CAST(SUM(r) AS BIGINT) AS sum_r,
      |  CAST(SUM(g) AS BIGINT) AS sum_g,
      |  CAST(SUM(b) AS BIGINT) AS sum_b,
      |  CAST(SUM((r * 65536 + g * 256 + b) * (i + 1)) AS BIGINT) AS px_checksum
      |FROM v GROUP BY doc_id, w, h""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("image_decode", imageDecode, Some(imageDecodeSql)),
    Op("image_shard_pipeline", imageShardPipeline, Some(imageShardPipelineSql),
      bench = true),
    Op("audio_decode", audioDecode, Some(audioDecodeSql)),
    Op("video_decode", videoDecode, Some(videoDecodeSql)),
    Op("video_delta_codec", videoDeltaCodec, Some(videoDeltaCodecSql)),
    Op("video_lossy_codec", videoLossyCodec, Some(videoLossyCodecSql)),
    Op("webdataset_roundtrip", webdatasetRoundtrip, Some(webdatasetRoundtripSql)),
    Op("multimodal_meta", multimodalMeta, Some(multimodalMetaSql)),
    Op("multimodal_frames", multimodalFrames, Some(multimodalFramesSql)),
    Op("multimodal_resize", multimodalResize, Some(multimodalResizeSql)),
    // typed mapPartitions batch path; the registered form flattens the
    // feature array into scalar hist_0..hist_7 columns (the driver
    // canonizer can't hash array cells) and is oracle-checked against
    // the list_reduce byte-fold SQL.
    Op("multimodal_decode_batch", (s, d) => {
      val df = decodeBatch(s, d).toDF()
      val hist = (0 until 8).map(i => col("feature").getItem(i).as(s"hist_$i"))
      df.select(col("media_id") +: col("n_bytes") +: col("checksum") +: hist: _*)
    }, Some(multimodalDecodeBatchSql)),
  )
}
