package graft.sources

import java.io.{BufferedOutputStream, ByteArrayInputStream, File, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream, TarArchiveOutputStream}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar shards — the de-facto storage layout for
  * multimodal LLM training data (a tar archive per shard; one sample =
  * adjacent entries sharing a basename, `<key>.txt`, `<key>.json`,
  * `<key>.jpg`, ...; loaders stream shards sequentially). This module
  * implements the layout with plain `commons-compress` (ships with
  * Spark) — no codecs required: components are opaque bytes, exactly
  * how [[graft.operators.Multimodal]] treats media columns.
  *
  * Write path: rows repartition BY SHARD and sort within partitions on
  * (shard, key), so each task streams its shards' samples in order and
  * writes whole tar files executor-side with a tmp-file + atomic-rename
  * finish (the [[Pickle]] discipline — a reader never observes a
  * half-written shard). Shard assignment is `key div samplesPerShard` —
  * deterministic, reproducible across runs and cluster sizes.
  *
  * Read path: `binaryFile` source over `*.tar` (distributed: one task
  * per shard — exactly how WebDataset loaders parallelize), entries
  * parsed per-partition, samples reassembled by key with `.txt` and
  * `.json` components pivoted back to columns.
  *
  * Reference context: the reference serializes simulation artifacts as
  * single binary blobs (scripts/SimulationManager.py); tar-shard
  * sample streams are the corpus-scale generalization a 100 TB
  * multimodal ingest actually uses.
  */
object WebDataset {

  /** Write (doc_id, text, lang, source) rows as tar shards of
    * `samplesPerShard` samples: `<doc_id>.txt` carries the text bytes,
    * `<doc_id>.json` the metadata. `binaryComponents` adds one tar
    * entry per (BINARY column, extension) pair — `<doc_id>.<ext>` —
    * which is how real multimodal samples (`.png`, `.flac`, ...) ride
    * next to their captions in this layout.
    *
    * FILESYSTEM ASSUMPTION (ADVICE r7): shards are written
    * executor-side with java.io into `outDir`, so driver and
    * executors must share a filesystem — true in local mode and on
    * shared-NFS clusters, NOT on HDFS/S3. The SHAPE (by-shard
    * repartition, one sequential tar stream per shard, atomic
    * tmp-then-rename publish) is the scale-correct part and survives
    * a port of the byte sink to the Hadoop FileSystem API (create →
    * rename), which is the deployment step for object-store output;
    * the parallelism analysis in the class doc is about that shape,
    * not this local byte sink.
    */
  def writeShards(df: DataFrame, outDir: String,
      samplesPerShard: Int = 100,
      binaryComponents: Seq[(String, String)] = Nil): Unit = {
    new File(outDir).mkdirs()
    val rows = df
      .select(Seq(expr(s"doc_id div $samplesPerShard").as("shard"),
        col("doc_id"),
        col("text"),
        to_json(struct(col("doc_id"), col("lang"), col("source"))).as("meta"))
        ++ binaryComponents.map { case (c, _) => col(c) }: _*)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
    rows.foreachPartition { (it: Iterator[Row]) =>
      var cur = Long.MinValue
      var tmp: File = null
      var tar: TarArchiveOutputStream = null
      def close(): Unit = if (tar != null) {
        tar.finish(); tar.close()
        val dst = new File(tmp.getParentFile, f"shard-$cur%05d.tar")
        if (!tmp.renameTo(dst)) {
          dst.delete()
          if (!tmp.renameTo(dst))
            throw new java.io.IOException(s"rename failed: $dst")
        }
        tar = null
      }
      def entry(name: String, bytes: Array[Byte]): Unit = {
        val e = new TarArchiveEntry(name)
        e.setSize(bytes.length.toLong)
        tar.putArchiveEntry(e)
        tar.write(bytes)
        tar.closeArchiveEntry()
      }
      it.foreach { r =>
        val shard = r.getLong(0)
        if (shard != cur) {
          close()
          cur = shard
          tmp = File.createTempFile(f"shard-$cur%05d", ".tmp", new File(outDir))
          tar = new TarArchiveOutputStream(
            new BufferedOutputStream(new FileOutputStream(tmp)))
          tar.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
        }
        val key = r.getLong(1)
        entry(s"$key.txt", r.getString(2).getBytes(UTF_8))
        entry(s"$key.json", r.getString(3).getBytes(UTF_8))
        binaryComponents.zipWithIndex.foreach { case ((_, ext), i) =>
          entry(s"$key.$ext", r.getAs[Array[Byte]](4 + i))
        }
      }
      close()
    }
    // deterministic java.io presence check right after the action: if
    // the write really produced nothing the caller gets THIS message,
    // not a downstream empty-listing mystery (and a non-empty input
    // with zero shards can only be a write failure)
    val shards = Option(new File(outDir).list()).getOrElse(Array.empty)
      .count(_.endsWith(".tar"))
    require(shards > 0 || df.isEmpty,
      s"writeShards: no .tar files landed in $outDir after the write action")
  }

  /** Raw entry stream: one row per tar entry across all shards —
    * (shard file name, sample key, component extension, bytes).
    */
  def readEntries(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // The lazy pathGlobFilter load silently returns an EMPTY dataset
    // for an existing-but-tar-less directory (wrong path, stale dir,
    // reader used without the writer) — the writer's post-write
    // assertion only covers same-process read-after-write. Mirror the
    // writer's java.io listing here so an independent reader still
    // fails loudly, with a short retry so the transient empty-listing
    // IO stall that motivated dropping the glob can't re-fire as a
    // spurious driver-side throw.
    val hasTar = (1 to 3).exists { attempt =>
      if (attempt > 1) Thread.sleep(100L * attempt)
      Option(new File(dir).list()).exists(_.exists(_.endsWith(".tar")))
    }
    require(hasTar, s"readEntries: no .tar shards present in $dir " +
      "(wrong path, or the writer never ran?)")
    // option-filter, not a path glob: glob RESOLUTION throws at
    // analysis when a concurrent-JVM IO stall makes the listing come
    // back empty (observed once under a parallel parity run), while a
    // directory load with pathGlobFilter lists lazily and the
    // post-write assertion in the writers already guarantees presence
    spark.read.format("binaryFile").option("pathGlobFilter", "*.tar").load(dir)
      .select(regexp_extract(col("path"), "[^/]+$", 0).as("shard_file"),
        col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (shardFile, bytes) =>
          val tin = new TarArchiveInputStream(new ByteArrayInputStream(bytes))
          Iterator.continually(tin.getNextEntry)
            .takeWhile(_ != null)
            .filter(e => !e.isDirectory)
            .map { e =>
              val buf = new Array[Byte](e.getSize.toInt)
              var off = 0
              while (off < buf.length) {
                val n = tin.read(buf, off, buf.length - off)
                require(n >= 0, s"truncated tar entry ${e.getName}")
                off += n
              }
              val name = e.getName
              val dot = name.lastIndexOf('.')
              (shardFile, name.substring(0, dot).toLong,
                name.substring(dot + 1), buf)
            }.toList
        }
      }
      .toDF("shard_file", "key", "ext", "data")
  }

  /** Reassembled samples: one row per key with the text and JSON
    * metadata components back as columns.
    */
  def readSamples(spark: SparkSession, dir: String): DataFrame =
    readEntries(spark, dir)
      .groupBy(col("key"))
      .agg(
        min(col("shard_file")).as("shard_file"),
        count(lit(1)).as("n_components"),
        max(when(col("ext") === "txt", col("data"))).as("txt"),
        max(when(col("ext") === "json", col("data"))).as("json"))
      .select(col("key").as("doc_id"), col("shard_file"), col("n_components"),
        col("txt").cast("string").as("text"),
        get_json_object(col("json").cast("string"), "$.lang").as("lang"),
        get_json_object(col("json").cast("string"), "$.source").as("source"))
}
