package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WebDataset tar shards: the oracle row pins the round-trip values;
  * these pin the FORMAT — the shards must be standard tar that real
  * Python tooling (the authority WebDataset loaders build on) can
  * read, with samples adjacent and in key order inside each shard.
  */
class WebDatasetSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def python(code: String): Option[String] =
    try {
      val pb = new ProcessBuilder("python3", "-c", code)
      pb.redirectErrorStream(true)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
      if (p.waitFor() == 0) Some(out) else None
    } catch { case _: java.io.IOException => None }

  private lazy val havePython = python("print(1)").contains("1")

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-wds").toString
    graft.sources.WebDataset.writeShards(
      Tables.documents(spark, sf), d, samplesPerShard = 100)
    d
  }

  test("shards round-trip text and metadata byte-exactly") {
    val dir = freshDir()
    val orig = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3))))
      .toMap
    val back = graft.sources.WebDataset.readSamples(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(3), r.getString(4), r.getString(5))))
      .toMap
    assert(back == orig)
  }

  test("shards are standard tar: CPython tarfile reads them, samples adjacent in key order") {
    assume(havePython, "python3 not available")
    val dir = freshDir()
    val out = python(
      s"""
         |import tarfile, glob, json
         |names_ok, order_ok, pairs = True, True, 0
         |for path in sorted(glob.glob("$dir/*.tar")):
         |    with tarfile.open(path) as t:
         |        members = t.getmembers()
         |        keys = [int(m.name.split(".")[0]) for m in members]
         |        exts = [m.name.split(".")[1] for m in members]
         |        # adjacency: entries come in (txt, json) pairs per key
         |        for i in range(0, len(members), 2):
         |            if keys[i] != keys[i+1] or {exts[i], exts[i+1]} != {"txt", "json"}:
         |                names_ok = False
         |            pairs += 1
         |        # keys strictly increase across samples within a shard
         |        sample_keys = keys[0::2]
         |        if sample_keys != sorted(sample_keys):
         |            order_ok = False
         |        # metadata parses as JSON and matches the key
         |        m = members[1]
         |        meta = json.load(t.extractfile(m))
         |        if meta["doc_id"] != keys[1]:
         |            names_ok = False
         |print(names_ok, order_ok, pairs)
         |""".stripMargin)
    assert(out.contains("True True 500"),
      s"python tarfile verdict: $out")
  }

  test("each shard holds exactly its 100-key range") {
    val dir = freshDir()
    val got = graft.sources.WebDataset.readEntries(spark, dir)
      .select(col("shard_file"), col("key")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    got.foreach { case (f, k) =>
      val shard = f.stripPrefix("shard-").stripSuffix(".tar").toLong
      assert(k / 100 == shard, s"key $k landed in $f")
    }
    assert(got.map(_._1).distinct.length == 5, "500 docs / 100 per shard")
  }
}
