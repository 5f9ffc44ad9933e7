package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Curation, GraphMetrics, Similarity}
import graft.sources.Sources

/** Round-3 operators: shard packing, PageRank, int8 quantization,
  * JSONL shard sink. Oracle parity is the driver's gate; these specs
  * pin the invariants the oracle can't express.
  */
class R3OpsSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("shard_pack: distributed prefix-sum equals the single-window reference") {
    val got = Curation.shardPack(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // reference: one global cumsum in doc order (bucket, h, doc_id)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (id, _, h) => (h % 64, h, id) }
    var cum = 0L
    val want = docs.map { case (id, n, _) =>
      val shard = cum / 1000L
      cum += n
      (id, n, shard)
    }
    assert(got.sorted.toSeq == want.sorted.toSeq)
    // every shard except the last crosses the budget exactly once
    val perShard = want.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    val last = perShard.keys.max
    perShard.foreach { case (s, tot) =>
      if (s != last) assert(tot >= 1000L - docs.map(_._2).max, s"shard $s underfull: $tot")
    }
  }

  test("pagerank: mass conserved and strictly positive") {
    val pr = GraphMetrics.pagerank(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.nonEmpty)
    assert(pr.values.forall(_ > 0))
    // undirected graph => no dangling mass: sum = 0.15 + 0.85 = 1
    assert(math.abs(pr.values.sum - 1.0) < 1e-6,
      s"pagerank mass drifted: ${pr.values.sum}")
  }

  test("embedding_quantize: q in [-127,127], max lane hits 127, rmse < half-step") {
    val rows = Similarity.embeddingQuantize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getDouble(2)
      val l1 = r.getLong(4)
      val rmse = r.getDouble(5)
      assert(scale > 0)
      // |v_i| <= 127*scale => every |q_i| <= 127; l1 bounds follow
      assert(l1 <= 127L * r.getLong(1))
      // per-lane error of round() is <= scale/2
      assert(rmse <= scale / 2 + 1e-12, s"rmse $rmse vs scale $scale")
    }
    // the arg-max lane quantizes to exactly +/-127 somewhere
    val q = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).limit(1).collect()(0)
    val v = q.getSeq[Float](1).map(_.toDouble)
    val scale = v.map(math.abs).max / 127.0
    assert(v.map(x => math.round(x / scale)).map(math.abs).max == 127L)
  }

  test("ORC sink/source round-trips with schema intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString + "/t"
    val docs = Tables.documents(spark, sf)
    Sources.writeOrc(docs, dir)
    val back = Sources.orc(spark, dir)
    assert(back.schema == docs.schema)
    assert(back.count() == docs.count())
  }

  test("overwritePartitions rewrites only the partitions present in the frame") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_dyn").toString + "/t"
    val day1 = Seq((1L, "a", "d1"), (2L, "b", "d1")).toDF("id", "v", "day")
    val day2 = Seq((3L, "c", "d2")).toDF("id", "v", "day")
    Sources.writePartitioned(day1.unionByName(day2), root, Seq("day"))
    // re-run day2 with corrected data: day1 must survive
    val day2Fixed = Seq((3L, "c2", "d2"), (4L, "d", "d2")).toDF("id", "v", "day")
    Sources.overwritePartitions(day2Fixed, root, Seq("day"))
    val got = spark.read.parquet(root)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1L, "a", "d1"), (2L, "b", "d1"),
      (3L, "c2", "d2"), (4L, "d", "d2")))
  }

  test("compactParquet lands the target file count with content intact") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val in = base + "/in"
    val out = base + "/out"
    val docs = Tables.documents(spark, sf)
    docs.repartition(16).write.parquet(in)
    Sources.compactParquet(spark, in, out, targetFiles = 2)
    def parts(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(parts(in) == 16)
    assert(parts(out) == 2)
    assert(spark.read.parquet(out).count() == docs.count())
  }

  test("permissive JSONL source quarantines corrupt lines instead of failing") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_badjson").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir + "/part-0.json"),
      """{"doc_id": 1, "text": "good"}
        |{"doc_id": 2 "text": "missing comma"}
        |{"doc_id": 3, "text": "also good"}
        |""".stripMargin.getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    // Spark disallows querying ONLY the corrupt column straight off the
    // raw file (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN);
    // materialize the parse once, as the error message prescribes
    val df = Sources.readJsonlPermissive(spark, dir, schema).cache()
    assert(df.count() == 3, "no line may be dropped or kill the read")
    assert(df.where(col("_corrupt").isNotNull).count() == 1)
    assert(df.where(col("_corrupt").isNull).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("mergeSchema reads a schema-evolved parquet dataset with null backfill") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a")).toDF("id", "v").write.parquet(base + "/w1")
    Seq((2L, "b", 9.5)).toDF("id", "v", "score").write.parquet(base + "/w2")
    val merged = Sources.parquetMergeSchema(spark, base + "/w1", base + "/w2")
    assert(merged.columns.toSet == Set("id", "v", "score"))
    val rows = merged.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSet
    assert(rows == Set((1L, None), (2L, Some(9.5))),
      "pre-evolution files must read the new column as null")
  }

  test("JSONL shard sink round-trips and shards deterministically") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("source"))
    Sources.writeJsonl(docs, dir, shards = 4, shardKey = "doc_id")
    val back = Sources.readJsonl(spark, dir)
    assert(back.count() == docs.count())
    // content survives byte-exact (join on id, compare text)
    val mismatched = docs.alias("a")
      .join(back.alias("b"), col("a.doc_id") === col("b.doc_id"))
      .where(col("a.text") =!= col("b.text"))
      .count()
    assert(mismatched == 0)
    val parts = new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".json"))
    assert(parts == 4, s"expected 4 shard files, got $parts")
  }
}
