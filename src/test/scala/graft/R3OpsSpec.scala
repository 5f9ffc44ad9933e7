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
