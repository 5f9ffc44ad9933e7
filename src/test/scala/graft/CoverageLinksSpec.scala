package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r14 batch 4: ngram_coverage, random_projection, graph_jaccard_links. */
class CoverageLinksSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }
  private def splitBucket(id: Long): Long = hash60(id.toString) % 10

  test("ngram_coverage: planted full-overlap and zero-overlap test docs") {
    val testId = (0L to 200L).find(splitBucket(_) == 9).get
    val otherTest = (testId + 1 to 400L).find(splitBucket(_) == 9).get
    val trainId = (0L to 200L).find(splitBucket(_) < 8).get
    val train = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // a strict substring of the train doc: every 3-gram is covered
    val contained = "beta gamma delta epsilon zeta eta"
    val fresh = "one two three four five six seven"
    import spark.implicits._
    val docs = Seq(
      (trainId, train, "en", "s0", train.length.toLong),
      (testId, contained, "en", "s0", contained.length.toLong),
      (otherTest, fresh, "en", "s0", fresh.length.toLong),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-cov").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("ngram_coverage")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(testId) == ((4L, 4L, 1.0)), s"contained doc: ${got(testId)}")
    assert(got(otherTest) == ((5L, 0L, 0.0)), s"fresh doc: ${got(otherTest)}")
  }

  test("random_projection matches the driver model and roughly preserves distances") {
    val x = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val signs = Array.tabulate(16, 64)((j, i) =>
      if (hash60(s"${j}_$i") % 2 == 0) 1.0 else -1.0)
    def r9(v: Double) =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def proj(v: Array[Double]): Array[Double] =
      Array.tabulate(16) { j =>
        var acc = 0.0
        var i = 0
        while (i < 64) { acc += v(i) * signs(j)(i); i += 1 }
        r9(acc / 4)
      }
    val got = SparkEntry.queries("random_projection")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.size == x.size * 16)
    x.foreach { case (id, v) =>
      val p = proj(v)
      (0 until 16).foreach(j => assert(got((id, j)) == p(j),
        s"vec $id dim $j: ${got((id, j))} != ${p(j)}"))
    }
    // JL sanity on 50 pairs: the estimator is UNBIASED — the mean
    // projected/original squared-distance ratio must sit near 1. (A
    // per-pair correlation check is meaningless here: the fixture's
    // near-isotropic vectors concentrate all pairwise distances, so
    // between-pair variation is pure projection noise.)
    def d2(a: Array[Double], b: Array[Double]) =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val ids = x.keys.toSeq.sorted.take(51)
    val ratios = ids.sliding(2).map { case Seq(a, b) =>
      d2(proj(x(a)), proj(x(b))) / d2(x(a), x(b))
    }.toSeq
    val meanRatio = ratios.sum / ratios.length
    assert(meanRatio > 0.8 && meanRatio < 1.2,
      s"sign projection must preserve distances in expectation, mean=$meanRatio")
  }

  test("graph_jaccard_links equals a driver-side common-neighbor model") {
    val edges = SparkEntry.queries("empiric_edges")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, g) => n -> g.map(_._2).toSet }
    def r9(v: Double) =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nodes = adj.keys.toSeq.sorted
    val want = (for {
      i <- nodes.indices.iterator
      j <- (i + 1) until nodes.length
      a = nodes(i); b = nodes(j)
      if !edges((a, b))
      cn = (adj(a) intersect adj(b)).size
      if cn >= 1
    } yield (a, b) -> ((cn.toLong,
      r9(cn.toDouble / (adj(a).size + adj(b).size - cn))))).toMap
    val got = SparkEntry.queries("graph_jaccard_links")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == want, s"${got.size} pairs vs ${want.size} expected")
  }
}
