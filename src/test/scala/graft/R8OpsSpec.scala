package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Recommend, Spatial, Stats}

/** Round-8 additions: inferential stats (chi², Mann-Whitney, OLS,
  * CUSUM, equi-depth), recommendation primitives (market basket,
  * item-item CF, RRF, skyline), sorted-neighborhood dedup, facility
  * kNN, geohash keys. The oracle harness pins cross-engine hashes;
  * these pin SEMANTICS on constructed fixtures where the right answer
  * is known in closed form, plus the published geohash golden.
  */
class R8OpsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("r8fix").toString

  private def writeDocs(dir: String, rows: Seq[(Long, String, String, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  // ---------------------------------------------------------------- stats

  test("chi_square: perfect 2x2 association gives chi2 = N, dof = 1") {
    val dir = tmp()
    writeDocs(dir,
      (1 to 10).map(i => (i.toLong, "t", "en", "src0")) ++
        (11 to 20).map(i => (i.toLong, "t", "de", "src1")))
    val r = Stats.chiSquare(spark, dir).collect().head
    assert(math.abs(r.getAs[Double]("chi2") - 20.0) < 1e-9)
    assert(r.getAs[Long]("dof") == 1L)
    assert(r.getAs[Long]("n") == 20L)
  }

  test("mann_whitney_u: disjoint samples give U = 0 and the closed-form z") {
    val dir = tmp()
    // n_chars = text length: src0 gets lengths {1,2,3}, src1 {4,5,6}
    writeDocs(dir, Seq(
      (1L, "a", "en", "src0"), (2L, "ab", "en", "src0"),
      (3L, "abc", "en", "src0"), (4L, "abcd", "en", "src1"),
      (5L, "abcde", "en", "src1"), (6L, "abcdef", "en", "src1")))
    val r = Stats.mannWhitneyU(spark, dir).collect().head
    assert(r.getAs[Double]("u_stat") == 0.0)
    // z = (0 - n0*n1/2) / sqrt(n0*n1/12 * (N+1)) with no ties
    assert(math.abs(r.getAs[Double]("z") - (-4.5 / math.sqrt(5.25))) < 1e-8)
  }

  test("ols_regression: exact line y = 2x + 1 recovers slope/intercept/r2") {
    import spark.implicits._
    val dir = tmp()
    (1 to 10).map(i => ("A", i.toLong, i, i.toDouble, 2.0 * i + 1.0))
      .toDF("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Stats.olsRegression(spark, dir).collect().head
    assert(r.getAs[Double]("slope") == 2.0)
    assert(r.getAs[Double]("intercept") == 1.0)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("cusum_changepoint: a level shift flags exactly the post-shift tail") {
    import spark.implicits._
    val dir = tmp()
    // 50 points at 0 then 50 at 1: mean .5, sd = sqrt(25/99), h = 20 sd
    // ≈ 10.050378; cusum after the shift grows by .5/point, so the
    // first flagged event is id 71 (0.5 * 21 = 10.5 > h), 30 rows total
    (1 to 100).map(i =>
        (i.toLong, new Timestamp(1700000000000L + i * 1000L), "t",
          if (i <= 50) 0.0 else 1.0))
      .toDF("event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Stats.cusumChangepoint(spark, dir).collect()
    assert(got.length == 30)
    assert(got.map(_.getAs[Long]("event_id")).min == 71L)
    assert(got.forall(_.getAs[Long]("event_id") > 70L))
  }

  test("equi_depth_histogram: 20 uniform rows split into 10 buckets of 2") {
    import spark.implicits._
    val dir = tmp()
    (1 to 20).map(i => ("A", i.toLong, i, i.toDouble, i.toDouble))
      .toDF("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Stats.equiDepthHistogram(spark, dir).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_rows"),
        r.getAs[Double]("lo"), r.getAs[Double]("hi")))
      .sortBy(_._1)
    assert(got.length == 10)
    assert(got.forall(_._2 == 2L))
    assert(got.head == ((1L, 2L, 1.0, 2.0)))
    assert(got.last == ((10L, 2L, 19.0, 20.0)))
  }

  // ------------------------------------------------------- recommendation

  private def writeBaskets(dir: String,
      orders: Seq[(Long, Long)], items: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    orders.map { case (o, c) => (o, c, 10.0) }
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    items.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  test("market_basket: closed-form support/confidence/lift on 3 baskets") {
    val dir = tmp()
    writeBaskets(dir,
      orders = Seq((1L, 1L), (2L, 2L), (3L, 3L)),
      items = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L), (3L, 10L),
        (3L, 30L)))
    val got = Recommend.marketBasket(spark, dir).collect()
      .map(r => (r.getAs[Long]("ante"), r.getAs[Long]("cons"),
        r.getAs[Long]("pair_cnt"), r.getAs[Double]("support"),
        r.getAs[Double]("confidence"), r.getAs[Double]("lift")))
      .sortBy(t => (t._1, t._2))
    // only {10,20} co-occurs twice; A=10 in 3 baskets, B=20 in 2
    assert(got.toSeq == Seq(
      (10L, 20L, 2L, 0.666666667, 0.666666667, 1.0),
      (20L, 10L, 2L, 0.666666667, 1.0, 1.0)))
  }

  test("item_item_cosine: identical 2-item histories give cosine 1.0") {
    val dir = tmp()
    // 4 users, each history {10, 20} via one order apiece
    writeBaskets(dir,
      orders = (1 to 4).map(i => (i.toLong, i.toLong)),
      items = (1 to 4).flatMap(i => Seq((i.toLong, 10L), (i.toLong, 20L))))
    val got = Recommend.itemItemCosine(spark, dir).collect()
      .map(r => (r.getAs[Long]("item_a"), r.getAs[Long]("item_b"),
        r.getAs[Long]("co"), r.getAs[Double]("cosine"), r.getAs[Long]("rk")))
    assert(got.toSeq == Seq((10L, 20L, 4L, 1.0, 1L)))
  }

  test("rrf_fusion: the doc leading both rankings fuses to rank 1 at 2/61") {
    val dir = tmp()
    writeDocs(dir, Seq(
      (1L, "spark spark table table", "en", "s"),
      (2L, "spark table x", "en", "s"),
      (3L, "y z", "en", "s")))
    val top = Recommend.rrfFusion(spark, dir).collect()
      .map(r => (r.getAs[Long]("rk"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("rrf"))).sortBy(_._1)
    assert(top.head._2 == 1L)
    assert(math.abs(top.head._3 - 0.032786885) < 1e-9)
    assert(top.length == 3)
  }

  test("skyline_frontier: dominated points drop, frontier survives") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 2.0))
      .toDF("c_custkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((101L, 1L, 10.0), (102L, 2L, 20.0), (103L, 3L, 1.0), (104L, 4L, 5.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Recommend.skylineFrontier(spark, dir).collect()
      .map(_.getAs[Long]("c_custkey")).sorted
    // (1,10) dominated by (2,20); (4,2.0/5.0) dominated by (2,20)
    assert(got.toSeq == Seq(2L, 3L))
  }

  // --------------------------------------------------- dedup / spatial

  test("sorted_neighborhood: identical same-block docs pair at distance 0") {
    val dir = tmp()
    writeDocs(dir, Seq(
      (1L, "aaa bbb ccc", "en", "s"),
      (2L, "aaa bbb ccc", "en", "s"),
      (3L, "zzz yyy xxx qqq ppp", "de", "s")))
    val got = Dedup.sortedNeighborhood(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("offset"), r.getAs[Long]("dist")))
    assert(got.toSeq == Seq((1L, 2L, 1L, 0L)))
  }

  test("geo_knn_join: a point inside tile (0,0) ranks F_0_0 first") {
    import spark.implicits._
    val dir = tmp()
    // custkey 260 -> y = 2.6; acctbal 2.6 -> x = 2.6
    Seq((260L, 2.6)).toDF("c_custkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = Spatial.geoKnnJoin(spark, dir).collect()
      .map(r => (r.getAs[Long]("rk"), r.getAs[String]("fac_id"),
        r.getAs[Double]("dist2"))).sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq("F_0_0", "F_0_1", "F_1_0"))
    // dist2 to F_0_0 = 2 * 0.095^2
    assert(math.abs(got.head._3 - 2 * 0.095 * 0.095) < 1e-9)
  }

  test("geohash: published golden u4pruydq for (57.64911, 10.40744)") {
    import graft.functions.GeoHash
    val gh = spark.range(1)
      .select(GeoHash.encode8(
        GeoHash.interleaved(lit(57.64911), lit(10.40744))).as("gh"))
      .collect().head.getString(0)
    assert(gh == "u4pruydq")
  }

  test("geohash: gh4 prefix groups nearby points, separates far ones") {
    import graft.functions.GeoHash
    import spark.implicits._
    val got = Seq((10.0, 10.0), (10.001, 10.001), (-40.0, 120.0))
      .toDF("lat", "lon")
      .select(substring(GeoHash.encode8(
        GeoHash.interleaved(col("lat"), col("lon"))), 1, 4).as("g"))
      .collect().map(_.getString(0))
    assert(got(0) == got(1) && got(0) != got(2))
  }
}
