package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{BloomExpressions, GraftFunctions, ZOrder}
import graft.operators.Layout

/** Layout/pruning invariants the oracle can't express: the z-order
  * curve's locality (per-file min/max bounds BOTH dimensions) and the
  * bloom filter's no-false-negative + real-pruning guarantees.
  */
class LayoutSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("zorder: range-layout prunes on the second dimension where single-key sort cannot") {
    val parts = 8
    val li = Layout.zorderKey(spark, sf)
      .select(col("l_partkey").as("a"), col("l_suppkey").as("b"), col("z"))

    // per-range-partition (min,max) of b = the stats a parquet footer
    // would carry per file; a selective predicate on b reads only the
    // files whose [bmin,bmax] covers the value
    def bStats(keyed: org.apache.spark.sql.DataFrame): Array[(Long, Long)] =
      keyed.repartitionByRange(parts, col("k"))
        .select(spark_partition_id().as("p"), col("b"))
        .groupBy("p").agg(min("b").as("lo"), max("b").as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))

    val bVals = li.select(col("b")).distinct().collect().map(_.getLong(0))
    def avgTouched(stats: Array[(Long, Long)]): Double =
      bVals.map(v => stats.count { case (lo, hi) => lo <= v && v <= hi }).sum
        .toDouble / bVals.length

    val zTouched = avgTouched(bStats(li.withColumn("k", col("z"))))
    val aTouched = avgTouched(bStats(li.withColumn("k", col("a"))))
    // a-sorted files all span the full b domain → every b-query reads
    // all files; z-ordered files bound b, so most are skipped
    assert(aTouched > parts * 0.9,
      s"a-sorted layout should be unprunable on b: touched $aTouched/$parts")
    assert(zTouched * 2 < aTouched,
      s"z-order should at least halve files touched: z=$zTouched a=$aTouched")

    // normalized z stays a bijection on distinct (a, b) pairs here:
    // both domains are far below 2^16, so floor-scaling is injective
    val n = li.select(col("a"), col("b")).distinct().count()
    assert(li.select(col("z")).distinct().count() == n)
  }

  test("bloom: no false negatives, real pruning, exact join result") {
    val dim = Tables.part(spark, sf).where(col("p_size") < 15)
      .select(col("p_partkey"))
    val bloom = BloomExpressions.build(dim, col("p_partkey"),
      expectedItems = 1 << 14, fpp = 0.03)
    val li = Tables.lineitem(spark, sf)

    // every true key passes the filter (no false negatives)
    val trueKeys = li.join(dim, col("l_partkey") === col("p_partkey"), "left_semi")
    assert(trueKeys.where(!GraftFunctions.bloom_might_contain(
      col("l_partkey"), lit(bloom))).count() == 0)

    // the filter prunes a meaningful share of non-matching rows
    val total = li.count()
    val kept = li.where(GraftFunctions.bloom_might_contain(
      col("l_partkey"), lit(bloom))).count()
    val matches = trueKeys.count()
    assert(kept < total, "bloom must prune something")
    // false-positive rows among kept non-matches stay near fpp
    assert(kept - matches <= (total - matches) * 0.1 + 50,
      s"bloom fp blowup: kept=$kept matches=$matches total=$total")

    // pruned + exact semi-join == plain semi-join (exactness)
    val got = Layout.bloomPrune(spark, sf).orderBy("l_returnflag").collect()
    val want = li.join(dim, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_qty"))
      .orderBy("l_returnflag").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("hive-partitioned scan prunes partitions at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString + "/ev"
    Tables.events(spark, sf)
      .withColumn("day", to_date(col("ts")).cast("string"))
      .write.partitionBy("day").parquet(dir)
    val nDays = Tables.events(spark, sf)
      .select(to_date(col("ts"))).distinct().count()
    val pruned = spark.read.parquet(dir).where(col("day") === "2024-01-10")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      !plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1").trim.isEmpty,
      s"day predicate must become a partition filter: ${plan.take(1200)}")
    // the pruned scan reads one directory, not all of them
    assert(pruned.count() ==
      Tables.events(spark, sf).where(to_date(col("ts")) === "2024-01-10").count())
    assert(nDays > 1, "test data must actually span multiple partitions")
  }

  test("binaryFile source ingests raw bytes with glob pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bin")
    val a = dir.resolve("img_0.bin"); val b = dir.resolve("img_1.bin")
    val skip = dir.resolve("notes.txt")
    java.nio.file.Files.write(a, Array[Byte](1, 2, 3, 4))
    java.nio.file.Files.write(b, Array[Byte](9, 8, 7))
    java.nio.file.Files.write(skip, "not binary payload".getBytes)
    val df = graft.sources.Sources.binaryFiles(spark, dir.toString, "*.bin")
    val rows = df.select(col("path"), col("length"), col("content"))
      .collect().map(r => (r.getString(0).split('/').last, r.getLong(1),
        r.getAs[Array[Byte]](2).toSeq)).sortBy(_._1)
    assert(rows.length == 2, "glob must prune the .txt file at listing time")
    assert(rows(0) == (("img_0.bin", 4L, Seq[Byte](1, 2, 3, 4))))
    assert(rows(1) == (("img_1.bin", 3L, Seq[Byte](9, 8, 7))))
  }

  test("bloom probe stays codegen'd (no CodegenFallback in the filter stage)") {
    val dim = Tables.part(spark, sf).where(col("p_size") < 15)
      .select(col("p_partkey"))
    val bloom = BloomExpressions.build(dim, col("p_partkey"))
    val plan = Tables.lineitem(spark, sf)
      .where(GraftFunctions.bloom_might_contain(col("l_partkey"), lit(bloom)))
      .queryExecution.executedPlan
    // `*(n)` prefixes mark WholeStageCodegen fragments in treeString;
    // the probe filter must sit inside one, with no fallback anywhere
    val s = plan.treeString
    assert(s.contains("*(1)"), s)
    assert(!s.contains("CodegenFallback"), s)
  }
}
