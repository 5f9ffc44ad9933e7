package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Curation, Joins, TextAnalysis}

/** Round-9 additions: Q18/Q9 join shapes, sparse-cosine doc pairs,
  * and hash-gated importance sampling. Oracle parity pins cross-engine
  * hashes; these pin closed-form semantics on constructed fixtures.
  */
class R9OpsSpec extends AnyFunSuite {

  private val sf001 = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("fx"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("q18_large_orders: every row clears the threshold, capped and ordered") {
    val got = Joins.q18LargeOrders(spark, sf001).collect()
    assert(got.nonEmpty && got.length <= 100)
    assert(got.forall(_.getAs[Double]("sum_qty") > 150.0))
    val prices = got.map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sortBy(-_)), "descending by totalprice")
  }

  test("q9_profit_by_nation: group totals re-add to the red-part line count") {
    val got = Joins.q9ProfitByNation(spark, sf001).collect()
    val nItems = got.map(_.getAs[Long]("n_items")).sum
    val want = Tables.lineitem(spark, sf001)
      .join(Tables.part(spark, sf001).where(col("p_name").contains("red")),
        col("l_partkey") === col("p_partkey"))
      .count()
    assert(nItems == want, s"grouped n_items $nItems != direct count $want")
    assert(got.forall(_.getAs[Double]("profit") > 0.0))
  }

  test("sparse_cosine_pairs: identical docs hit cosine 1.0, disjoint docs never pair") {
    val dir = java.nio.file.Files.createTempDirectory("r9cos").toString
    writeDocs(dir, Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta iota kappa"),
      (4L, "alpha beta gamma nu xi")))
    val got = TextAnalysis.sparseCosinePairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("cosine")).toMap
    assert(got((1L, 2L)) == 1.0, s"identical docs must score 1.0: $got")
    assert(!got.keySet.exists { case (a, b) => a == 3L || b == 3L },
      "doc 3 shares no 3-gram with anyone")
    // docs 1 and 4 share exactly one 3-gram (alpha beta gamma), each
    // has 3 grams all tf=1: cos = 1/sqrt(3*3) = 1/3
    assert(math.abs(got((1L, 4L)) - 1.0 / 3).abs < 1e-9)
  }

  test("q4_priority_check: counts orders once regardless of line multiplicity") {
    val got = Joins.q4PriorityCheck(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // direct recomputation: distinct windowed orders with >=1 deep line
    val want = Tables.orders(spark, sf001)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .join(Tables.lineitem(spark, sf001).where(col("l_discount") > 0.05)
        .select(col("l_orderkey")).distinct(),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"semi-join must equal distinct-then-join: $got vs $want")
  }

  test("q12_line_classes: high+low partitions every windowed line") {
    val got = Joins.q12LineClasses(spark, sf001).collect()
    val total = got.map(r => r.getAs[Long]("high_line_count")
      + r.getAs[Long]("low_line_count")).sum
    val want = Tables.lineitem(spark, sf001)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(spark, sf001), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(total == want, "every joined line lands in exactly one bucket")
  }

  test("q14_promo_share: share is promo/total of the same revenue") {
    val r = Joins.q14PromoShare(spark, sf001).collect()(0)
    val (share, promo, tot) = (r.getAs[Double]("promo_share_pct"),
      r.getAs[Double]("promo_rev"), r.getAs[Double]("total_rev"))
    assert(share >= 0.0 && share <= 100.0)
    assert(math.abs(share - 100.0 * promo / tot) < 1e-6)
    assert(promo <= tot)
  }

  test("hard_negatives: every mined negative crosses the label boundary") {
    val got = graft.operators.Similarity.hardNegatives(spark, sf001).collect()
    assert(got.nonEmpty)
    assert(got.forall(r => r.getAs[Int]("qlabel") != r.getAs[Int]("clabel")),
      "a hard negative must have a different label than its probe")
    val perQuery = got.groupBy(_.getAs[Long]("query_id"))
    perQuery.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Int]("rnk")).sorted.sameElements(1 to rows.length))
      val cosines = rows.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("cosine"))
      assert(cosines.sameElements(cosines.sortBy(-_)), "ranked by similarity desc")
    }
  }

  test("sssp_bounded: seeds at 0; costs bracket the unit-cost BFS depth") {
    val sssp = graft.operators.GraphMetrics.ssspBounded(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bfs = graft.operators.GraphMetrics.graphBfsDepth(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sssp.nonEmpty)
    sssp.filter(_._1 % 50 == 0).foreach { case (n, d) =>
      assert(d == 0L, s"seed $n must be at distance 0") }
    // same 3-round reachability; per-edge cost ∈ [1,3] brackets depth
    assert(sssp.keySet == bfs.keySet)
    sssp.foreach { case (n, d) =>
      assert(d >= bfs(n) && d <= 3 * bfs(n).max(0L) + 0L
        || (bfs(n) == 0L && d == 0L), s"node $n: dist $d vs depth ${bfs(n)}")
    }
  }

  // transformWithState requires the multi-column-family (RocksDB)
  // state store; scope the provider to these tests like StreamingSpec
  private def withRocksDb[T](f: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming heavy hitters: sub-capacity regime matches exact counts across micro-batches") { withRocksDb {
    import graft.streaming.StreamingHeavyHitters
    val dir = java.nio.file.Files.createTempDirectory("r9hh").toString + "/docs"
    val docs = Tables.documents(spark, sf001).select(col("doc_id"), col("text")).cache()
    // two files => two micro-batches => the second batch's summaries
    // must carry the first batch's state forward
    docs.where(col("doc_id") % 2 === 0).coalesce(1).write.parquet(dir)
    docs.where(col("doc_id") % 2 === 1).coalesce(1).write.mode("append").parquet(dir)
    val q = StreamingHeavyHitters.trendingTokens(spark, dir)
      .writeStream.outputMode("update").format("memory").queryName("hh_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    // the corpus vocabulary is far below bucket capacity, so no
    // decrement ever fires and estimates only grow: the max emission
    // per token IS the exact whole-stream count
    val streamed = spark.table("hh_out")
      .groupBy(col("token")).agg(max(col("est")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs.select(explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("token")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == exact,
      s"sub-capacity MG must be exact: ${streamed.size} vs ${exact.size} tokens")
  } }

  test("streaming heavy hitters: over-capacity shard still surfaces the heavy token") { withRocksDb {
    import spark.implicits._
    import graft.streaming.StreamingHeavyHitters
    val dir = java.nio.file.Files.createTempDirectory("r9hh2").toString + "/docs"
    // one heavy token (40%) + 6 light ones through a capacity-2 summary
    val text = (Seq.fill(40)("heavy") ++ (1 to 60).map(i => s"w${i % 6}"))
      .mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text").write.parquet(dir)
    val q = StreamingHeavyHitters.trendingTokens(spark, dir,
        buckets = 1, capacity = 2)
      .writeStream.outputMode("update").format("memory").queryName("hh2_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.table("hh2_out").select("token")
      .collect().map(_.getString(0)).toSet
    // true count 40 > 100/(2+1) => MG guarantees presence
    assert(kept.contains("heavy"), s"guaranteed heavy hitter missing from $kept")
  } }

  test("grouped_topk_agg: heap aggregate equals the window idiom row-for-row") {
    import org.apache.spark.sql.expressions.Window
    val got = graft.operators.Analytics.groupedTopkAgg(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id").asc)
    val want = Tables.events(spark, sf001)
      .where(col("value").isNotNull)
      .select(col("event_type"), col("value"), col("event_id"),
        org.apache.spark.sql.functions.row_number().over(w).cast("long").as("rnk"))
      .where(col("rnk") <= 5)
      .collect()
      .map(r => (r.getString(0), r.getLong(3), r.getDouble(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("prorate_exact: per-order cent allocations sum exactly to the order total") {
    val alloc = graft.operators.Scaling.prorateExact(spark, sf001)
    val sums = alloc.groupBy(col("l_orderkey"))
      .agg(sum(col("alloc_cents")).as("s"))
    val want = Tables.orders(spark, sf001)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val off = sums.join(want, col("l_orderkey") === col("o_orderkey"))
      .where(col("s") =!= col("cents"))
    assert(off.count() == 0, "largest-remainder must land exactly on the total")
    assert(alloc.where(col("alloc_cents") < 0).count() == 0)
  }

  test("importance_sample: weight-1 docs always survive; gate is deterministic") {
    val a = Curation.importanceSample(spark, sf001)
      .collect().map(_.getLong(0)).sorted
    val b = Curation.importanceSample(spark, sf001)
      .collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b), "hash gate must be reproducible")
    val full = Tables.documents(spark, sf001)
      .where(col("n_chars") >= 400).count()
    val keptFull = Curation.importanceSample(spark, sf001)
      .where(col("n_chars") >= 400).count()
    assert(keptFull == full, "weight saturates at 1.0 => always kept")
    // the sample must actually drop something below saturation
    val below = Tables.documents(spark, sf001).where(col("n_chars") < 400).count()
    val keptBelow = Curation.importanceSample(spark, sf001)
      .where(col("n_chars") < 400).count()
    assert(keptBelow < below, "sub-saturation docs must be thinned")
  }
}
