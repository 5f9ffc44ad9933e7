package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TpchMore

/** Round-11 additions: the remaining adaptable TPC-H shapes
  * (operators/TpchMore.scala). Oracle parity pins cross-engine hashes
  * at both SFs; these pin the decorrelation SEMANTICS on the data
  * itself (each subquery's defining invariant re-checked directly)
  * and the scale-critical plan shapes (no per-row subqueries, no
  * cartesians, correlated quantifiers fully decorrelated).
  */
class TpchMoreSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def finalPlan(name: String, sfDir: String = sf): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q6: pure scan-aggregate — no join, no shuffle beyond the scalar merge") {
    val p = finalPlan("q6_forecast_revenue")
    assert(!p.contains("Join"), "Q6 must never join")
    // every predicate reaches the parquet scan
    assert(p.contains("PushedFilters:") && p.contains("l_shipdate")
      && p.contains("l_quantity"), p.take(1500))
  }

  test("q2: min-cost join-back — each result row sits at its part's true minimum") {
    val out = TpchMore.q2MinCostSupplier(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // recompute each part's min unit cost directly and compare
    val mins = Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(round(col("l_extendedprice").cast("double")
        / col("l_quantity").cast("double"), 9)).as("uc"))
      .groupBy(col("l_partkey")).agg(min(col("uc")).as("true_min"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val pk = r.getAs[Long]("p_partkey")
      assert(r.getAs[Double]("min_cost") == mins(pk),
        s"part $pk not at its minimum")
    }
  }

  test("q13: left-join predicate keeps zero-order customers; histogram covers all") {
    val out = TpchMore.q13CustDist(spark, sf).collect()
    val total = out.map(_.getAs[Long]("custdist")).sum
    val nCust = Tables.customer(spark, sf).count()
    assert(total == nCust,
      s"every customer must land in exactly one bucket ($total != $nCust)")
  }

  test("q15: returned supplier(s) hold exactly the maximum quarter revenue") {
    val out = TpchMore.q15TopSupplier(spark, sf).collect()
    assert(out.nonEmpty)
    val revs = out.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length == 1, "all returned rows must share the max revenue")
  }

  test("q17: every counted line is under half its part's average quantity") {
    // closed form on a fixture-free invariant: recompute the count the
    // slow way (per-row avg lookup) and compare
    val avgByPart = Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey").as("k"))
      .agg(avg(col("l_quantity").cast("double")).as("a"))
    val slow = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).where(col("p_brand") === "Brand#23"),
        col("l_partkey") === col("p_partkey"))
      .join(avgByPart, col("l_partkey") === col("k"))
      .where(col("l_quantity").cast("double") < lit(0.5) * col("a"))
      .count()
    val fast = TpchMore.q17SmallQtyRevenue(spark, sf)
      .collect()(0).getAs[Long]("n_lines")
    assert(fast == slow, s"decorrelated count $fast != direct count $slow")
  }

  test("q21: only-late-supplier semantics hold for every returned supplier") {
    val out = TpchMore.q21WaitingOrders(spark, sf).collect()
    // the decorrelated result must match a direct per-order recount
    val lines = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).where(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
    val direct = lines.groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("ns"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("nl"),
        max(when(col("late"), col("l_suppkey"))).as("the_late_supp"))
      .where(col("ns") > 1 && col("nl") === 1)
      .join(lines.where(col("late"))
        .select(col("l_orderkey").as("k"), col("l_suppkey")),
        col("l_orderkey") === col("k") && col("l_suppkey") === col("the_late_supp"))
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("w"))
      .collect().map(r => r.getAs[Long]("l_suppkey") -> r.getAs[Long]("w")).toMap
    val suppName = Tables.supplier(spark, sf).collect()
      .map(r => r.getAs[String]("s_name") -> r.getAs[Long]("s_suppkey")).toMap
    out.foreach { r =>
      val k = suppName(r.getAs[String]("s_name"))
      assert(direct.get(k).contains(r.getAs[Long]("numwait")),
        s"supplier $k numwait mismatch")
    }
  }

  test("q22: no returned country bucket contains a customer with recent orders") {
    val recentCust = Tables.orders(spark, sf)
      .where(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select(col("o_custkey")).distinct()
    val avgBal = Tables.customer(spark, sf).where(col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal").cast("double"))).collect()(0).getDouble(0)
    val direct = Tables.customer(spark, sf)
      .where(col("c_acctbal").cast("double") > avgBal)
      .join(recentCust, col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    val out = TpchMore.q22SalesOpportunity(spark, sf).collect()
    assert(out.map(_.getAs[Long]("numcust")).sum == direct)
  }

  test("plan contracts: correlated shapes fully decorrelate — no cartesian, no per-row subquery") {
    for (q <- Seq("q2_min_cost_supplier", "q16_supplier_cnt",
        "q17_small_qty_revenue", "q19_disjunctive_revenue",
        "q20_part_promotion", "q21_waiting_orders")) {
      val p = finalPlan(q)
      assert(!p.contains("CartesianProduct"), s"$q: cartesian leak")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q: quantifier not decorrelated")
    }
    // the three scalar-subquery queries may broadcast exactly their
    // one-row aggregate (BNLJ over a 1-row build is the scalar plan),
    // and nothing else
    for (q <- Seq("q11_part_value", "q15_top_supplier",
        "q22_sales_opportunity")) {
      val p = finalPlan(q)
      assert(!p.contains("CartesianProduct"), s"$q: cartesian leak")
      assert(p.sliding("BroadcastNestedLoopJoin".length)
        .count(_ == "BroadcastNestedLoopJoin") <= 1, s"$q: only the scalar may BNLJ")
    }
  }

  test("q20/q8: IN-pyramids plan as semi-joins (no distinct-then-inner)") {
    val p20 = finalPlan("q20_part_promotion")
    assert(p20.contains("LeftSemi"), "q20 must keep both INs as semi-joins")
    val p8 = finalPlan("q8_market_share")
    assert(p8.contains("LeftSemi"), "q8 region filter must reach orders as a semi")
  }
}
