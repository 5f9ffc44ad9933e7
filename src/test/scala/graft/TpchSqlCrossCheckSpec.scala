package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Engine-internal redundancy for the TPC-H shapes: the oracle SQL of
  * every ANSI-dialect-common query is run through SPARK's own SQL
  * frontend and compared row-for-row against the DataFrame spelling.
  * The DuckDB oracle (driver-side) remains the authority; this guard
  * runs on every `sbt test` with no external engine, so a drift
  * between the DF plan and the SQL semantics (a decorrelation bug, a
  * join-condition typo) fails CI immediately instead of waiting for
  * the parity harness.
  */
class TpchSqlCrossCheckSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  // oracle SQLs that parse in Spark's dialect (no DuckDB list/unnest)
  private val crossCheckable = Seq(
    "q2_min_cost_supplier", "q6_forecast_revenue", "q8_market_share",
    "q10_returned_items", "q11_part_value", "q13_cust_dist",
    "q15_top_supplier", "q16_supplier_cnt", "q17_small_qty_revenue",
    "q19_disjunctive_revenue", "q20_part_promotion", "q21_waiting_orders",
    "q22_sales_opportunity", "q4_priority_check", "q12_line_classes",
    "q18_large_orders")

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem"))
      Tables.load(s, sf, t).createOrReplaceTempView(t)
    s
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      case null => "∅"
      case d: Double => f"$d%.9f"
      case b: java.math.BigDecimal => f"${b.doubleValue()}%.9f"
      case x => x.toString
    }.mkString("|")).sorted.toSeq

  for (name <- crossCheckable)
    test(s"$name: DataFrame plan == Spark-SQL run of the oracle text") {
      val dfRows = canon(SparkEntry.queries(name)(spark, sf))
      val sqlRows = canon(spark.sql(SparkEntry.oracleSql(name)))
      assert(dfRows.length == sqlRows.length,
        s"row counts differ: df=${dfRows.length} sql=${sqlRows.length}")
      dfRows.zip(sqlRows).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a == b, s"row $i differs:\n  df : $a\n  sql: $b")
      }
    }
}
