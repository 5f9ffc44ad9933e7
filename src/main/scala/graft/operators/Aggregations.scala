package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Op, Tables}

/** Hash aggregations (SURVEY §2.4).
  *
  * Float-parity convention used across the engine: any SUM over
  * fractional values goes through an exact DECIMAL accumulator and is
  * cast back to DOUBLE at the end, so Spark's partial-aggregation order
  * can never produce a last-ulp drift vs the DuckDB oracle. AVG/STDDEV
  * are spelled as scalar double expressions over those exact sums —
  * identical IEEE arithmetic in both engines.
  */
object Aggregations {

  private val dec = DecimalType(18, 2)

  /** A1+A4: the classic pricing-summary aggregation over lineitem
    * (groupBy + count/sum/avg), mirroring the reference's per-group
    * count/sum scoring (/root/reference/src/queries/ntl_queries.py:20-39).
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice").cast(dec)
          * (lit(BigDecimal("1.00")) - col("l_discount").cast(dec))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"),
        (sum(col("l_quantity").cast(dec)).cast("double") / count(lit(1)))
          .as("avg_qty"),
      )
  }

  private val q1AggSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |       * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** A3: global scalar aggregates (single row) —
    * /root/reference/scripts/NetworkBuilder.py:83-84,110-111.
    */
  def globalScalars(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.agg(
      count(lit(1)).as("n_events"),
      countDistinct(col("user_id")).as("n_users"),
      min(col("ts")).as("min_ts"),
      max(col("ts")).as("max_ts"),
    )
  }

  private val globalScalarsSql =
    """SELECT COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
      |  MIN(ts) AS min_ts, MAX(ts) AS max_ts
      |FROM events""".stripMargin

  /** A2: exact COUNT(DISTINCT) per group
    * (/root/reference/src/queries/matrix_queries.py:17).
    */
  def countDistinctPerGroup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))

  private val countDistinctPerGroupSql =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
      |  COUNT(*) AS n_events
      |FROM events GROUP BY event_type""".stripMargin

  /** A8: multi-column SELECT DISTINCT
    * (/root/reference/src/queries/ntl_queries.py:7-10).
    */
  def distinctPairs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"))
      .distinct()

  private val distinctPairsSql =
    "SELECT DISTINCT user_id, event_type FROM events"

  /** A7: grouped count with HAVING
    * (/root/reference/scripts/csv_infected.py:94-102).
    */
  def havingFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(dec)).cast("double").as("total_spend"))
      .where(col("n_orders") >= 3)

  private val havingFilterSql =
    """SELECT o_custkey, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
      |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("q1_agg", q1Agg, Some(q1AggSql), bench = true),
    Op("global_scalars", globalScalars, Some(globalScalarsSql)),
    Op("count_distinct_per_group", countDistinctPerGroup, Some(countDistinctPerGroupSql)),
    Op("distinct_pairs", distinctPairs, Some(distinctPairsSql)),
    Op("having_filter", havingFilter, Some(havingFilterSql)),
  )
}
