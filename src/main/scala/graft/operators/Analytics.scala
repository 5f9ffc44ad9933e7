package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Op, Tables}

/** Beyond-reference analytical breadth: offset window functions and
  * multi-level grouping. The reference uses neither (SURVEY §2.5 frame
  * note, §2.4 "no grouping sets"), but a drop-in engine should carry
  * them.
  */
object Analytics {

  private val dec = DecimalType(18, 2)

  /** lead/lag/ntile/first/last over per-user event sequences —
    * deterministic ORDER BY (ts, event_id ties impossible: unique ts
    * per user in practice, event_id tie-break regardless).
    */
  def windowOffsets(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        ntile(4).over(w).as("quartile"),
        first(col("event_type")).over(w).as("first_type"),
        (unix_micros(col("ts"))
          - unix_micros(lag(col("ts"), 1).over(w))).as("gap_us"))
  }

  private val windowOffsetsSql =
    """SELECT user_id, event_id, ts,
      |  lag(event_type, 1) OVER w AS prev_type,
      |  lead(event_type, 1) OVER w AS next_type,
      |  ntile(4) OVER w AS quartile,
      |  first_value(event_type) OVER w AS first_type,
      |  epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS gap_us
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)""".stripMargin

  /** ROLLUP over (returnflag, linestatus) with exact decimal sums;
    * grouping() columns disambiguate the null super-aggregate rows.
    */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        grouping(col("l_returnflag")).as("g_flag"),
        grouping(col("l_linestatus")).as("g_status"))

  private val rollupAggSql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
      |  CAST(grouping(l_linestatus) AS INTEGER) AS g_status
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** CUBE over (orderstatus, orderpriority). */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        grouping(col("o_orderstatus")).as("g_status"),
        grouping(col("o_orderpriority")).as("g_prio"))

  private val cubeAggSql =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
      |  CAST(grouping(o_orderpriority) AS INTEGER) AS g_prio
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("window_offsets", windowOffsets, Some(windowOffsetsSql)),
    Op("rollup_agg", rollupAgg, Some(rollupAggSql)),
    Op("cube_agg", cubeAgg, Some(cubeAggSql)),
  )
}
