package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Op, Tables}

/** Table profiling — the data-quality report every ingest pipeline
  * runs before anything else touches a new drop: per-column row/null/
  * exact-distinct counts plus typed min/max. The reference ships this
  * implicitly through its notebook EDA; here it is a first-class
  * one-pass operator.
  *
  * Scale shape: ONE aggregation pass over the relation. Multiple
  * exact COUNT(DISTINCT col) in one agg plan through Spark's Expand
  * (one input row fans to |distinct-aggs| tagged rows, each partial-
  * aggregated map-side) — one exchange, no per-column rescans. At
  * 100 TB the exact distincts are the expensive knob; the documented
  * swap is `approx_count_distinct` per column (the
  * count_distinct_approx band-oracle pattern) with everything else
  * unchanged. The long-form pivot at the end runs over the ONE
  * aggregate row (driver-trivial at any scale).
  *
  * Cross-engine exactness: numeric min/max surface as DOUBLE columns
  * and temporal ones as DATE-cast ISO strings — never a raw
  * numeric→string cast, whose formatting differs between engines.
  */
object Profiling {

  def profileTable(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    def nNull(c: String): Column =
      sum(col(c).isNull.cast("long")).as(s"${c}_nulls")
    val agg = li.agg(
      count(lit(1)).as("n_rows"),
      nNull("l_quantity"), countDistinct(col("l_quantity")).as("l_quantity_nd"),
      min(col("l_quantity").cast("double")).as("l_quantity_min"),
      max(col("l_quantity").cast("double")).as("l_quantity_max"),
      nNull("l_extendedprice"),
      countDistinct(col("l_extendedprice")).as("l_extendedprice_nd"),
      min(col("l_extendedprice").cast("double")).as("l_extendedprice_min"),
      max(col("l_extendedprice").cast("double")).as("l_extendedprice_max"),
      nNull("l_returnflag"), countDistinct(col("l_returnflag")).as("l_returnflag_nd"),
      min(col("l_returnflag")).as("l_returnflag_min"),
      max(col("l_returnflag")).as("l_returnflag_max"),
      nNull("l_shipdate"), countDistinct(col("l_shipdate")).as("l_shipdate_nd"),
      min(col("l_shipdate").cast("date")).cast("string").as("l_shipdate_min"),
      max(col("l_shipdate").cast("date")).cast("string").as("l_shipdate_max"))
    // long form: one row per profiled column, built over the single
    // aggregate row — numeric bounds in min_num/max_num, categorical/
    // temporal bounds in min_str/max_str
    def row(name: String, nd: String, nulls: String,
        minNum: Option[String], maxNum: Option[String],
        minStr: Option[String], maxStr: Option[String]): Column =
      struct(lit(name).as("col_name"), col("n_rows"),
        col(nulls).as("n_null"), col(nd).as("n_distinct"),
        minNum.map(col(_)).getOrElse(lit(null).cast("double")).as("min_num"),
        maxNum.map(col(_)).getOrElse(lit(null).cast("double")).as("max_num"),
        minStr.map(col(_)).getOrElse(lit(null).cast("string")).as("min_str"),
        maxStr.map(col(_)).getOrElse(lit(null).cast("string")).as("max_str"))
    agg.select(explode(array(
        row("l_quantity", "l_quantity_nd", "l_quantity_nulls",
          Some("l_quantity_min"), Some("l_quantity_max"), None, None),
        row("l_extendedprice", "l_extendedprice_nd", "l_extendedprice_nulls",
          Some("l_extendedprice_min"), Some("l_extendedprice_max"), None, None),
        row("l_returnflag", "l_returnflag_nd", "l_returnflag_nulls",
          None, None, Some("l_returnflag_min"), Some("l_returnflag_max")),
        row("l_shipdate", "l_shipdate_nd", "l_shipdate_nulls",
          None, None, Some("l_shipdate_min"), Some("l_shipdate_max")))).as("p"))
      .select(col("p.col_name"), col("p.n_rows"), col("p.n_null"),
        col("p.n_distinct"), col("p.min_num"), col("p.max_num"),
        col("p.min_str"), col("p.max_str"))
  }

  private val profileTableSql =
    """WITH a AS (
      |  SELECT count(*) AS n_rows,
      |    CAST(SUM(CAST(l_quantity IS NULL AS BIGINT)) AS BIGINT) AS q_nulls,
      |    count(DISTINCT l_quantity) AS q_nd,
      |    MIN(CAST(l_quantity AS DOUBLE)) AS q_min,
      |    MAX(CAST(l_quantity AS DOUBLE)) AS q_max,
      |    CAST(SUM(CAST(l_extendedprice IS NULL AS BIGINT)) AS BIGINT) AS p_nulls,
      |    count(DISTINCT l_extendedprice) AS p_nd,
      |    MIN(CAST(l_extendedprice AS DOUBLE)) AS p_min,
      |    MAX(CAST(l_extendedprice AS DOUBLE)) AS p_max,
      |    CAST(SUM(CAST(l_returnflag IS NULL AS BIGINT)) AS BIGINT) AS f_nulls,
      |    count(DISTINCT l_returnflag) AS f_nd,
      |    MIN(l_returnflag) AS f_min, MAX(l_returnflag) AS f_max,
      |    CAST(SUM(CAST(l_shipdate IS NULL AS BIGINT)) AS BIGINT) AS d_nulls,
      |    count(DISTINCT l_shipdate) AS d_nd,
      |    CAST(CAST(MIN(l_shipdate) AS DATE) AS VARCHAR) AS d_min,
      |    CAST(CAST(MAX(l_shipdate) AS DATE) AS VARCHAR) AS d_max
      |  FROM lineitem)
      |SELECT 'l_quantity' AS col_name, n_rows, q_nulls AS n_null,
      |  q_nd AS n_distinct, q_min AS min_num, q_max AS max_num,
      |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
      |FROM a
      |UNION ALL
      |SELECT 'l_extendedprice', n_rows, p_nulls, p_nd, p_min, p_max,
      |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM a
      |UNION ALL
      |SELECT 'l_returnflag', n_rows, f_nulls, f_nd,
      |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), f_min, f_max FROM a
      |UNION ALL
      |SELECT 'l_shipdate', n_rows, d_nulls, d_nd,
      |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), d_min, d_max FROM a""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("profile_table", profileTable, Some(profileTableSql)),
  )
}
