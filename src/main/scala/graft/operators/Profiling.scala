package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
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

  /** Join-key skew report — the pre-flight a large join runs before
    * committing to a partitioning: hash the key into P=32 buckets
    * (the same hash-partitioning a shuffle would apply, via the
    * portable cross-engine hash) and report per-bucket load, key
    * cardinality, the heaviest key, and the load's skew ratio
    * (max/avg bucket load — 1.0 is perfectly even; the number that
    * decides between a plain shuffle join, `salted_join_agg`, or an
    * AQE skew split).
    *
    * Scale shape: one corpus exchange to the (bucket, key) rollup,
    * then a key-cardinality-sized second aggregation into 32 groups
    * (map-side partials do the collapsing; the bounded output domain
    * is the POINT of the report, not a parallelism bug — nothing
    * sorts). Global total/max attach via the 1-row broadcast
    * crossJoin (W5 pattern). The heaviest key rides a packed integer
    * max (cnt·10¹² + key, keys < 10¹² by table contract) so ties
    * break identically in both engines — arg_max/max_by leave tie
    * order unspecified.
    */
  def skewReport(spark: SparkSession, dir: String): DataFrame =
    skewReportOn(Tables.events(spark, dir), "user_id")

  /** Generic form of [[skewReport]] (r9): the pre-flight is callable
    * on ANY relation + integral key column (keys < 10¹² by the packed
    * max's contract). The registered query delegates here.
    */
  def skewReportOn(rel: DataFrame, keyCol: String): DataFrame = {
    val perKey = rel
      .groupBy((graft.functions.CrossHash.hash60(col(keyCol).cast("string"))
          % 32).cast("int").as("bucket"),
        col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val perBucket = perKey.groupBy(col("bucket"))
      .agg(sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        // DECIMAL(38) packing, not Long: a hot key past ~9.2M rows —
        // exactly the skew this report exists to find — would overflow
        // cnt·10¹² in 64 bits (ANSI throw or silent wrap); 38 digits
        // hold any real cnt (≤ corpus rows) times 10¹² with room
        max(col("cnt").cast(DecimalType(38, 0)) * lit(1000000000000L)
          + col("key")).as("packed"))
    val totals = perBucket.agg(
      sum(col("n_rows")).as("total_rows"),
      max(col("n_rows")).as("max_rows"),
      count(lit(1)).as("n_buckets"))
    perBucket.crossJoin(broadcast(totals))
      .select(
        col("bucket"),
        col("n_rows"),
        col("n_keys"),
        // integral div on the DECIMAL, NOT `/`: double division stops
        // being exact once packed passes 2^53 at scale
        expr("CAST(packed div 1000000000000 AS BIGINT)").as("heaviest_rows"),
        (col("packed") % lit(1000000000000L)).cast("long").as("heaviest_key"),
        round(col("n_rows").cast("double") / col("total_rows"), 9)
          .as("load_share"),
        round(col("max_rows").cast("double") * col("n_buckets") / col("total_rows"), 9)
          .as("skew_ratio"))
  }

  private val skewReportSql = {
    val h = graft.functions.CrossHash.hash60Sql("CAST(user_id AS VARCHAR)")
    s"""WITH k AS (
       |  SELECT CAST($h % 32 AS INTEGER) AS bucket, user_id AS key,
       |    count(*) AS cnt
       |  FROM events GROUP BY 1, 2),
       |b AS (
       |  SELECT bucket, CAST(SUM(cnt) AS BIGINT) AS n_rows,
       |    count(*) AS n_keys,
       |    MAX(CAST(cnt AS HUGEINT) * 1000000000000 + key) AS packed
       |  FROM k GROUP BY bucket),
       |t AS (
       |  SELECT CAST(SUM(n_rows) AS BIGINT) AS total_rows,
       |    MAX(n_rows) AS max_rows, count(*) AS n_buckets
       |  FROM b)
       |SELECT bucket, n_rows, n_keys,
       |  CAST(packed // 1000000000000 AS BIGINT) AS heaviest_rows,
       |  CAST(packed % 1000000000000 AS BIGINT) AS heaviest_key,
       |  round(CAST(n_rows AS DOUBLE) / total_rows, 9) AS load_share,
       |  round(CAST(max_rows AS DOUBLE) * n_buckets / total_rows, 9) AS skew_ratio
       |FROM b, t""".stripMargin
  }

  val ops: Seq[Op] = Seq(
    Op("profile_table", profileTable, Some(profileTableSql)),
    Op("skew_report", skewReport, Some(skewReportSql)),
  )
}
