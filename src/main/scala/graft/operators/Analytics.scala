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

  /** W-family completion: rank / dense_rank / percent_rank / cume_dist
    * over per-type value ordering. All four are tie-stable (peers get
    * identical outputs), so double-valued ties stay deterministic; the
    * two ratio functions are single double divisions — bit-equal across
    * engines.
    *
    * Scale shape (r7, the equi_depth/gini class): |event_type| = 5
    * would bound a naive per-type window's sort at 5 tasks over the
    * whole fact table. Instead the row_number backbone is the grouped
    * distributed rank ([[RangeRank.withRankAscGrouped]]); the four SQL
    * rank functions derive from it exactly: rank = MIN(rn) over the
    * tie group (peers share a value — a (type, value)-sized window),
    * cume_dist = MAX(rn)/n, percent_rank = (rank−1)/(n−1) with the
    * SQL-standard 0.0 for a single-row group, and dense_rank ranks the
    * DISTINCT (type, value) relation through a second grouped
    * RangeRank pass joined back on the (type, value) key. Every
    * exchange is keyed corpus-wide; nothing sorts at |groups|
    * parallelism.
    */
  def windowRanks(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    val rn = RangeRank.withRankAscGrouped(ev, Seq("event_type"), "value",
      Seq(col("event_id").asc), "rn", totalOut = Some("n"))
    val tieW = Window.partitionBy(col("event_type"), col("value"))
    val dv = ev.select(col("event_type"), col("value")).distinct()
    val dvRanked = RangeRank.withRankAscGrouped(dv, Seq("event_type"),
      "value", Seq.empty, "drnk")
    rn
      .withColumn("rnk", min(col("rn")).over(tieW))
      .withColumn("cmax", max(col("rn")).over(tieW))
      .join(dvRanked, Seq("event_type", "value"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("rnk"),
        col("drnk"),
        when(col("n") === 1, lit(0.0)).otherwise(
          (col("rnk") - 1).cast("double") / (col("n") - 1).cast("double"))
          .as("prnk"),
        (col("cmax").cast("double") / col("n").cast("double")).as("cdist"))
  }

  private val windowRanksSql =
    """SELECT event_id, event_type, value,
      |  rank() OVER w AS rnk,
      |  dense_rank() OVER w AS drnk,
      |  percent_rank() OVER w AS prnk,
      |  cume_dist() OVER w AS cdist
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY value ASC)""".stripMargin

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

  /** Frame-bounded moving-window aggregates (ROWS BETWEEN 3 PRECEDING
    * AND CURRENT ROW): the sliding-statistics family — moving sum/avg/
    * min — that default whole-partition frames cannot express. Sum
    * rides an exact decimal accumulator (Spark's incremental
    * add/remove and DuckDB's segment tree would otherwise disagree in
    * double ulps); avg is the exact sum over the frame count; min on
    * doubles is order-free. Frame order keys on unique event_id, so
    * frames are deterministic.
    */
  def windowMoving(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Distributed bounded frames (r7): |event_type| = 5 would bound
    // the naive per-type frame window at 5 tasks over the whole
    // events relation; boundedFrameStage buckets by sampled event_id
    // ranges and prepends each bucket with its 3-row carry prefix, so
    // the in-bucket frames see exactly the global frames.
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    val (staged, wb) = RangeRank.boundedFrameStage(ev, Seq("event_type"),
      "event_id", "event_id", lookback = 3,
      cuts = Some(RangeRank.sampleCutsMemo(s"events.event_id:$dir",
        ev.select(col("event_id")), "event_id")))
    val w = wb.rowsBetween(-3, Window.currentRow)
    staged
      .withColumn("mov_sum",
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .over(w).cast("double"))
      .withColumn("n_frame", count(lit(1)).over(w))
      .withColumn("mov_min", min(col("value")).over(w))
      .where(!col("__rr_carry"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("mov_sum"), col("n_frame"), col("mov_min"))
      .withColumn("mov_avg", col("mov_sum") / col("n_frame"))
  }

  private val windowMovingSql =
    """SELECT event_id, event_type, value,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS mov_sum,
      |  COUNT(*) OVER w AS n_frame,
      |  MIN(value) OVER w AS mov_min,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
      |    / (COUNT(*) OVER w) AS mov_avg
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY event_id ASC
      |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin

  /** Time-RANGE window frame: trailing 1-hour per-user rollup — the
    * "how much did this user do in the last hour, AS OF each event"
    * feature every fraud/engagement pipeline derives. ROWS frames
    * ([[windowMoving]]) count records; RANGE frames bound by VALUE
    * distance — Spark's rangeBetween is numeric-only, so the frame
    * runs over epoch seconds (and the oracle mirrors the same integer
    * frame: unlike a native INTERVAL frame, identical on both engines
    * by construction).
    */
  def windowRangeTime(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-3600000000L, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .over(w).cast("double").as("sum_1h"))
  }

  private val windowRangeTimeSql =
    """SELECT event_id, user_id, ts_us, value,
      |  COUNT(*) OVER w AS n_1h,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
      |FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
      |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin

  /** Two-proportion z-test between event-type "variants" — the
    * experiment readout (conversion = value above a threshold): rates,
    * pooled standard error, z statistic, and a |z| > 1.96 significance
    * flag per variant pair against the 'view' control.
    *
    * Scale shape: per-variant numerators/denominators fold in ONE
    * conditional-aggregation pass; the pair stats are a |variants|²
    * driver-small cross of a broadcast relation. All doubles derive
    * from exact integer counts through identically-written arithmetic;
    * z rounds at 1e-9 (sqrt is IEEE-exact — no libm drift).
    */
  def abTest(spark: SparkSession, dir: String): DataFrame = {
    // eager checkpoint: both crossJoin sides consume this tiny
    // aggregate — without it each re-derives a full events scan
    // (see welchTTest; same shape, same fix)
    val rates = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") > 50.0, 1L).otherwise(0L)).as("conv"))
      .localCheckpoint(true)
    val ctl = rates.where(col("event_type") === "view")
      .select(col("n").as("n_c"), col("conv").as("conv_c"))
    rates.where(col("event_type") =!= "view")
      .crossJoin(broadcast(ctl))
      .select(col("event_type").as("variant"), col("n"), col("conv"),
        col("n_c"), col("conv_c"),
        expr("round(CAST(conv AS DOUBLE) / n, 9)").as("rate"),
        expr("round(CAST(conv_c AS DOUBLE) / n_c, 9)").as("rate_c"),
        expr(s"round($AbZSql, 9)").as("z"),
        expr(s"abs($AbZSql) > 1.96").as("significant"))
  }

  /** z = (p1 − p2) / sqrt(p(1−p)(1/n1 + 1/n2)), identical text in both
    * engines; the pooled p is (conv + conv_c)/(n + n_c).
    */
  private val AbZSql =
    "(CAST(conv AS DOUBLE) / n - CAST(conv_c AS DOUBLE) / n_c) / " +
      "sqrt((CAST(conv + conv_c AS DOUBLE) / (n + n_c)) * " +
      "(1.0 - CAST(conv + conv_c AS DOUBLE) / (n + n_c)) * " +
      "(1.0 / n + 1.0 / n_c))"

  private val abTestSql =
    s"""WITH rates AS (
       |  SELECT event_type, count(*) AS n,
       |    CAST(SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS conv
       |  FROM events GROUP BY 1),
       |ctl AS (SELECT n AS n_c, conv AS conv_c FROM rates WHERE event_type = 'view')
       |SELECT event_type AS variant, n, conv, n_c, conv_c,
       |  round(CAST(conv AS DOUBLE) / n, 9) AS rate,
       |  round(CAST(conv_c AS DOUBLE) / n_c, 9) AS rate_c,
       |  round($AbZSql, 9) AS z,
       |  abs($AbZSql) > 1.96 AS significant
       |FROM rates CROSS JOIN ctl
       |WHERE event_type <> 'view'""".stripMargin

  /** Welch's unequal-variance t-test on the continuous metric —
    * [[abTest]]'s companion for means instead of conversion rates
    * (the proportions z-test cannot see a shift that leaves the >50
    * threshold crossing rate unchanged). Per non-control variant vs
    * the 'view' control: n, means, the t statistic and the
    * Welch–Satterthwaite degrees of freedom.
    *
    * Float-parity discipline: the metric is quantized ONCE at 9 dp
    * (|value|·10⁹ ≪ 2⁵³, so both engines' round() is exact) and every
    * moment is accumulated in DECIMAL — v as DECIMAL(19,9), v² as the
    * exact DECIMAL(38,18) product — so sums are order-free exact and
    * the t/df doubles are computed from identical anchors by the
    * identical expression TEXT in both engines (correctly-rounded
    * IEEE ops ⇒ bit-equal). df is rounded at 6 dp, not 9: df grows
    * with n, and df·10⁹ would re-enter the scale-multiply hazard zone
    * at ~10⁷ rows per arm. No significance flag: the t threshold is
    * df-dependent (unlike [[abTest]]'s fixed 1.96), and a boundary
    * boolean would add a portability hazard for zero information.
    *
    * Scale shape: one map-side-combined aggregation over events, then
    * a |variants|-row cross join against the 1-row control — nothing
    * corpus-sized past the first exchange.
    */
  def welchTTest(spark: SparkSession, dir: String): DataFrame = {
    // DECIMAL(18,9), NOT (19,9): a (19,9) square is (39,18), which
    // Spark's precision-loss rule trims to (38,17) — per-row HALF_UP
    // at the 17th dp — while DuckDB keeps the exact (38,18). (18,9)²
    // = (37,18) is exactly representable in BOTH engines (the
    // anomalyZscore decimal-square discipline).
    val d9 = org.apache.spark.sql.types.DecimalType(18, 9)
    val v = round(col("value"), 9).cast(d9)
    // localCheckpoint (eager): the variant side and the 1-row control
    // side both consume this |variants|-row aggregate — without the
    // checkpoint each side re-derives it from its OWN full events scan
    // (the filters push below the agg, so the exchanges don't unify
    // into a ReusedExchange). Two corpus passes → one.
    val m = Tables.events(spark, dir)
      .select(col("event_type"), v.as("v"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("v")).as("sx"),
        sum(col("v") * col("v")).as("ssq"))
      .localCheckpoint(true)
    val ctl = m.where(col("event_type") === "view")
      .select(col("n").as("n_c"), col("sx").as("sx_c"), col("ssq").as("ssq_c"))
    m.where(col("event_type") =!= "view")
      .crossJoin(broadcast(ctl))
      .select(col("event_type").as("variant"), col("n"), col("n_c"),
        expr("round(CAST(sx AS DOUBLE) / n, 9)").as("mean"),
        expr("round(CAST(sx_c AS DOUBLE) / n_c, 9)").as("mean_c"),
        expr(s"round($WelchGuard $WelchT END END, 9)").as("t_stat"),
        expr(s"round($WelchGuard $WelchDf END END, 6)").as("welch_df"))
  }

  // identical expression text on both engines (the AbZSql precedent):
  // sample variance from the decimal anchors, then Welch t and
  // Welch–Satterthwaite df from the per-arm variance/n terms
  private val WVar1 =
    "((CAST(ssq AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1))"
  private val WVar2 =
    "((CAST(ssq_c AS DOUBLE) - CAST(sx_c AS DOUBLE) * CAST(sx_c AS DOUBLE) / n_c) / (n_c - 1))"
  private val WSe2 = s"($WVar1 / n + $WVar2 / n_c)"
  // zero guards INSIDE the shared text: an n=1 arm divides by (n-1)=0
  // and two zero-variance arms divide by sqrt(0) — Spark's non-ANSI
  // double division returns NULL there while DuckDB returns ±inf/nan,
  // so the identical-text ⇒ bit-equal premise would fail exactly at
  // the degenerate inputs. NULL (both engines) is the honest output.
  // NESTED case, not one conjunction: the se2 > 0 test itself divides
  // by (n-1), and at n=1 Spark's NULL > 0 is NULL (branch not taken)
  // while DuckDB's inf > 0 is TRUE (branch taken) — the outer n-guard
  // must decide before the variance expression's value can matter.
  // Every WelchGuard use closes with "END END".
  private val WelchGuard =
    s"CASE WHEN n > 1 AND n_c > 1 THEN CASE WHEN $WSe2 > 0 THEN"
  private val WelchT =
    s"((CAST(sx AS DOUBLE) / n - CAST(sx_c AS DOUBLE) / n_c) / sqrt($WSe2))"
  private val WelchDf =
    s"($WSe2 * $WSe2 / (($WVar1 / n) * ($WVar1 / n) / (n - 1) + " +
      s"($WVar2 / n_c) * ($WVar2 / n_c) / (n_c - 1)))"

  private val welchTTestSql =
    s"""WITH m AS (
       |  SELECT event_type, count(*) AS n,
       |    SUM(CAST(round(value, 9) AS DECIMAL(18,9))) AS sx,
       |    SUM(CAST(round(value, 9) AS DECIMAL(18,9))
       |      * CAST(round(value, 9) AS DECIMAL(18,9))) AS ssq
       |  FROM events GROUP BY 1),
       |ctl AS (SELECT n AS n_c, sx AS sx_c, ssq AS ssq_c FROM m
       |        WHERE event_type = 'view')
       |SELECT event_type AS variant, n, n_c,
       |  round(CAST(sx AS DOUBLE) / n, 9) AS mean,
       |  round(CAST(sx_c AS DOUBLE) / n_c, 9) AS mean_c,
       |  round($WelchGuard $WelchT END END, 9) AS t_stat,
       |  round($WelchGuard $WelchDf END END, 6) AS welch_df
       |FROM m CROSS JOIN ctl
       |WHERE event_type <> 'view'""".stripMargin

  /** Gaps-and-islands: per-user consecutive-active-day streaks via the
    * row_number-difference idiom (day − rank is constant within a
    * run) — the engagement-streak / coverage-gap primitive, and the
    * one classic windowed-SQL shape the W-family didn't exercise yet.
    * Streaks of one day are noise and drop.
    *
    * Scale shape: the (user, day) distinct collapses the fact table
    * first (map-side partials), so the window and the island rollup
    * run on ≤ users×days rows; both shuffle on user_id and Catalyst
    * co-partitions them.
    */
  def gapsIslands(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    days
      .withColumn("grp",
        datediff(col("d"), lit("1970-01-01").cast("date"))
          - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(min(col("d")).as("streak_start"), max(col("d")).as("streak_end"),
        count(lit(1)).as("streak_len"))
      .where(col("streak_len") >= 2)
      .select(col("user_id"), col("streak_start"), col("streak_end"),
        col("streak_len"))
  }

  private val gapsIslandsSql =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |runs AS (
      |  SELECT user_id, d,
      |    datediff('day', DATE '1970-01-01', d)
      |      - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
      |  FROM days)
      |SELECT user_id, min(d) AS streak_start, max(d) AS streak_end,
      |  count(*) AS streak_len
      |FROM runs GROUP BY user_id, grp
      |HAVING count(*) >= 2""".stripMargin

  /** Per-group winsorization: clamp l_extendedprice into its
    * return-flag group's [p5, p95] band and flag what was clipped —
    * the outlier treatment a feature pipeline applies before scaling
    * (trim = drop, winsorize = clamp; [[Curation.lengthTrim]] is the
    * drop form). Bounds round at 1e-6 so an interpolation ulp cannot
    * flip a clip decision, and the clamped value is exact either way
    * (it is either the original double or the rounded bound).
    */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    val bounds = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr("round(percentile(l_extendedprice, 0.05), 6)").as("lo"),
        expr("round(percentile(l_extendedprice, 0.95), 6)").as("hi"))
    Tables.lineitem(spark, dir)
      .join(broadcast(bounds), "l_returnflag")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_extendedprice"),
        least(greatest(col("l_extendedprice"), col("lo")), col("hi"))
          .as("price_winsor"),
        (col("l_extendedprice") < col("lo")
          || col("l_extendedprice") > col("hi")).as("clipped"))
  }

  private val winsorizeSql =
    """WITH b AS (
      |  SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.05), 6) AS lo,
      |    round(quantile_cont(l_extendedprice, 0.95), 6) AS hi
      |  FROM lineitem GROUP BY 1)
      |SELECT l_orderkey, l_linenumber, l.l_returnflag, l_extendedprice,
      |  least(greatest(l_extendedprice, lo), hi) AS price_winsor,
      |  l_extendedprice < lo OR l_extendedprice > hi AS clipped
      |FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag""".stripMargin

  /** Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL): multiplicity
    * -preserving variants of [[setOps]] — a customer with three
    * qualifying orders appears min(3, m) times in the intersection,
    * not once. Planned by Spark as aggregate+join (no row explosion).
    */
  def setOpsAll(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.orders(spark, dir)
      .where(col("o_totalprice") > 100000).select(col("o_custkey").as("custkey"))
    val urgent = Tables.orders(spark, dir)
      .where(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("custkey"))
    big.intersectAll(urgent).withColumn("relation", lit("both_all"))
      .unionByName(big.exceptAll(urgent).withColumn("relation", lit("only_big_all")))
  }

  private val setOpsAllSql =
    """WITH big AS (
      |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000),
      |urgent AS (
      |  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |SELECT custkey, 'both_all' AS relation
      |FROM (SELECT custkey FROM big INTERSECT ALL SELECT custkey FROM urgent)
      |UNION ALL
      |SELECT custkey, 'only_big_all' AS relation
      |FROM (SELECT custkey FROM big EXCEPT ALL SELECT custkey FROM urgent)""".stripMargin

  /** Unpivot/melt — the inverse of A9's pivot: wide measure columns to
    * long (measure, value) rows. Narrow per-row transform, no shuffle;
    * the oracle spells the identical semantics as a 3-way UNION ALL.
    */
  def unpivotLong(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("double"),
        col("l_extendedprice").cast("double"),
        col("l_discount").cast("double"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "measure", "value")

  private val unpivotLongSql =
    """SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
      |  CAST(l_quantity AS DOUBLE) AS value FROM lineitem
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'l_extendedprice',
      |  CAST(l_extendedprice AS DOUBLE) FROM lineitem
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'l_discount',
      |  CAST(l_discount AS DOUBLE) FROM lineitem""".stripMargin

  /** Explicit GROUPING SETS (the general form rollup/cube desugar to),
    * through the `spark.sql` entry path over a temp view — the one
    * aggregation shape the DataFrame API has no direct spelling for,
    * and a deliberate exercise of the SQL front door the engine
    * contract includes.
    */
  def groupingSetsAgg(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_prio
        |FROM orders_v
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
  }

  private val groupingSetsAggSql =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
      |  CAST(grouping(o_orderpriority) AS INT) AS g_prio
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin

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

  /** INTERSECT / EXCEPT set semantics (absent in the reference —
    * SURVEY §2.7 — but part of a complete relational surface).
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val buyers = Tables.orders(spark, dir)
      .where(col("o_totalprice") > 150000).select(col("o_custkey").as("custkey"))
    val urgent = Tables.orders(spark, dir)
      .where(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("custkey"))
    val both = buyers.intersect(urgent).withColumn("relation", lit("both"))
    val onlyBig = buyers.except(urgent).withColumn("relation", lit("only_big"))
    both.unionByName(onlyBig)
  }

  private val setOpsSql =
    """WITH buyers AS (
      |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000),
      |urgent AS (
      |  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |SELECT custkey, 'both' AS relation FROM (SELECT custkey FROM buyers INTERSECT SELECT custkey FROM urgent)
      |UNION ALL
      |SELECT custkey, 'only_big' AS relation FROM (SELECT custkey FROM buyers EXCEPT SELECT custkey FROM urgent)""".stripMargin

  /** Sketch-based quantiles — the 100 TB path (exact `percentile`
    * sorts every group in memory; the approx sketch is a bounded-size
    * mergeable summary with map-side partials). DuckDB's
    * approx_quantile is a different sketch, so the raw estimates can't
    * hash-match; the query OUTPUTS the rank-error verdict instead (r6
    * verdict #4): for each quantile q, the returned value v must
    * satisfy count(x < v)/n ≤ q + ε and count(x ≥ ... ≤ v)/n ≥ q − ε —
    * the published guarantee of Spark's accuracy-1000 sketch is rank
    * error ≤ 1/1000; ε = 0.005 adds slack. The rank counts are a
    * second exact pass joined on the broadcast 3-row sketch output —
    * the scorecard row fails iff the sketch ever drifts out of its
    * guaranteed rank band. Exact n anchors the oracle comparison.
    */
  def percentileApproxSketch(spark: SparkSession, dir: String): DataFrame = {
    val sk = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_quantity, 0.5, 1000)").as("ap50"),
        expr("approx_percentile(l_quantity, 0.9, 1000)").as("ap90"),
        expr("approx_percentile(l_quantity, 0.99, 1000)").as("ap99"))
    val eps = 0.005
    def okCols(q: Double, ap: String, tag: String) = Seq(
      ((sum((col("l_quantity") < col(ap)).cast("long")).cast("double")
        / count(lit(1))) <= q + eps).as(s"lo_ok_$tag"),
      ((sum((col("l_quantity") <= col(ap)).cast("long")).cast("double")
        / count(lit(1))) >= q - eps).as(s"hi_ok_$tag"))
    val checks = okCols(0.5, "ap50", "50") ++ okCols(0.9, "ap90", "90") ++
      okCols(0.99, "ap99", "99")
    Tables.lineitem(spark, dir)
      .join(broadcast(sk), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), checks: _*)
  }

  private val percentileApproxSketchSql =
    """SELECT l_returnflag, count(*) AS n,
      |  true AS lo_ok_50, true AS hi_ok_50,
      |  true AS lo_ok_90, true AS hi_ok_90,
      |  true AS lo_ok_99, true AS hi_ok_99
      |FROM lineitem GROUP BY 1""".stripMargin

  /** Exact median/quantiles via sort-based percentile (Spark
    * `percentile` ≡ DuckDB `quantile_cont`: same linear interpolation
    * over the sorted values).
    */
  def percentileAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        count(lit(1)).as("n"))

  private val percentileAggSql =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS median_qty,
      |  quantile_cont(l_quantity, 0.9) AS p90_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Extended string/date scalar breadth: trim/pad/translate/replace
    * case ops + date arithmetic (datediff-style, interval add, trunc).
    */
  def scalarExtended(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        upper(col("o_orderstatus")).as("status_up"),
        lower(col("o_orderpriority")).as("prio_lo"),
        trim(lit("  pad  ")).as("trimmed"),
        rpad(col("o_orderstatus"), 3, "_").as("status_pad"),
        translate(col("o_orderpriority"), "-", "_").as("prio_tr"),
        regexp_replace(col("o_orderpriority"), "[0-9]+", "#").as("prio_num"),
        datediff(lit("2000-01-01").cast("date"), to_date(col("o_orderdate")))
          .as("days_to_y2k"),
        (col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("due_ts"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
      )

  private val scalarExtendedSql =
    """SELECT o_orderkey,
      |  upper(o_orderstatus) AS status_up,
      |  lower(o_orderpriority) AS prio_lo,
      |  trim('  pad  ') AS trimmed,
      |  rpad(o_orderstatus, 3, '_') AS status_pad,
      |  replace(o_orderpriority, '-', '_') AS prio_tr,
      |  regexp_replace(o_orderpriority, '[0-9]+', '#', 'g') AS prio_num,
      |  date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
      |  o_orderdate + INTERVAL 90 DAY AS due_ts,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
      |FROM orders""".stripMargin

  /** Recursive CTE through the SQL front door — ONE dialect-common
    * statement that is BOTH the Spark implementation (spark.sql; Spark
    * 4 supports WITH RECURSIVE) and, verbatim, the DuckDB oracle. The
    * query walks the synthetic binary hierarchy parent(c) = ⌊c/2⌋ to
    * the root and reports each customer's depth — the org-chart /
    * BOM-explosion recursion pattern. Termination is structural
    * (ancestor halves every step) with a depth guard as belt.
    */
  private val recursiveCteSql =
    """WITH RECURSIVE anc(c_custkey, ancestor, depth) AS (
      |  SELECT c_custkey, c_custkey, 0 FROM customer
      |  UNION ALL
      |  SELECT a.c_custkey, CAST(floor(a.ancestor / 2.0) AS BIGINT),
      |    a.depth + 1
      |  FROM anc a WHERE a.ancestor > 1 AND a.depth < 25)
      |SELECT c_custkey, max(depth) AS depth_to_root,
      |  count(*) AS chain_len
      |FROM anc GROUP BY 1""".stripMargin

  def recursiveCte(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    spark.sql(recursiveCteSql)
  }

  /** nth_value + IGNORE NULLS window completions: the second event
    * type in each user's history, and the most recent non-null
    * purchase value carried forward (value nullified on non-purchase
    * rows) — the two offset-family members the plain lag/lead query
    * can't express.
    */
  def windowNth(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("purchase_value",
        when(col("event_type") === "purchase", col("value")))
      .select(col("user_id"), col("event_id"), col("ts"),
        nth_value(col("event_type"), 2)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("second_type"),
        last(col("purchase_value"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("last_purchase_value"))
  }

  private val windowNthSql =
    """SELECT user_id, event_id, ts,
      |  nth_value(event_type, 2) OVER w AS second_type,
      |  last_value(CASE WHEN event_type = 'purchase' THEN value END
      |    IGNORE NULLS) OVER w AS last_purchase_value
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  /** Calendar dimension generated from the fact table's own date span
    * (scalar min/max broadcast — never a hardcoded range): one row per
    * day with the attributes every warehouse join needs. Spark's
    * sequence() and the oracle's generate_series enumerate the same
    * closed interval.
    */
  def dateDim(spark: SparkSession, dir: String): DataFrame = {
    val span = Tables.orders(spark, dir)
      .agg(to_date(min(col("o_orderdate"))).as("lo"),
        to_date(max(col("o_orderdate"))).as("hi"))
    span.select(explode(expr("sequence(lo, hi, interval 1 day)")).as("d"))
      .select(col("d"),
        year(col("d")).as("y"),
        month(col("d")).as("m"),
        dayofmonth(col("d")).as("dom"),
        // ISO day-of-week (Mon=1..Sun=7), identical in both engines
        dayofweek(col("d")).as("dow_sunday1"),
        (expr("extract(dayofweek_iso FROM d)") >= 6).as("is_weekend"))
  }

  private val dateDimSql =
    """WITH span AS (
      |  SELECT CAST(min(o_orderdate) AS DATE) AS lo,
      |    CAST(max(o_orderdate) AS DATE) AS hi
      |  FROM orders)
      |SELECT CAST(d AS DATE) AS d,
      |  CAST(year(d) AS INTEGER) AS y,
      |  CAST(month(d) AS INTEGER) AS m,
      |  CAST(day(d) AS INTEGER) AS dom,
      |  CAST(dayofweek(d) + 1 AS INTEGER) AS dow_sunday1,
      |  isodow(d) >= 6 AS is_weekend
      |FROM (
      |  SELECT unnest(generate_series(CAST(lo AS TIMESTAMP),
      |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS d
      |  FROM span)""".stripMargin

  /** k-anonymity audit over quasi-identifiers: equivalence-class sizes
    * for (nation, market segment) and a flag for classes smaller than
    * k=5 — the re-identification risk check that pairs with
    * `pii_scrub` before a dataset leaves the pipeline. One map-side
    * combined aggregation.
    */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("class_size"))
      .withColumn("at_risk", col("class_size") < 5)

  private val kAnonymitySql =
    """SELECT c_nationkey, c_mktsegment, count(*) AS class_size,
      |  count(*) < 5 AS at_risk
      |FROM customer GROUP BY 1, 2""".stripMargin

  /** l-diversity over the same quasi-identifier classes as
    * [[kAnonymity]]: k-anonymity alone fails the homogeneity attack —
    * a class of 50 customers all sharing one sensitive value leaks it
    * for every member despite k=50. Per (nation, segment) class this
    * reports the number of DISTINCT sensitive values (the l), the most
    * common value's share (the homogeneity-attack success rate), and
    * the at-risk flag (l < 3 or a dominant value above 80%). The
    * sensitive attribute is the coarse account-balance band — the
    * standard formulation needs a categorical attribute, and banding
    * is integer arithmetic both engines share. Two-level aggregation,
    * both keyed corpus-wide; the per-class rollup is
    * |classes|-bounded output, not a parallelism bug.
    */
  def lDiversity(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 2000).cast("long").as("band"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(sum(col("cnt")).cast("long").as("class_size"),
        count(lit(1)).as("l_distinct"),
        round(max(col("cnt")).cast("double") / sum(col("cnt")).cast("double"), 9)
          .as("top_share"))
      .withColumn("at_risk",
        col("l_distinct") < 3 || col("top_share") > 0.8)

  private val lDiversitySql =
    """SELECT c_nationkey, c_mktsegment,
      |  CAST(SUM(cnt) AS BIGINT) AS class_size,
      |  count(*) AS l_distinct,
      |  round(CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 9)
      |    AS top_share,
      |  count(*) < 3 OR
      |    round(CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 9) > 0.8
      |    AS at_risk
      |FROM (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(floor(c_acctbal / 2000) AS BIGINT) AS band, count(*) AS cnt
      |  FROM customer GROUP BY 1, 2, 3)
      |GROUP BY 1, 2""".stripMargin

  /** Differentially-private count release (r8): per-class counts over
    * the [[kAnonymity]] quasi-identifier classes with Laplace(1/ε)
    * noise, ε = 1 — the standard mechanism for a sensitivity-1 count
    * query (Dwork et al. 2006). The noise draw inverts the Laplace
    * CDF at u = hash60(class)/2⁶⁰ − 0.5: noise = −sign(u)·ln(1−2|u|)/ε.
    *
    * REPRODUCIBILITY vs PRIVACY: the portable-hash draw makes the
    * release deterministic — exactly what a cross-engine oracle (and
    * a regression suite) needs to pin the MECHANISM, and exactly what
    * a real deployment must NOT do (a public seed leaks the noise;
    * production swaps the hash for secret randomness, changing
    * nothing else in the plan). The hash input is the class key, so
    * per-class draws are independent (the poisson_bootstrap r8
    * discipline). ln's last-ulp libm variance is absorbed by round-6
    * (the zipf_fit/token_entropy precedent); the division by 2⁶⁰ is
    * exact (power of two). The draw is SHIFTED by +0.5 before the
    * division (u01 = (h+0.5)/2⁶⁰ — r8 advice): the raw h/2⁶⁰ form
    * hits u01 = 0 exactly when hash60(class) == 0 (probability 2⁻⁶⁰
    * per class, but deterministic garbage if it lands), where
    * ln(1−2|u|) = ln(0) = −∞; the midpoint shift keeps u01 in
    * (0, 1) exclusive at both ends, identically in both engines.
    *
    * Scale shape: ONE keyed aggregation; the noise is a row-local
    * projection over the |classes|-bounded result.
    */
  def dpCountRelease(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.CrossHash
    val u01 = (CrossHash.hash60(
      concat(col("c_nationkey").cast("string"), lit("|"), col("c_mktsegment")))
      .cast("double") + lit(0.5)) / lit(1152921504606846976.0) // 2^60, exact
    val u = u01 - 0.5
    val noise = -signum(u) * log(lit(1.0) - lit(2.0) * abs(u))
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .select(col("c_nationkey"), col("c_mktsegment"),
        round(col("n") + noise, 6).as("released"),
        lit(1.0).as("epsilon"))
  }

  private val dpCountReleaseSql = {
    val h = graft.functions.CrossHash.hash60Sql(
      "CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment")
    s"""WITH g AS (
       |  SELECT c_nationkey, c_mktsegment, count(*) AS n,
       |    (CAST($h AS DOUBLE) + 0.5) / 1152921504606846976.0 - 0.5 AS u
       |  FROM customer GROUP BY 1, 2)
       |SELECT c_nationkey, c_mktsegment,
       |  round(n + -sign(u) * ln(1.0 - 2.0 * abs(u)), 6) AS released,
       |  CAST(1.0 AS DOUBLE) AS epsilon
       |FROM g""".stripMargin
  }

  /** Month-over-month revenue report: exact decimal monthly totals
    * with the previous month's total and the percentage change — the
    * BI staple that composes date_trunc, an exact aggregate, and an
    * offset window. The lag runs over the |months|-sized result, never
    * the fact table; pct change is one IEEE division rounded to 9 dp.
    */
  def momRevenue(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("month"))
    Tables.orders(spark, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(sum(col("o_totalprice").cast(dec)).as("rev"), count(lit(1)).as("n_orders"))
      .withColumn("prev_rev", lag(col("rev"), 1).over(w))
      .select(col("month"), col("rev").cast("double").as("revenue"),
        col("n_orders"),
        round((col("rev") - col("prev_rev")).cast("double")
          / col("prev_rev").cast("double") * 100.0, 9).as("pct_change"))
  }

  private val momRevenueSql =
    """SELECT month, CAST(rev AS DOUBLE) AS revenue, n_orders,
      |  round(CAST(rev - prev_rev AS DOUBLE) / CAST(prev_rev AS DOUBLE)
      |    * 100.0, 9) AS pct_change
      |FROM (
      |  SELECT month, rev, n_orders, lag(rev, 1) OVER (ORDER BY month) AS prev_rev
      |  FROM (
      |    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
      |      SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
      |      count(*) AS n_orders
      |    FROM orders GROUP BY 1))""".stripMargin

  /** Decile lift table — the model-evaluation report: events ranked by
    * a score (here `value` stands in for a model score), cut into
    * deciles (deterministic ntile ordering), and each decile's
    * conversion rate compared against the global base rate. Decile 1
    * of a useful score shows lift ≫ 1. Rates are exact-integer
    * divisions in double; the global base rate joins back as a
    * broadcast scalar.
    *
    * Scale shape: the decile cut is NOT a global `ntile` window (which
    * single-partitions the corpus) — it's the exact distributed rank
    * from [[RangeRank]] (sampled range buckets + broadcast offsets +
    * partitioned windows) fed through the closed-form ntile formula.
    * Same hash as the oracle's `ntile(10)`, zero corpus-sized
    * single-partition stages (PlanContractSpec pins this).
    */
  def decileLift(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("value"),
        (col("event_type") === "purchase").cast("long").as("converted"))
    val base = ev.agg(
      (sum(col("converted")).cast("double") / count(lit(1))).as("base_rate"))
    RangeRank.withRankDesc(ev, "value", "event_id", "rnk",
        totalOut = Some("ntot"))
      .withColumn("decile",
        RangeRank.ntileFromRank(col("rnk"), col("ntot"), 10))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        sum(col("converted")).as("n_converted"))
      .crossJoin(broadcast(base))
      .select(col("decile"), col("n"), col("n_converted"),
        (col("n_converted").cast("double") / col("n")).as("rate"),
        round((col("n_converted").cast("double") / col("n"))
          / col("base_rate"), 9).as("lift"))
  }

  private val decileLiftSql =
    """WITH ev AS (
      |  SELECT event_id, value,
      |    CAST(event_type = 'purchase' AS BIGINT) AS converted
      |  FROM events),
      |base AS (
      |  SELECT CAST(SUM(converted) AS DOUBLE) / count(*) AS base_rate FROM ev),
      |d AS (
      |  SELECT ntile(10) OVER (ORDER BY value DESC, event_id ASC) AS decile,
      |    converted
      |  FROM ev)
      |SELECT decile, count(*) AS n,
      |  CAST(SUM(converted) AS BIGINT) AS n_converted,
      |  CAST(SUM(converted) AS DOUBLE) / count(*) AS rate,
      |  round((CAST(SUM(converted) AS DOUBLE) / count(*)) / base_rate, 9) AS lift
      |FROM d CROSS JOIN base
      |GROUP BY decile, base_rate""".stripMargin

  /** LISTAGG / string_agg (SQL:2016): suppliers per nation as one
    * ordered comma-joined string — the report-friendly denormalization.
    * Spelled orderless-safe: collect_list is non-deterministic across
    * partitions, so the sort happens INSIDE the row (sort_array) before
    * joining — the only way string aggregation is reproducible on a
    * cluster.
    */
  def listaggNames(spark: SparkSession, dir: String): DataFrame =
    Tables.supplier(spark, dir)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        array_join(sort_array(collect_list(col("s_name"))), ",").as("names"))

  private val listaggNamesSql =
    """SELECT s_nationkey, count(*) AS n_suppliers,
      |  string_agg(s_name, ',' ORDER BY s_name) AS names
      |FROM supplier GROUP BY 1""".stripMargin

  /** ANSI-robustness family: `try_cast` / guarded division turn
    * malformed inputs into NULLs instead of failed jobs — the
    * difference between a 100 TB ingest that quarantines bad rows and
    * one that dies at hour nine. Numeric round-trips are exact because
    * both engines print doubles shortest-roundtrip; only the PARSED
    * values are emitted (the intermediate string representation is
    * engine-private).
    */
  def safeCasts(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .withColumn("s",
        when(col("c_custkey") % 3 === 0, col("c_acctbal").cast("string"))
          .when(col("c_custkey") % 3 === 1, lit("N/A"))
          .otherwise(lit("")))
      .withColumn("ds",
        when(col("c_custkey") % 2 === 0, lit("2024-03-15"))
          .otherwise(lit("not-a-date")))
      .select(col("c_custkey"),
        expr("try_cast(s AS DOUBLE)").as("as_double"),
        expr("try_cast(ds AS DATE)").as("as_date"),
        expr("try_divide(c_acctbal, c_custkey % 5)").as("safe_div"))

  private val safeCastsSql =
    """SELECT c_custkey,
      |  TRY_CAST(CASE WHEN c_custkey % 3 = 0 THEN CAST(c_acctbal AS VARCHAR)
      |                WHEN c_custkey % 3 = 1 THEN 'N/A'
      |                ELSE '' END AS DOUBLE) AS as_double,
      |  TRY_CAST(CASE WHEN c_custkey % 2 = 0 THEN '2024-03-15'
      |                ELSE 'not-a-date' END AS DATE) AS as_date,
      |  CASE WHEN c_custkey % 5 = 0 THEN NULL
      |       ELSE c_acctbal / (c_custkey % 5) END AS safe_div
      |FROM customer""".stripMargin

  /** Higher-order array-function parity: transform / filter /
    * aggregate (fold) / sort / slice over per-document token-length
    * arrays — the lambda surface a DataFrame user reaches for when the
    * data is nested. Integer element math keeps every engine exact.
    *
    * Scale note: pure per-row projection, shuffle-free. Spark's lambda
    * HOFs do NOT whole-stage-codegen (VERDICT r1 #4) — fine here where
    * the op IS the lambda surface; hot inner loops use native
    * expressions instead (vec_dot, shingle kernels).
    */
  def arrayHof(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        transform(split(col("text"), " "), t => length(t)).as("lens"))
      .select(col("doc_id"),
        size(filter(col("lens"), x => x > 4)).cast("long").as("n_long"),
        aggregate(col("lens"), lit(0L), (acc, x) => acc + x).as("total_len"),
        array_max(col("lens")).cast("long").as("longest"),
        array_join(slice(sort_array(col("lens"), asc = false), 1, 3), ",")
          .as("top_lens"))

  private val arrayHofSql =
    """SELECT doc_id,
      |  CAST(len(list_filter(lens, x -> x > 4)) AS BIGINT) AS n_long,
      |  CAST(list_aggregate(lens, 'sum') AS BIGINT) AS total_len,
      |  CAST(list_max(lens) AS BIGINT) AS longest,
      |  array_to_string(list_sort(lens, 'DESC')[1:3], ',') AS top_lens
      |FROM (SELECT doc_id,
      |        list_transform(string_split(text, ' '), t -> len(t)) AS lens
      |      FROM documents)""".stripMargin

  /** Top-k per group WITH ties (rank, not row_number): every row whose
    * quantity ranks in the flag's top 3 — the "all record holders"
    * semantics row_number-based top-k silently drops. Still plans as
    * WindowGroupLimit (rank is group-limit-eligible), so partial top-k
    * runs map-side before the exchange.
    */
  def topkTies(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity").desc)
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity"),
        rank().over(w).as("rk"))
      .where(col("rk") <= 3)
      .groupBy(col("l_returnflag"), col("l_quantity"), col("rk"))
      .agg(count(lit(1)).as("n_rows"))
  }

  private val topkTiesSql =
    """SELECT l_returnflag, l_quantity, rk, count(*) AS n_rows
      |FROM (
      |  SELECT l_returnflag, l_quantity,
      |    rank() OVER (PARTITION BY l_returnflag
      |      ORDER BY l_quantity DESC) AS rk
      |  FROM lineitem)
      |WHERE rk <= 3
      |GROUP BY 1, 2, 3""".stripMargin

  /** Robust dispersion per event type: exact linear-interpolated median
    * and MAD (median absolute deviation) — the outlier-resistant pair
    * quality monitoring uses where mean/stddev get dragged by tails.
    * Two type-key exchanges (values, then absolute deviations joined
    * against the broadcast |types|-row median relation); results
    * rounded to 9 dp to absorb engine interpolation ulps.
    */
  def robustStats(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    ev.join(broadcast(med), Seq("event_type"))
      .select(col("event_type"), col("med"),
        abs(col("value") - col("med")).as("adev"))
      .groupBy(col("event_type"))
      .agg(first(col("med")).as("m"), count(lit(1)).as("n"),
        expr("percentile(adev, 0.5)").as("mad"))
      .select(col("event_type"), round(col("m"), 9).as("median_value"),
        col("n"), round(col("mad"), 9).as("mad"))
  }

  private val robustStatsSql =
    """WITH med AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS m
      |  FROM events GROUP BY 1)
      |SELECT events.event_type, round(med.m, 9) AS median_value,
      |  count(*) AS n,
      |  round(quantile_cont(abs(value - med.m), 0.5), 9) AS mad
      |FROM events JOIN med ON events.event_type = med.event_type
      |GROUP BY 1, med.m""".stripMargin

  /** Rolling z-score anomaly flags: each event's value against the
    * mean/stddev of its type's 20 PRECEDING events (current row
    * excluded — a point must not normalize itself). The streaming-ish
    * monitoring primitive, spelled as one frame-bounded window.
    *
    * Exactness: frame sum and sum-of-squares ride exact DECIMAL
    * accumulators (order-free), count is exact, and mean/var/z are
    * derived from those exact ingredients with the identical IEEE
    * operation sequence in both engines — no rounding crutch needed,
    * but z is still rounded to 9 dp as belt-and-braces. Values are
    * quantized to DECIMAL(18,6) BEFORE squaring: an (18,6)² product
    * is DECIMAL(37,12) — fully representable in both engines — where
    * a (28,12)² square silently resolves to DECIMAL(38,6) under
    * Spark's precision-loss rule and drops digits the oracle keeps.
    * (Contract: values carry ≤ 6 decimal places, as event `value`
    * does.) One event_type exchange.
    */
  def anomalyZscore(spark: SparkSession, dir: String): DataFrame = {
    val d6 = DecimalType(18, 6)
    // Distributed bounded frames (r7): same carry-prefix shape as
    // windowMoving — the 20-row trailing stats never require a
    // per-type corpus sort on |event_type| tasks.
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
    val (staged, wb) = RangeRank.boundedFrameStage(ev, Seq("event_type"),
      "ts", "event_id", lookback = 20,
      cuts = Some(RangeRank.sampleCutsMemo(s"events.ts:$dir",
        ev.select(col("ts")), "ts")))
    val w = wb.rowsBetween(-20, -1)
    staged
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("value").cast(d6)).over(w).cast("double"))
      .withColumn("ss",
        sum(col("value").cast(d6) * col("value").cast(d6)).over(w)
          .cast("double"))
      .where(!col("__rr_carry") && col("n") >= 5)
      .select(col("event_id"), col("event_type"), col("value"),
        round((col("value") - col("s") / col("n"))
          / sqrt((col("ss") - col("s") * col("s") / col("n"))
            / (col("n") - 1)), 9).as("z"))
      .where(abs(col("z")) > 2.5)
  }

  private val anomalyZscoreSql =
    """SELECT event_id, event_type, value, z FROM (
      |  SELECT event_id, event_type, value,
      |    round((value - s / n) / sqrt((ss - s * s / n) / (n - 1)), 9) AS z
      |  FROM (
      |    SELECT event_id, event_type, value,
      |      count(*) OVER w AS n,
      |      CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s,
      |      CAST(SUM(CAST(value AS DECIMAL(18,6))
      |        * CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS ss
      |    FROM events
      |    WINDOW w AS (PARTITION BY event_type
      |      ORDER BY ts ASC, event_id ASC
      |      ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
      |  WHERE n >= 5)
      |WHERE abs(z) > 2.5""".stripMargin

  /** Spearman rank correlation per group (Pearson over average ranks —
    * the robust complement to corr_covar's Pearson): monotone
    * association between quantity and price within each return flag.
    *
    * Exactness: average ranks are kept as the INTEGER 2·avg_rank =
    * rank_asc − rank_desc + n + 1 (a tie block spanning [r, r+c−1] has
    * avg rank r + (c−1)/2; the desc-rank identity avoids a per-value
    * count window), so every sum is an exact DECIMAL fold and the
    * doubling cancels in the correlation ratio. One double division +
    * sqrt at the end, rounded 1e-9 — the corr_covar discipline.
    *
    * Scale shape: ONE exchange on the group key; the three windows
    * (two rank sorts + the partition count) share it. The rank sort is
    * the unavoidable cost of rank statistics; everything after is a
    * grouped aggregation with map-side partials.
    */
  def spearmanCorr(spark: SparkSession, dir: String): DataFrame = {
    def r2(c: String) =
      s"CAST(rank() OVER (PARTITION BY l_returnflag ORDER BY $c ASC) " +
        s"- rank() OVER (PARTITION BY l_returnflag ORDER BY $c DESC) " +
        s"+ count(*) OVER (PARTITION BY l_returnflag) + 1 AS BIGINT)"
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .selectExpr("l_returnflag",
        s"${r2("l_quantity")} AS r2q", s"${r2("l_extendedprice")} AS r2p")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(SUM(CAST(r2q AS DECIMAL(38,0))) AS DOUBLE)").as("sx"),
        expr("CAST(SUM(CAST(r2p AS DECIMAL(38,0))) AS DOUBLE)").as("sy"),
        expr("CAST(SUM(CAST(r2q * r2q AS DECIMAL(38,0))) AS DOUBLE)").as("sxx"),
        expr("CAST(SUM(CAST(r2p * r2p AS DECIMAL(38,0))) AS DOUBLE)").as("syy"),
        expr("CAST(SUM(CAST(r2q * r2p AS DECIMAL(38,0))) AS DOUBLE)").as("sxy"))
      .select(col("l_returnflag"), col("n"),
        expr("round((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 9)")
          .as("spearman_qty_price"))
  }

  private val spearmanCorrSql = {
    def r2(c: String) =
      s"CAST(rank() OVER (PARTITION BY l_returnflag ORDER BY $c ASC) " +
        s"- rank() OVER (PARTITION BY l_returnflag ORDER BY $c DESC) " +
        s"+ count(*) OVER (PARTITION BY l_returnflag) + 1 AS BIGINT)"
    s"""WITH r AS (
       |  SELECT l_returnflag,
       |    ${r2("l_quantity")} AS r2q, ${r2("l_extendedprice")} AS r2p
       |  FROM lineitem),
       |m AS (
       |  SELECT l_returnflag, count(*) AS n,
       |    CAST(SUM(CAST(r2q AS DECIMAL(38,0))) AS DOUBLE) AS sx,
       |    CAST(SUM(CAST(r2p AS DECIMAL(38,0))) AS DOUBLE) AS sy,
       |    CAST(SUM(CAST(r2q * r2q AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
       |    CAST(SUM(CAST(r2p * r2p AS DECIMAL(38,0))) AS DOUBLE) AS syy,
       |    CAST(SUM(CAST(r2q * r2p AS DECIMAL(38,0))) AS DOUBLE) AS sxy
       |  FROM r GROUP BY 1)
       |SELECT l_returnflag, n,
       |  round((n * sxy - sx * sy)
       |    / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 9)
       |    AS spearman_qty_price
       |FROM m""".stripMargin
  }

  /** Two-sample Kolmogorov–Smirnov test: D = max over the merged
    * support of |CDF₀ − CDF₁| between two sources' document-length
    * distributions — the standard distribution-drift gate between two
    * ingest sources (did src1's length profile shift vs src0?).
    *
    * Exactness: the CDF difference is kept CROSS-MULTIPLIED —
    * |c₀·n₁ − c₁·n₀| in integers — so the argmax and maximum are exact
    * in both engines; the single division happens once on the final
    * 1-row result (round 1e-9). Tie on the max: smallest length wins
    * (deterministic in both engines).
    *
    * Scale shape: lengths collapse to their distinct values FIRST
    * (map-side combine), so the cumulative window runs over the
    * |support| relation — value-domain-sized, like a catalog; the
    * global window is a deliberate single-partition pass over that
    * tiny relation, and the scalar totals/max broadcast back.
    */
  def ksTest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = Tables.documents(spark, dir)
      .where(col("source").isin("src0", "src1"))
      .groupBy(col("n_chars").as("v"))
      .agg(count(when(col("source") === "src0", 1)).as("a"),
        count(when(col("source") === "src1", 1)).as("b"))
    val c = g.select(col("v"),
      sum(col("a")).over(Window.orderBy(col("v"))).as("ca"),
      sum(col("b")).over(Window.orderBy(col("v"))).as("cb"))
    val tot = g.agg(sum(col("a")).as("n0"), sum(col("b")).as("n1"),
      count(lit(1)).as("sup"))
    // runtime guard on the bounded-domain assumption (r6 verdict #7):
    // the global cumulative window above is only legitimate because the
    // support is value-domain-sized. A future continuous-valued column
    // would silently single-partition the corpus — fail loudly instead.
    // The count rides the existing totals agg (no extra pass).
    val j = c.crossJoin(broadcast(tot))
      .where(when(col("sup") <= Stats.MaxWindowSupport, lit(true))
        .otherwise(raise_error(concat(lit("ks_test: support cardinality "),
          col("sup"), lit(" exceeds the bounded-domain contract — " +
            "a continuous column must pre-bucket before this window")))))
      .select(col("v"), col("n0"), col("n1"),
        abs(col("ca") * col("n1") - col("cb") * col("n0")).as("diff"))
    val m = j.agg(max(col("diff")).as("md"))
    j.crossJoin(broadcast(m))
      .where(col("diff") === col("md"))
      .groupBy(col("n0"), col("n1"), col("md"))
      .agg(min(col("v")).as("ks_at"))
      .select(col("n0"), col("n1"),
        expr("round(CAST(md AS DOUBLE) / (n0 * n1), 9)").as("d_stat"),
        col("ks_at"))
  }

  private val ksTestSql =
    """WITH g AS (
      |  SELECT n_chars AS v,
      |    count(*) FILTER (WHERE source = 'src0') AS a,
      |    count(*) FILTER (WHERE source = 'src1') AS b
      |  FROM documents WHERE source IN ('src0', 'src1') GROUP BY 1),
      |c AS (SELECT v, SUM(a) OVER (ORDER BY v) AS ca,
      |             SUM(b) OVER (ORDER BY v) AS cb FROM g),
      |tot AS (SELECT CAST(SUM(a) AS BIGINT) AS n0,
      |               CAST(SUM(b) AS BIGINT) AS n1 FROM g),
      |j AS (SELECT v, n0, n1, abs(ca * n1 - cb * n0) AS diff FROM c, tot),
      |m AS (SELECT max(diff) AS md FROM j)
      |SELECT n0, n1, round(CAST(md AS DOUBLE) / (n0 * n1), 9) AS d_stat,
      |  min(v) AS ks_at
      |FROM j, m WHERE diff = md GROUP BY n0, n1, md""".stripMargin

  /** Per-group top-k through the bounded-heap aggregate
    * (functions/TopKAgg.scala) instead of the row_number window: the
    * window idiom exchanges and sorts EVERY input row; the heap
    * aggregate keeps ≤ k candidates per partition per group map-side,
    * so the exchange carries at most k pairs per (partition, group)
    * and the fact relation itself never shuffles. Unique ids make the
    * (value DESC, id ASC) order tie-free, so the result is
    * merge-order-independent and matches the window-idiom oracle
    * exactly.
    */
  def groupedTopkAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      // the heap aggregate's update requires BOTH children non-null —
      // filter event_id explicitly on both sides so the oracle
      // equivalence is pinned rather than resting on fixture
      // non-nullness
      .where(col("value").isNotNull && col("event_id").isNotNull)
      .groupBy(col("event_type"))
      .agg(call_function("topk_pairs", col("value"), col("event_id"), lit(5))
        .as("tk"))
      .select(col("event_type"), posexplode(col("tk")))
      .select(col("event_type"), (col("pos") + 1).cast("long").as("rnk"),
        col("col.score").as("value"), col("col.id").as("event_id"))

  private val groupedTopkAggSql =
    """SELECT event_type, CAST(rnk AS BIGINT) AS rnk, value, event_id FROM (
      |  SELECT event_type, value, event_id,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY value DESC, event_id ASC) AS rnk
      |  FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL)
      |WHERE rnk <= 5""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("grouped_topk_agg", groupedTopkAgg, Some(groupedTopkAggSql)),
    Op("array_hof", arrayHof, Some(arrayHofSql)),
    Op("spearman_corr", spearmanCorr, Some(spearmanCorrSql)),
    Op("ks_test", ksTest, Some(ksTestSql)),
    Op("anomaly_zscore", anomalyZscore, Some(anomalyZscoreSql)),
    Op("topk_ties", topkTies, Some(topkTiesSql)),
    Op("robust_stats", robustStats, Some(robustStatsSql)),
    Op("window_offsets", windowOffsets, Some(windowOffsetsSql)),
    Op("window_ranks", windowRanks, Some(windowRanksSql)),
    Op("rollup_agg", rollupAgg, Some(rollupAggSql)),
    Op("cube_agg", cubeAgg, Some(cubeAggSql)),
    Op("grouping_sets_agg", groupingSetsAgg, Some(groupingSetsAggSql)),
    Op("set_ops", setOps, Some(setOpsSql)),
    Op("set_ops_all", setOpsAll, Some(setOpsAllSql)),
    Op("window_moving", windowMoving, Some(windowMovingSql)),
    Op("window_range_time", windowRangeTime, Some(windowRangeTimeSql)),
    Op("winsorize", winsorize, Some(winsorizeSql)),
    Op("gaps_islands", gapsIslands, Some(gapsIslandsSql)),
    Op("ab_test", abTest, Some(abTestSql)),
    Op("welch_t_test", welchTTest, Some(welchTTestSql)),
    Op("unpivot_long", unpivotLong, Some(unpivotLongSql)),
    Op("percentile_agg", percentileAgg, Some(percentileAggSql)),
    Op("percentile_approx_sketch", percentileApproxSketch, Some(percentileApproxSketchSql)),
    Op("scalar_extended", scalarExtended, Some(scalarExtendedSql)),
    Op("safe_casts", safeCasts, Some(safeCastsSql)),
    Op("listagg_names", listaggNames, Some(listaggNamesSql)),
    Op("window_nth", windowNth, Some(windowNthSql)),
    Op("date_dim", dateDim, Some(dateDimSql)),
    Op("k_anonymity", kAnonymity, Some(kAnonymitySql)),
    Op("l_diversity", lDiversity, Some(lDiversitySql)),
    Op("dp_count_release", dpCountRelease, Some(dpCountReleaseSql)),
    Op("recursive_cte", recursiveCte, Some(recursiveCteSql)),
    Op("decile_lift", decileLift, Some(decileLiftSql)),
    Op("mom_revenue", momRevenue, Some(momRevenueSql)),
  )
}
