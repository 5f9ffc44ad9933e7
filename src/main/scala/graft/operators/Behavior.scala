package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Op, Tables}

/** Behavioral event analytics beyond the reference's epidemiology
  * focus: cohort retention and state-transition (Markov) matrices over
  * the events stream — the product-analytics queries any engine sold
  * as "general event analytics" must answer.
  */
object Behavior {

  /** Classic cohort-retention triangle: users are cohorted by their
    * first active day; each (cohort, day-offset) cell counts users
    * active that many days after joining.
    *
    * Scale shape: the raw event stream is touched by exactly one
    * exchange — the (user, day) distinct, which partial-aggregates
    * map-side first. The per-user cohort window then re-shuffles only
    * the DISTINCT user-days (users × active-days, orders of magnitude
    * below the event count), and the final cell aggregation combines
    * map-side into a calendar-bounded cohort×offset result. No
    * self-join — the join-back spelling would shuffle raw events by
    * user twice.
    */
  /** Daily growth curve: active users, NEW users (first-ever
    * appearance), and the cumulative registered-user total per day —
    * the adoption dashboard every event stream feeds.
    *
    * Scale shape: the fact collapses to distinct (user, day) map-side,
    * first-seen is a per-user min (same user_id exchange), and only
    * the days-sized relation reaches the cumulative window (global
    * window over a calendar-bounded relation — deliberate, like the
    * KS support walk).
    */
  def userGrowth(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val userDays = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val firstSeen = userDays.groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"))
    val daily = userDays.groupBy(col("day"))
      .agg(count(lit(1)).as("active_users"))
    val news = firstSeen.groupBy(col("first_day").as("day"))
      .agg(count(lit(1)).as("new_users"))
    daily.join(news, Seq("day"), "left")
      .select(col("day"), col("active_users"),
        coalesce(col("new_users"), lit(0L)).as("new_users"))
      .withColumn("total_users",
        sum(col("new_users")).over(Window.orderBy(col("day"))))
  }

  private val userGrowthSql =
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |fs AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY 1),
      |daily AS (SELECT day, count(*) AS active_users FROM ud GROUP BY 1),
      |news AS (SELECT first_day AS day, count(*) AS new_users FROM fs GROUP BY 1)
      |SELECT daily.day, active_users,
      |  coalesce(new_users, 0) AS new_users,
      |  CAST(SUM(coalesce(new_users, 0)) OVER (ORDER BY daily.day) AS BIGINT)
      |    AS total_users
      |FROM daily LEFT JOIN news ON daily.day = news.day""".stripMargin

  /** Pareto / ABC contribution analysis: customers ranked by total
    * order revenue, each with its exact share of the grand total, the
    * running cumulative share, and the A/B/C class (top-80% of
    * revenue → A, next 15% → B, tail → C — classic inventory ABC).
    *
    * Exactness: revenue folds as DECIMAL; shares divide the decimal
    * sums as doubles rounded 1e-9; the class comes from comparing the
    * PREVIOUS cumulative decimal (strictly-before revenue) so the
    * boundary row lands in A deterministically in both engines.
    *
    * Scale shape: one exchange on custkey for the revenue rollup; the
    * global cumulative walk is the [[RangeRank]] distributed
    * prefix-sum (sampled range buckets + broadcast bucket offsets +
    * partitioned windows), NOT a single-partition window — at 10⁷–10⁸
    * customers the naive `SUM OVER (ORDER BY …)` puts the whole
    * customer relation in one task. The 1-row grand total broadcasts.
    */
  def paretoContribution(spark: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val rev = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast(dec)).as("revenue"))
    val tot = rev.agg(sum(col("revenue")).as("grand"))
    // every ratio divides the exact decimal sums AS DOUBLES — Spark's
    // decimal/decimal division truncates the result scale (≈6 digits)
    // while DuckDB keeps more, so the quotient must be IEEE on both
    RangeRank.withRunningDesc(rev,
        "revenue", "o_custkey", col("revenue"), "cum_incl")
      .crossJoin(broadcast(tot))
      .withColumn("cum_before", col("cum_incl") - col("revenue"))
      .select(col("o_custkey"),
        col("revenue").cast("double").as("revenue"),
        round(col("revenue").cast("double") / col("grand").cast("double"), 9)
          .as("share"),
        round((col("cum_before") + col("revenue")).cast("double")
          / col("grand").cast("double"), 9).as("cum_share"),
        when(col("cum_before").cast("double") / col("grand").cast("double") < 0.80, "A")
          .when(col("cum_before").cast("double") / col("grand").cast("double") < 0.95, "B")
          .otherwise("C").as("abc_class"))
  }

  private val paretoContributionSql =
    """WITH rev AS (
      |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT SUM(revenue) AS grand FROM rev),
      |c AS (SELECT o_custkey, revenue, grand,
      |    coalesce(SUM(revenue) OVER (ORDER BY revenue DESC, o_custkey ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      CAST(0 AS DECIMAL(18,2))) AS cum_before
      |  FROM rev, tot)
      |SELECT o_custkey,
      |  CAST(revenue AS DOUBLE) AS revenue,
      |  round(CAST(revenue AS DOUBLE) / CAST(grand AS DOUBLE), 9) AS share,
      |  round(CAST(cum_before + revenue AS DOUBLE) / CAST(grand AS DOUBLE), 9)
      |    AS cum_share,
      |  CASE WHEN CAST(cum_before AS DOUBLE) / CAST(grand AS DOUBLE) < 0.80 THEN 'A'
      |       WHEN CAST(cum_before AS DOUBLE) / CAST(grand AS DOUBLE) < 0.95 THEN 'B'
      |       ELSE 'C' END AS abc_class
      |FROM c""".stripMargin

  def cohortRetention(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .withColumn("cohort",
        min(col("day")).over(Window.partitionBy(col("user_id"))))
      .groupBy(col("cohort"),
        datediff(col("day"), col("cohort")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))

  private val cohortRetentionSql =
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |c AS (SELECT user_id, day,
      |        min(day) OVER (PARTITION BY user_id) AS cohort
      |      FROM ud)
      |SELECT cohort, CAST(date_diff('day', cohort, day) AS BIGINT) AS day_offset,
      |  count(*) AS n_users
      |FROM c GROUP BY 1, 2""".stripMargin

  /** First-order event-type transition matrix: for every user-adjacent
    * (previous type → type) pair, its corpus count and the conditional
    * probability P(dst | src). The Markov-chain summary behind "what do
    * users do next" and session-flow Sankeys.
    *
    * Scale shape: one user_id exchange for the lag window; the pair
    * count is map-side combined down to |types|² rows, and the
    * conditional-probability window runs on that tiny relation. Exact
    * long counts; the probability is a single IEEE division —
    * bit-identical across engines.
    */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type").as("dst"),
        lag(col("event_type"), 1).over(w).as("src"))
      .where(col("src").isNotNull)
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        col("n") / sum(col("n")).over(Window.partitionBy(col("src"))))
  }

  private val eventTransitionsSql =
    """WITH pairs AS (
      |  SELECT lag(event_type, 1) OVER (PARTITION BY user_id
      |           ORDER BY ts ASC, event_id ASC) AS src,
      |         event_type AS dst
      |  FROM events),
      |counted AS (
      |  SELECT src, dst, count(*) AS n FROM pairs
      |  WHERE src IS NOT NULL GROUP BY 1, 2)
      |SELECT src, dst, n,
      |  CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY src) AS p
      |FROM counted""".stripMargin

  /** Ordered 3-step funnel (view → click → purchase): a user counts
    * for a step only if it happened AT OR AFTER their previous step —
    * the sequencing constraint that separates a funnel from three
    * independent counts. Emits users-reached per stage.
    *
    * Scale shape: three user-keyed aggregates/joins, every one
    * partial-aggregated before its exchange and co-partitioned on
    * user_id after the first, so the funnel costs one logical user
    * repartition; stage outputs are |stages| rows.
    */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    def firstAfter(evType: String, prev: DataFrame, prevCol: String, out: String) =
      ev.where(col("event_type") === evType)
        .join(prev, Seq("user_id"))
        .where(col("ts") >= col(prevCol))
        .groupBy(col("user_id")).agg(min(col("ts")).as(out))
    val v = ev.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val c = firstAfter("click", v, "t1", "t2")
    val p = firstAfter("purchase", c.select(col("user_id"), col("t2")), "t2", "t3")
    v.agg(count(lit(1)).as("n_users")).select(lit(1L).as("step"), lit("view").as("stage"), col("n_users"))
      .unionByName(c.agg(count(lit(1)).as("n_users"))
        .select(lit(2L).as("step"), lit("click").as("stage"), col("n_users")))
      .unionByName(p.agg(count(lit(1)).as("n_users"))
        .select(lit(3L).as("step"), lit("purchase").as("stage"), col("n_users")))
  }

  private val funnelStepsSql =
    """WITH v AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |  JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts >= v.t1 GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |  JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts >= c.t2 GROUP BY 1)
      |SELECT CAST(1 AS BIGINT) AS step, 'view' AS stage, count(*) AS n_users FROM v
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), 'click', count(*) FROM c
      |UNION ALL
      |SELECT CAST(3 AS BIGINT), 'purchase', count(*) FROM p""".stripMargin

  /** RFM segmentation: per user recency (last purchase), frequency
    * (purchase count), monetary (exact decimal spend), each quartiled
    * by ntile(4) with full deterministic ordering (metric, then
    * user_id) so bucket edges are engine-identical.
    *
    * Scale note: the per-user rollup is one exchange; the three
    * quartile cuts are NOT global ntile windows (each would
    * single-partition the user relation — 10⁷–10⁸ rows in production).
    * Each is the [[RangeRank]] exact distributed rank (approx-quantile
    * range buckets + broadcast offsets + partitioned windows) fed
    * through the closed-form ntile formula — hash-identical to the
    * oracle's `ntile(4)`, zero single-partition stages over users
    * (PlanContractSpec pins this).
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val rfm = Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(max(col("ts")).as("last_purchase"),
        count(lit(1)).as("frequency"),
        sum(col("value").cast(DecimalType(18, 6))).as("monetary"))
    // ONE multi-column sampling action over the base rollup feeds all
    // three cuts their quantile cutoffs: nesting the sampling would
    // re-execute every earlier cut's windows (≈9 corpus passes), and
    // even per-cut sampling on the base costs 3 rollup executions —
    // this is 1 + the final job
    val cuts = RangeRank.sampleCuts(rfm,
      Seq("last_purchase", "frequency", "monetary"))
    def quart(df: DataFrame, c: String, score: String): DataFrame =
      RangeRank.withRankDesc(df, c, "user_id", s"__rk_$score",
          totalOut = Some(s"__n_$score"), cuts = Some(cuts(c)))
        .withColumn(score, RangeRank.ntileFromRank(
          col(s"__rk_$score"), col(s"__n_$score"), 4))
        .drop(s"__rk_$score", s"__n_$score")
    val scored = quart(quart(quart(rfm,
      "last_purchase", "r_score"), "frequency", "f_score"),
      "monetary", "m_score")
    scored
      .select(col("user_id"), col("last_purchase"), col("frequency"),
        col("monetary").cast("double").as("monetary"),
        col("r_score"), col("f_score"), col("m_score"),
        concat(col("r_score").cast("string"), col("f_score").cast("string"),
          col("m_score").cast("string")).as("segment"))
  }

  private val rfmSegmentsSql =
    """WITH rfm AS (
      |  SELECT user_id, max(ts) AS last_purchase, count(*) AS frequency,
      |    SUM(CAST(value AS DECIMAL(18,6))) AS monetary
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
      |SELECT user_id, last_purchase, frequency,
      |  CAST(monetary AS DOUBLE) AS monetary,
      |  r_score, f_score, m_score,
      |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
      |    || CAST(m_score AS VARCHAR) AS segment
      |FROM (
      |  SELECT *,
      |    ntile(4) OVER (ORDER BY last_purchase DESC, user_id ASC) AS r_score,
      |    ntile(4) OVER (ORDER BY frequency DESC, user_id ASC) AS f_score,
      |    ntile(4) OVER (ORDER BY monetary DESC, user_id ASC) AS m_score
      |  FROM rfm)""".stripMargin


  /** Row-pattern detection (the MATCH_RECOGNIZE use case, emulated
    * with offset windows — Spark has no MATCH_RECOGNIZE, and neither
    * does DuckDB): V-shaped value reversals in each user's event
    * sequence — a strict local minimum with both neighbors ≥ 10%
    * higher. Emits the match row with its pattern context (prev,
    * min, next). One user exchange; the pattern predicate is pure
    * per-row arithmetic after the lag/lead projection.
    */
  def patternVShape(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        lag(col("value"), 1).over(w).as("prev_v"),
        lead(col("value"), 1).over(w).as("next_v"))
      .where(col("prev_v").isNotNull && col("next_v").isNotNull
        && col("prev_v") >= col("value") * 1.1
        && col("next_v") >= col("value") * 1.1)
      .select(col("user_id"), col("event_id"), col("prev_v"),
        col("value").as("min_v"), col("next_v"))
  }

  private val patternVShapeSql =
    """SELECT user_id, event_id, prev_v, value AS min_v, next_v
      |FROM (
      |  SELECT user_id, event_id, value,
      |    lag(value, 1) OVER w AS prev_v,
      |    lead(value, 1) OVER w AS next_v
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
      |WHERE prev_v IS NOT NULL AND next_v IS NOT NULL
      |  AND prev_v >= value * 1.1 AND next_v >= value * 1.1""".stripMargin

  /** Last-touch attribution: every purchase credits the most recent
    * PRECEDING non-purchase event of the same user ('direct' when the
    * purchase is the user's first touch) — the classic marketing
    * attribution next to [[funnelSteps]]/[[cohortRetention]]. Spelled
    * as the IGNORE-NULLS carry-forward window over each user's ordered
    * event stream (the window_nth idiom): one user-keyed exchange, no
    * self-join, no per-purchase scan-back. Revenue goes through
    * DECIMAL so the per-channel sums are engine-identical.
    */
  def attributionLastTouch(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"),
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w).as("touch"))
      .where(col("event_type") === "purchase")
      .groupBy(coalesce(col("touch"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("revenue"))
  }

  private val attributionLastTouchSql =
    """SELECT coalesce(touch, 'direct') AS channel,
      |  count(*) AS n_purchases,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT user_id, event_type, value,
      |    last_value(CASE WHEN event_type != 'purchase' THEN event_type END
      |      IGNORE NULLS) OVER (PARTITION BY user_id
      |        ORDER BY ts ASC, event_id ASC
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
      |  FROM events)
      |WHERE event_type = 'purchase'
      |GROUP BY 1""".stripMargin

  // declared LAST: object vals initialize in declaration order
  val ops: Seq[Op] = Seq(
    Op("attribution_last_touch", attributionLastTouch,
      Some(attributionLastTouchSql)),
    Op("user_growth", userGrowth, Some(userGrowthSql)),
    Op("pareto_contribution", paretoContribution, Some(paretoContributionSql)),
    Op("cohort_retention", cohortRetention, Some(cohortRetentionSql)),
    Op("event_transitions", eventTransitions, Some(eventTransitionsSql)),
    Op("funnel_steps", funnelSteps, Some(funnelStepsSql)),
    Op("rfm_segments", rfmSegments, Some(rfmSegmentsSql)),
    Op("pattern_v_shape", patternVShape, Some(patternVShapeSql)),
  )
}
