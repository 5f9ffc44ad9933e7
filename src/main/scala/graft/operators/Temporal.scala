package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Op, Tables}

/** Temporal join family beyond plain equi-joins: as-of (latest match at
  * or before each probe time) and bounded-interval range joins — the
  * two shapes event/feature pipelines need constantly and Spark has no
  * native operator for.
  *
  * Both are built scale-first:
  *  - as-of = ONE shuffle on the join key: markers and probes union
  *    into a single (key, time)-sorted stream and a running `last`
  *    window carries the newest marker forward — the merge-join form of
  *    as-of, never a per-probe inequality join (which plans as a
  *    broadcast nested loop: quadratic and unshippable at 100 TB).
  *  - range join = coarse time-bucket equi-join: the build side
  *    replicates into the 3 buckets a match could live in, the
  *    residual predicate trims false candidates. Candidates ∝ bucket
  *    occupancy, never |probe|×|build|.
  */
object Temporal {

  /** As-of join: each event picks the user's most recent 'purchase'
    * event at-or-before its timestamp (ties at the same microsecond
    * resolve to the marker — DuckDB ASOF `>=` semantics; markers are
    * pre-deduplicated per (user, ts) so the pick is unique).
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val markers = ev.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("last_purchase_id"))
    // kind 0 sorts before kind 1 at equal ts => an event co-timed with
    // a marker sees it (>= semantics, matching DuckDB ASOF JOIN).
    val tagged = markers
      .select(col("user_id"), col("ts"), lit(0).as("kind"),
        lit(null).cast("long").as("event_id"), col("last_purchase_id"))
      .unionByName(ev.select(col("user_id"), col("ts"), lit(1).as("kind"),
        col("event_id"), lit(null).cast("long").as("last_purchase_id")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("kind").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("lp_id", last(col("last_purchase_id"), ignoreNulls = true).over(w))
      .withColumn("lp_ts",
        last(when(col("kind") === 0, col("ts")), ignoreNulls = true).over(w))
      .where(col("kind") === 1)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("lp_ts").as("last_purchase_ts"),
        col("lp_id").as("last_purchase_id"),
        (unix_micros(col("ts")) - unix_micros(col("lp_ts"))).as("gap_us"))
  }

  private val asofJoinSql =
    """WITH m AS (
      |  SELECT user_id, ts AS m_ts, max(event_id) AS last_purchase_id
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id, e.ts, m.m_ts AS last_purchase_ts,
      |  m.last_purchase_id,
      |  epoch_us(e.ts) - epoch_us(m.m_ts) AS gap_us
      |FROM events e ASOF LEFT JOIN m
      |  ON e.user_id = m.user_id AND e.ts >= m.m_ts""".stripMargin

  /** Bounded-interval range join: for each event, how many OTHER events
    * of the same type fall within ±60 s. The equi-join key is a 60 s
    * time bucket with the build side replicated into the 3 candidate
    * buckets; |Δts| ≤ 60 s ⇒ |Δbucket| ≤ 1, so replication is complete
    * and each true pair is produced exactly once.
    */
  def rangeJoinBuckets(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("ts"),
        expr("unix_micros(ts) div 60000000").as("tb"))
    val probe = ev.select(col("event_id").as("a_id"), col("event_type"),
      col("ts").as("a_ts"), col("tb"))
    val build = ev
      .select(col("event_id").as("b_id"), col("event_type"),
        col("ts").as("b_ts"), explode(array(col("tb") - 1, col("tb"), col("tb") + 1)).as("tb"))
    probe.join(build, Seq("event_type", "tb"))
      .where(col("a_id") =!= col("b_id")
        && abs(unix_micros(col("a_ts")) - unix_micros(col("b_ts"))) <= 60000000L)
      .groupBy(col("a_id").as("event_id"))
      .agg(count(lit(1)).as("n_near"))
  }

  private val rangeJoinBucketsSql =
    """SELECT a.event_id, count(*) AS n_near
      |FROM events a JOIN events b
      |  ON a.event_type = b.event_type
      | AND b.ts BETWEEN a.ts - INTERVAL 60 SECOND
      |              AND a.ts + INTERVAL 60 SECOND
      | AND a.event_id != b.event_id
      |GROUP BY 1""".stripMargin

  /** Attribution-style interval join: purchases within 30 minutes AFTER
    * a click by the same user. Equi-join on user_id with the time-range
    * residual — per-user event counts are bounded, so candidates stay
    * linear; the identical logic runs as a watermarked stream-stream
    * join in streaming.StreamOps (spec-verified equal).
    */
  def clickToPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    clicks.join(purchases, Seq("user_id"))
      .where(col("p_ts") >= col("c_ts")
        && unix_micros(col("p_ts")) - unix_micros(col("c_ts")) <= 1800000000L)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("lag_us"))
  }

  private val clickToPurchaseSql =
    """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
      |  epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id
      | AND p.ts >= c.ts
      | AND epoch_us(p.ts) - epoch_us(c.ts) <= 1800000000""".stripMargin

  /** The SAME as-of semantics through the native whole-operator path
    * ([[graft.plans.AsOfJoinExec]]: custom LogicalPlan + optimizer Rule
    * + Strategy + physical merge — SURVEY §2.9 option (c)) instead of
    * the composed union+window form above. One co-partitioned sorted
    * merge, O(|L|+|R|) per partition, no window state. Shares the
    * composed form's DuckDB oracle — both must be hash-identical.
    */
  def asofJoinNative(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftFunctions.asof_join
    val ev = Tables.events(spark, dir)
    val markers = ev.where(col("event_type") === "purchase")
      .groupBy(col("user_id").as("m_user"), col("ts").as("m_ts"))
      .agg(max(col("event_id")).as("last_purchase_id"))
    asof_join(ev.select(col("event_id"), col("user_id"), col("ts")), markers,
        col("user_id"), col("m_user"), col("ts"), col("m_ts"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("m_ts").as("last_purchase_ts"), col("last_purchase_id"),
        (unix_micros(col("ts")) - unix_micros(col("m_ts"))).as("gap_us"))
  }

  /** Daily resample + forward fill: regularize each device's event
    * series onto the full day grid (global min..max), carrying the
    * last observed daily count across gaps — the gap-filling step a
    * mobility pipeline runs before day-over-day metrics (the
    * reference iterates daily partitions and unions them; missing
    * days simply vanish there — this op makes the gaps explicit and
    * fillable).
    *
    * Scale shape: the grid is users × span-days (rows ∝ entities, not
    * events); the day vector comes from a 1-row scalar aggregate
    * broadcast (W5 pattern) and the fill is one window per user key.
    * `last(col, ignoreNulls)` over a running frame ≡ DuckDB
    * `last_value(x IGNORE NULLS)`.
    */
  def resampleFfill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).where(col("user_id") < 50)
    val daily = ev
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val days = Tables.events(spark, dir)
      .agg(to_date(min(col("ts"))).as("lo"), to_date(max(col("ts"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day")))
        .as("day"))
    ev.select(col("user_id")).distinct()
      .crossJoin(broadcast(days))
      .join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"), col("n").as("n_raw"),
        last(col("n"), ignoreNulls = true).over(
          Window.partitionBy(col("user_id")).orderBy(col("day").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("n_ffill"))
  }

  private val resampleFfillSql =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n
      |  FROM events WHERE user_id < 50 GROUP BY 1, 2),
      |b AS (SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi
      |      FROM events),
      |days AS (
      |  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
      |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM b),
      |u AS (SELECT DISTINCT user_id FROM events WHERE user_id < 50)
      |SELECT u.user_id, days.day, daily.n AS n_raw,
      |  last_value(daily.n IGNORE NULLS) OVER (
      |    PARTITION BY u.user_id ORDER BY days.day ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_ffill
      |FROM u CROSS JOIN days
      |LEFT JOIN daily ON u.user_id = daily.user_id AND days.day = daily.day""".stripMargin

  /** Time-travel lookup against SCD2 history: each order resolves the
    * status interval containing its date (valid_from ≤ d < valid_to,
    * NULL-open current interval) — the consumption side of
    * [[Joins.scd2History]], i.e. "what was this customer's state AS OF
    * this event". Also a built-in audit: the resolved status must
    * equal the order's own status (intervals were derived from the
    * same change log), which the oracle verifies row-by-row.
    *
    * Scale shape: equi-join on the customer key with the interval
    * predicate as residual — history relations are change-bounded,
    * so the per-key interval list stays short.
    */
  def asOfLookup(spark: SparkSession, dir: String): DataFrame = {
    val hist = Joins.scd2History(spark, dir)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey").as("ck"),
        col("o_orderdate"), col("o_orderstatus"))
      .join(hist,
        col("ck") === col("o_custkey")
          && col("valid_from") <= col("o_orderdate")
          && (col("valid_to").isNull || col("o_orderdate") < col("valid_to")))
      .select(col("o_orderkey"), col("ck").as("o_custkey"),
        col("status").as("status_at_order"),
        (col("status") === col("o_orderstatus")).as("consistent"))
  }

  private val asOfLookupSql =
    """WITH changes AS (
      |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
      |    lag(o_orderstatus) OVER w AS prev_status
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey
      |    ORDER BY o_orderdate ASC, o_orderkey ASC)),
      |hist AS (
      |  SELECT o_custkey, o_orderstatus AS status,
      |    o_orderdate AS valid_from,
      |    lead(o_orderdate) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate ASC, o_orderkey ASC) AS valid_to
      |  FROM changes
      |  WHERE prev_status IS NULL OR prev_status <> o_orderstatus)
      |SELECT o.o_orderkey, o.o_custkey, h.status AS status_at_order,
      |  h.status = o.o_orderstatus AS consistent
      |FROM orders o JOIN hist h
      |  ON o.o_custkey = h.o_custkey
      |  AND h.valid_from <= o.o_orderdate
      |  AND (h.valid_to IS NULL OR o.o_orderdate < h.valid_to)""".stripMargin

  /** Interval×interval overlap join: each event spans
    * [ts, ts + value seconds); count, per event, the same-type
    * intervals it overlaps and the total overlapped microseconds —
    * the genomics/time-range workhorse neither equi- nor as-of joins
    * express.
    *
    * Scale shape: intervals replicate into the 128 s buckets they
    * touch (≤ 2 — interval width is bounded by 100 s) and candidates
    * meet through a (type, bucket) equi-join, so candidate volume is
    * bucket occupancy², never |intervals|². Each overlapping pair
    * falls into MULTIPLE shared buckets; it is counted exactly once
    * via the owner-bucket rule — only the bucket containing the
    * overlap's start (greatest of the two starts) emits the pair — so
    * no distinct-pair exchange exists at all. The oracle runs the
    * plain inequality join; results must agree exactly.
    */
  def intervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    val W = 128000000L // bucket width (µs); > max interval width (100 s)
    val iv = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("s"),
        // explicit round before the integer cast: Spark's double→long
        // cast truncates while DuckDB's rounds, and value*1e6 lands a
        // hair under its integer (16.74 → 16739999.999…)
        (unix_micros(col("ts"))
          + round(col("value") * 1000000.0, 0).cast("long")).as("e"))
    val a = iv.select(col("event_type"), col("event_id").as("a_id"),
      col("s").as("a_s"), col("e").as("a_e"),
      explode(sequence(floor(col("s") / W), floor(col("e") / W))).as("tb"))
    val b = iv.select(col("event_type"), col("event_id").as("b_id"),
      col("s").as("b_s"), col("e").as("b_e"),
      explode(sequence(floor(col("s") / W), floor(col("e") / W))).as("tb"))
    a.join(b, Seq("event_type", "tb"))
      .where(col("a_id") =!= col("b_id")
        && col("a_s") < col("b_e") && col("b_s") < col("a_e")
        && floor(greatest(col("a_s"), col("b_s")) / W) === col("tb"))
      .groupBy(col("a_id").as("event_id"))
      .agg(count(lit(1)).as("n_overlap"),
        sum(least(col("a_e"), col("b_e"))
          - greatest(col("a_s"), col("b_s"))).as("overlap_us"))
  }

  private val intervalOverlapSql =
    """WITH iv AS (
      |  SELECT event_id, event_type, epoch_us(ts) AS s,
      |    epoch_us(ts) + CAST(round(value * 1000000.0, 0) AS BIGINT) AS e
      |  FROM events)
      |SELECT a.event_id, count(*) AS n_overlap,
      |  CAST(SUM(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT) AS overlap_us
      |FROM iv a JOIN iv b
      |  ON a.event_type = b.event_type AND a.event_id != b.event_id
      | AND a.s < b.e AND b.s < a.e
      |GROUP BY 1""".stripMargin

  /** Time-weighted average of `value` per (user, day) — the TWAP/
    * sensor-mean primitive: each reading holds until the next one, so
    * its weight is the microseconds to the successor (the day's last
    * reading carries no weight and drops, identically in both
    * engines). The (value × Δt) products fold as exact decimal×integer
    * sums; one division at the end, rounded 1e-9.
    *
    * Scale shape: one exchange on user_id; the per-(user, day) window
    * and the aggregation co-partition on it.
    */
  def timeWeightedAvg(spark: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val w = Window.partitionBy(col("user_id"), col("d"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"), col("ts"),
        col("event_id"), col("value"))
      .withColumn("dt", unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
      .where(col("dt").isNotNull)
      .groupBy(col("user_id"), col("d"))
      .agg(count(lit(1)).as("n_holds"),
        sum(col("dt")).as("dur_us"),
        round((sum(col("value").cast(dec) * col("dt")).cast("double")
          / sum(col("dt"))), 9).as("twap"))
  }

  private val timeWeightedAvgSql =
    """WITH h AS (
      |  SELECT user_id, CAST(ts AS DATE) AS d, value,
      |    epoch_us(LEAD(ts, 1) OVER (PARTITION BY user_id, CAST(ts AS DATE)
      |      ORDER BY ts, event_id)) - epoch_us(ts) AS dt
      |  FROM events)
      |SELECT user_id, d, count(*) AS n_holds,
      |  CAST(SUM(dt) AS BIGINT) AS dur_us,
      |  round(CAST(SUM(CAST(value AS DECIMAL(18,2)) * dt) AS DOUBLE)
      |    / CAST(SUM(dt) AS BIGINT), 9) AS twap
      |FROM h WHERE dt IS NOT NULL
      |GROUP BY 1, 2""".stripMargin

  /** Exponentially-weighted moving average of the daily event count
    * with α = 1/2 and a 30-day lookback — the smoothed ingest-volume
    * trend a pipeline dashboard tracks. The α = 1/2 choice is not
    * cosmetic: every weight is a POWER OF TWO, so the weighted sum is
    * computed in EXACT integer arithmetic (count · 2^(29−lag), summed
    * as BIGINT) and the single final division by 2^30 is exact in
    * binary floating point — a bit-identical cross-engine result with
    * no pow(), no rounding step, no term-order hazard. Semantics:
    * ewma_t = Σ_{j=0..29} x_{t−j} · 2^{−(j+1)} (truncated-window EWMA
    * with implicit zero history before the first day).
    *
    * Scale shape: events collapse to ONE map-side-combined daily
    * aggregate (rows ∝ days, not events); the 30-lag expansion and the
    * re-aggregation run on that bounded relation; the min-day origin
    * is a broadcast 1-row scalar (the time_bucket_origin pattern).
    */
  def ewmaSmooth(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val lo = daily.agg(min(col("day")).as("lo"))
    val idx = daily.crossJoin(broadcast(lo))
      .select(col("day"), col("n"), datediff(col("day"), col("lo")).as("d"))
    val lagged = idx.select(col("n").as("xn"), col("d").as("src_d"),
      explode(sequence(lit(0), lit(29))).as("j"))
      .select(col("xn"), col("j"), (col("src_d") + col("j")).as("d"))
    idx.join(lagged, Seq("d"))
      .groupBy(col("day"), col("n"))
      .agg(sum(expr("xn * shiftleft(CAST(1 AS BIGINT), 29 - j)")).as("s"))
      .select(col("day"), col("n"),
        (col("s").cast("double") / lit(1073741824.0)).as("ewma"))
  }

  private val ewmaSmoothSql =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |lo AS (SELECT min(day) AS lo FROM daily),
      |idx AS (
      |  SELECT day, n, (day - lo) AS d FROM daily, lo),
      |lagged AS (
      |  SELECT n AS xn, j, d + j AS d
      |  FROM idx, UNNEST(range(0, 30)) AS t(j))
      |SELECT i.day, i.n,
      |  CAST(CAST(SUM(xn * (CAST(1 AS BIGINT) << CAST(29 - j AS INTEGER)))
      |    AS BIGINT) AS DOUBLE) / 1073741824.0 AS ewma
      |FROM idx i JOIN lagged l ON i.d = l.d
      |GROUP BY 1, 2""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("ewma_smooth", ewmaSmooth, Some(ewmaSmoothSql)),
    Op("resample_ffill", resampleFfill, Some(resampleFfillSql)),
    Op("interval_overlap", intervalOverlap, Some(intervalOverlapSql)),
    Op("time_weighted_avg", timeWeightedAvg, Some(timeWeightedAvgSql)),
    Op("as_of_lookup", asOfLookup, Some(asOfLookupSql)),
    Op("asof_join", asofJoin, Some(asofJoinSql)),
    Op("asof_join_native", asofJoinNative, Some(asofJoinSql)),
    Op("range_join_buckets", rangeJoinBuckets, Some(rangeJoinBucketsSql)),
    Op("click_to_purchase", clickToPurchase, Some(clickToPurchaseSql)),
  )
}
