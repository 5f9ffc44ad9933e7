package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Op, Tables}

/** Structured Streaming surface (SURVEY §2.10).
  *
  * The reference is purely batch — its "windows" are TIME_BUCKET
  * columns (/root/reference/src/queries/interaction_queries.py:15-19) —
  * so streaming here is the capability re-interpretation: the same
  * tumbling-window aggregation Column logic runs identically under
  * batch and under readStream+watermark (asserted in StreamingSpec).
  */
object StreamOps {

  /** File-source stream over an events parquet directory with the same
    * nanos-ts normalization as `Tables.events` — the one place the
    * schema probe + LongType fixup lives (one `spark.read` schema
    * listing per stream build, shared by every streaming op).
    */
  private def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val s = spark.readStream.schema(schema).parquet(dir)
    if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
      s.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else s
  }

  /** Shared transformation: 10-minute tumbling window counts + exact
    * per-window value sums per event_type. Works on a batch OR
    * streaming events DataFrame unchanged.
    */
  def windowedCounts(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    events
      .groupBy(window(col("ts"), "600 seconds").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"),
        col("sum_value"))
  }

  /** Batch form as an oracle-checked query (window() ≡ epoch floor-div
    * bucketing).
    */
  def tumblingWindow(spark: SparkSession, dir: String): DataFrame =
    windowedCounts(Tables.events(spark, dir))

  private val tumblingWindowSql =
    """SELECT make_timestamp((epoch_us(ts) // 600000000) * 600000000) AS w_start,
      |  event_type, count(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Streaming form: file-source monitoring of an events parquet
    * DIRECTORY (the file source tails directories, not single files),
    * 10-min watermark, same transformation (used by StreamingSpec with
    * a memory sink).
    */
  def streamingWindowedCounts(spark: SparkSession, eventsDir: String): DataFrame =
    windowedCounts(eventsStream(spark, eventsDir).withWatermark("ts", "10 minutes"))

  /** Sliding windows (10-minute window, 5-minute slide): each event
    * lands in exactly two windows — stretch beyond the reference's
    * tumbling TIME_BUCKETs (§2.10 note). Oracle: union of the two
    * bucket alignments.
    */
  def slidingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "600 seconds", "300 seconds").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))

  // each ts belongs to exactly the two 600s windows starting at
  // floor(t/300)*300 and that minus 300 (slide 300 < window 600)
  private val slidingWindowSql =
    """SELECT make_timestamp(w_start_us) AS w_start, event_type, count(*) AS n
      |FROM (
      |  SELECT unnest([
      |      (epoch_us(ts) // 300000000) * 300000000,
      |      (epoch_us(ts) // 300000000) * 300000000 - 300000000
      |    ]) AS w_start_us,
      |    event_type
      |  FROM events)
      |GROUP BY 1, 2""".stripMargin

  /** Sessionization: per-user sessions split on >30-minute gaps.
    * Batch form: lag + cumulative-sum-of-boundaries window (single
    * shuffle on user_id); the streaming form keeps the same semantics
    * with flatMapGroupsWithState (StatefulSessionizer).
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull
          || unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
  }

  private val sessionizeSql =
    """SELECT user_id, session_idx, count(*) AS n_events,
      |  min(ts) AS session_start, max(ts) AS session_end
      |FROM (
      |  SELECT user_id, ts,
      |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
      |  FROM (
      |    SELECT user_id, ts,
      |      CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |             OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
      |                > 1800000000 THEN 1 ELSE 0 END AS new_session
      |    FROM events))
      |GROUP BY 1, 2""".stripMargin

  /** Streaming ingestion dedup — the training-corpus entry stage: drop
    * every document whose content hash was already seen. Key-only
    * `dropDuplicates` keeps state per distinct hash; at 100 TB you
    * bound it with `dropDuplicatesWithinWatermark` over the ingest
    * timestamp (same plan shape, state expires with the watermark).
    * Spec: streamed output set == batch distinct set.
    */
  def streamingDedup(spark: SparkSession, docsDir: String): DataFrame = {
    val stream = spark.readStream
      .schema(spark.read.parquet(docsDir).schema)
      .parquet(docsDir)
    stream
      .select(md5(col("text")).as("content_hash"))
      .dropDuplicates("content_hash")
  }

  /** The same 30-minute-gap sessions through Spark's native
    * `session_window` aggregate: windows merge while events arrive
    * within the gap, so `window.start = min(ts)` and `window.end =
    * max(ts) + gap` per session. One exchange (user_id ⊕ session
    * merge), and — unlike the lag/cumsum spelling in [[sessionize]] —
    * this form runs UNCHANGED under readStream with a watermark,
    * where merging session state is exactly what the streaming
    * aggregation operator maintains.
    */
  def sessionWindowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  // session end is max(ts) + gap under session_window semantics; the
  // split comparison is STRICT (> gap): Spark merges an event exactly
  // gap-after the previous one into the same session (empirically: a
  // 30:00.000000 pair is ONE session), same as sessionize's lag rule
  private val sessionWindowAggSql =
    """SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  count(*) AS n_events
      |FROM (
      |  SELECT user_id, ts,
      |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s
      |  FROM (
      |    SELECT user_id, ts,
      |      CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |             OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
      |                > 1800000000 THEN 1 ELSE 0 END AS new_session
      |    FROM events))
      |GROUP BY user_id, s""".stripMargin

  /** Watermark-bounded streaming dedup — the 100 TB-safe form of
    * [[streamingDedup]]: duplicate re-deliveries of an event are
    * dropped as long as they arrive within the watermark delay of the
    * first copy, and the per-key state EXPIRES once the watermark
    * passes it. Unbounded-key dedup state grows with the corpus; this
    * grows with (event rate × watermark) only — the deliberate
    * trade: a duplicate later than the delay is no longer caught.
    */
  def streamingDedupBounded(spark: SparkSession, eventsDir: String): DataFrame =
    eventsStream(spark, eventsDir)
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("user_id"), col("ts"))

  /** Stream-stream interval join (watermarked both sides): purchases
    * within 30 minutes after a click by the same user — identical
    * semantics to Temporal.clickToPurchase (spec-verified). The
    * time-range condition + watermarks bound the join state; inner
    * joins emit on match, no watermark wait.
    */
  def streamingClickToPurchase(spark: SparkSession, eventsDir: String): DataFrame = {
    def src(): DataFrame = eventsStream(spark, eventsDir)
    val clicks = src().where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = src().where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    clicks.join(purchases,
        col("user_id") === col("p_user")
          && col("p_ts") >= col("c_ts")
          && col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("lag_us"))
  }

  /** Stream-stream LEFT OUTER interval join: like
    * [[streamingClickToPurchase]] but clicks with no purchase within
    * the window ALSO emit (purchase columns null) — which is only
    * decidable once the purchase-side watermark has passed the click's
    * join window, so null rows surface with watermark delay and the
    * per-key state is evicted right after. The abandoned-cart query,
    * impossible without watermark-bounded outer-join state.
    */
  def streamingClickToPurchaseOuter(spark: SparkSession, eventsDir: String): DataFrame = {
    def src(): DataFrame = eventsStream(spark, eventsDir)
    val clicks = src().where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = src().where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    clicks.join(purchases,
        col("user_id") === col("p_user")
          && col("p_ts") >= col("c_ts")
          && col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"),
        "leftOuter")
      .select(col("user_id"), col("click_id"), col("purchase_id"))
  }

  /** Shared transformation for stream-static enrichment: events joined
    * to a per-user dimension (customer-keyed segment lookup — the
    * streaming analog of `region_enrich`), rolled up per segment.
    * Stream-static joins are STATELESS in Structured Streaming (the
    * static side re-resolves per micro-batch; broadcast keeps it off
    * the stream's shuffle path), so the same Column logic runs under
    * batch and readStream unchanged.
    */
  def segmentCounts(events: DataFrame, dim: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    events
      .join(broadcast(dim), Seq("user_id"), "left")
      .groupBy(coalesce(col("segment"), lit("UNKNOWN")).as("segment"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
  }

  /** Per-user segment dimension derived from customer (user ids and
    * custkeys share the id space in the test data).
    */
  def userSegments(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))

  /** Batch form as an oracle-checked query. */
  def segmentEnrich(spark: SparkSession, dir: String): DataFrame =
    segmentCounts(Tables.events(spark, dir), userSegments(spark, dir))

  private val segmentEnrichSql =
    """SELECT coalesce(c_mktsegment, 'UNKNOWN') AS segment, count(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events LEFT JOIN customer ON user_id = c_custkey
      |GROUP BY 1""".stripMargin

  /** Streaming form: the same enrichment over the file-source stream
    * (StreamingSpec compares it to the batch form under a complete-
    * mode memory sink).
    */
  def streamingSegmentEnrich(spark: SparkSession, eventsDir: String,
      staticDir: String): DataFrame =
    segmentCounts(eventsStream(spark, eventsDir), userSegments(spark, staticDir))

  val ops: Seq[Op] = Seq(
    Op("tumbling_window", tumblingWindow, Some(tumblingWindowSql)),
    Op("sliding_window", slidingWindow, Some(slidingWindowSql)),
    Op("sessionize", sessionize, Some(sessionizeSql)),
    Op("session_window_agg", sessionWindowAgg, Some(sessionWindowAggSql)),
    Op("segment_enrich", segmentEnrich, Some(segmentEnrichSql)),
  )
}
