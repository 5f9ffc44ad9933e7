package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Op, Tables}

/** Night-time-location ("home detection") window pipeline
  * (SURVEY §2.5; /root/reference/src/queries/ntl_queries.py:12-48,
  * /root/reference/src/transforms/NTLTransforms.py:101-139).
  *
  * Test-table mapping: caid=user_id, cell=event_type, night pings =
  * events in the 22:00–06:00 window.
  *
  * Scale notes: all windows partition by caid (very high cardinality —
  * parallelism-safe); the counts→window→score→rank chain keys every
  * shuffle on caid so Catalyst reuses one exchange across the window
  * and both aggregations.
  */
object Ntl {

  /** A1+W4: pings per (caid, cell, day) + whole-partition running
    * total per caid (ntl_queries.py:12-31).
    */
  def pingsPerDay(spark: SparkSession, dir: String): DataFrame = {
    val night = Tables.events(spark, dir)
      .where(hour(col("ts")) >= 22 || hour(col("ts")) < 6)
    val counts = night.groupBy(
        col("user_id").as("caid"),
        col("event_type").as("cell"),
        to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("pings_per_day"))
    counts.withColumn("total_pings",
      sum(col("pings_per_day")).over(Window.partitionBy(col("caid"))))
  }

  private val pingsPerDaySql =
    """SELECT caid, cell, d, pings_per_day,
      |  CAST(SUM(pings_per_day) OVER (PARTITION BY caid) AS BIGINT) AS total_pings
      |FROM (
      |  SELECT user_id AS caid, event_type AS cell, CAST(ts AS DATE) AS d,
      |    count(*) AS pings_per_day
      |  FROM events
      |  WHERE hour(ts) >= 22 OR hour(ts) < 6
      |  GROUP BY 1, 2, 3
      |)""".stripMargin

  /** W1+P10+A4: full NTL winner — threshold on window-derived columns,
    * score per (caid, cell), argmax via ROW_NUMBER, keep rank 1.
    * Thresholds scaled to the test data's density (reference uses
    * total>=10, per-day>=5 at production density —
    * ntl_queries.py:33-48). Tie-break on cell ASC for determinism.
    */
  def ntlWinner(spark: SparkSession, dir: String): DataFrame = {
    val perDay = pingsPerDay(spark, dir)
      .where(col("total_pings") >= 10 && col("pings_per_day") >= 2)
    val scores = perDay.groupBy(col("caid"), col("cell"))
      .agg(sum(col("pings_per_day")).as("score"))
    // argmax via min_by over (-score, cell): same winner as
    // row_number ORDER BY score DESC, cell ASC — hash agg with
    // partials instead of a window sort (see Interactions.homeCells).
    scores.groupBy(col("caid"))
      .agg(min_by(col("cell"), struct((-col("score")).as("negs"), col("cell")))
        .as("home_cell"),
        max(col("score")).as("score"))
  }

  private val ntlWinnerSql =
    s"""WITH per_day AS (
       |  SELECT * FROM ($pingsPerDaySql)
       |  WHERE total_pings >= 10 AND pings_per_day >= 2),
       |scores AS (
       |  SELECT caid, cell, CAST(SUM(pings_per_day) AS BIGINT) AS score
       |  FROM per_day GROUP BY 1, 2)
       |SELECT caid, cell AS home_cell, score FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY caid
       |    ORDER BY score DESC, cell ASC) AS rnk
       |  FROM scores
       |) WHERE rnk = 1""".stripMargin

  /** W2+W3: multi-key ordered ranking with length ordering and
    * NULLS LAST (/root/reference/scripts/IndexingHomeAgebs.py:75-79,
    * /root/reference/src/imputers/home_ageb_imputers.py:73).
    * NULLIF manufactures NULLs deterministically from the data.
    *
    * Scale shape (r7, the equi_depth/gini class): |o_orderstatus| = 3
    * would bound a naive per-status window at 3 tasks over the whole
    * orders relation. The (length, priority) prefix of the ordering is
    * a BOUNDED domain (5 priorities), so the rank is
    * [[RangeRank.withRankGroupedMajor]]: offsets over the
    * 3 × |priorities| × buckets relation, in-bucket windows on the
    * full composite — NULLS LAST encoded as the non-null
    * (is-null, coalesce-to-empty) pair so the offsets join stays
    * null-safe. Same values as the window spelling, orders-relation
    * parallelism |status| × buckets.
    */
  def rankNullsLast(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
      .withColumn("len", length(col("o_orderpriority")))
      .withColumn("pn", nullif(col("o_orderpriority"), lit("1-URGENT")))
      .withColumn("isn", col("pn").isNull)
      .withColumn("pstr", coalesce(col("pn"), lit("")))
    RangeRank.withRankGroupedMajor(o, Seq("o_orderstatus"),
        Seq("len", "isn", "pstr"),
        Seq(col("len").desc, col("isn").asc, col("pstr").asc),
        "o_orderkey", "rnk")
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_orderpriority"), col("rnk"))
  }

  private val rankNullsLastSql =
    """SELECT o_orderkey, o_orderstatus, o_orderpriority,
      |  ROW_NUMBER() OVER (PARTITION BY o_orderstatus
      |    ORDER BY length(o_orderpriority) DESC,
      |             NULLIF(o_orderpriority, '1-URGENT') ASC NULLS LAST,
      |             o_orderkey ASC) AS rnk
      |FROM orders""".stripMargin

  /** O1+O4: deterministic global sort + top-k slice
    * (/root/reference/src/scalers/size_scalers.py:144-154). Catalyst
    * plans orderBy+limit as TakeOrderedAndProject — no global sort.
    */
  def topkGroups(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id").asc)
      .limit(10)

  private val topkGroupsSql =
    """SELECT user_id, count(*) AS n FROM events
      |GROUP BY user_id ORDER BY n DESC, user_id ASC LIMIT 10""".stripMargin

  /** The reference's second home-detection flavor
    * (/root/reference/scripts/HomeAgebGenerator.py:71-189): score =
    * night time-clusters in the cell / total night time-clusters of
    * the device (ratio, not ping count), winner by ratio, confidence
    * class from the ratio, constant type tag — yielding the
    * `caid, home_ageb, score, type, confidence` catalog
    * (FIXTURES A5). Time clusters = distinct 600s buckets.
    */
  def homeCatalog(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.CrossHash
    val night = Tables.events(spark, dir)
      .where(hour(col("ts")) >= 22 || hour(col("ts")) < 6)
      .select(col("user_id").as("caid"), col("event_type").as("cell"),
        CrossHash.timeBucketId(col("ts"), 600L).as("tw"))
    val perCell = night.groupBy(col("caid"), col("cell"))
      .agg(countDistinct(col("tw")).as("cell_clusters"))
    val w = Window.partitionBy(col("caid"))
    val scored = perCell
      .withColumn("total_clusters", sum(col("cell_clusters")).over(w))
      .withColumn("score",
        col("cell_clusters").cast("double") / col("total_clusters"))
    val rank = Window.partitionBy(col("caid"))
      .orderBy(col("score").desc, col("cell").asc)
    scored.withColumn("rnk", row_number().over(rank))
      .where(col("rnk") === 1)
      .select(col("caid"), col("cell").as("home_cell"), col("score"),
        lit("computed").as("type"),
        when(col("score") >= 0.6, lit("high")).otherwise(lit("low"))
          .as("confidence"))
  }

  private val homeCatalogSql =
    s"""WITH night AS (
       |  SELECT user_id AS caid, event_type AS cell,
       |    CAST(floor(epoch_us(ts) / 600000000.0) AS BIGINT) AS tw
       |  FROM events WHERE hour(ts) >= 22 OR hour(ts) < 6),
       |per_cell AS (
       |  SELECT caid, cell, count(DISTINCT tw) AS cell_clusters
       |  FROM night GROUP BY 1, 2),
       |scored AS (
       |  SELECT caid, cell, cell_clusters,
       |    SUM(cell_clusters) OVER (PARTITION BY caid) AS total_clusters,
       |    CAST(cell_clusters AS DOUBLE)
       |      / SUM(cell_clusters) OVER (PARTITION BY caid) AS score
       |  FROM per_cell)
       |SELECT caid, cell AS home_cell, score, 'computed' AS type,
       |  CASE WHEN score >= 0.6 THEN 'high' ELSE 'low' END AS confidence
       |FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY caid
       |    ORDER BY score DESC, cell ASC) AS rnk
       |  FROM scored)
       |WHERE rnk = 1""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("home_catalog", homeCatalog, Some(homeCatalogSql)),
    Op("ntl_pings_per_day", pingsPerDay, Some(pingsPerDaySql)),
    Op("ntl_winner", ntlWinner, Some(ntlWinnerSql), bench = true),
    Op("rank_nulls_last", rankNullsLast, Some(rankNullsLastSql)),
    Op("topk_groups", topkGroups, Some(topkGroupsSql)),
  )
}
