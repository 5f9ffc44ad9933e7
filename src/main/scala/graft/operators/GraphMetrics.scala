package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Op

/** Graph metrics over the empiric co-location network
  * (/root/reference/scripts/MakeEmpiricNetworks.py builds these
  * networks; networkx then reports structure — re-expressed here as
  * relational queries over the canonical edge list).
  *
  * Scale notes: degrees are one exchange; triangle counting is the
  * textbook node-iterator (wedge join + closing-edge semi-join) on the
  * canonical a<b orientation. On skewed degree distributions the
  * standard hardening is degree-ordered orientation (lower-degree
  * endpoint first) so wedge counts are Σ d(v)·min(d(v), …) — the
  * co-location graph is degree-bounded by cell capacity, so id
  * orientation suffices here.
  */
object GraphMetrics {

  private def edges(spark: SparkSession, dir: String): DataFrame =
    Interactions.empiricEdges(spark, dir) // canonical src < dst, distinct

  /** Degree per node (undirected). */
  def graphDegrees(spark: SparkSession, dir: String): DataFrame = {
    val e = edges(spark, dir)
    e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("degree"))
  }

  // the interactions pair SQL, restated as CTEs (same text the
  // empiric_edges oracle uses)
  private val pairsSql =
    """SELECT DISTINCT a.caid AS a_caid, b.caid AS b_caid
      |FROM p a JOIN p b
      |  ON a.cell = b.cell AND a.tw = b.tw AND a.caid != b.caid""".stripMargin

  private val presenceSql =
    """SELECT DISTINCT user_id AS caid, event_type AS cell,
      |  (epoch_us(ts) - epoch_us(origin_ts)) // 600000000 AS tw
      |FROM events CROSS JOIN (SELECT MIN(ts) AS origin_ts FROM events)""".stripMargin

  private val graphDegreesSql =
    s"""WITH p AS ($presenceSql),
       |pairs AS ($pairsSql),
       |edges AS (
       |  SELECT DISTINCT least(a_caid, b_caid) AS src,
       |    greatest(a_caid, b_caid) AS dst
       |  FROM pairs)
       |SELECT node, count(*) AS degree FROM (
       |  SELECT src AS node FROM edges
       |  UNION ALL
       |  SELECT dst AS node FROM edges)
       |GROUP BY 1""".stripMargin

  /** Global triangle count: wedges (a<b<c from edges (a,b),(b,c))
    * closed by edge (a,c).
    */
  def graphTriangles(spark: SparkSession, dir: String): DataFrame = {
    val e = edges(spark, dir)
    // the three edge references are the identical subtree — the wedge
    // self-join reuses one exchange (SelfJoinShuffleRule keeps it a
    // shuffle join), and a left-semi closes the wedge without
    // duplicating triangles
    val wedges = e.alias("e1")
      .join(e.alias("e2"), col("e1.dst") === col("e2.src"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
    wedges.join(e.alias("e3"),
        col("a") === col("e3.src") && col("c") === col("e3.dst"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
  }

  private val graphTrianglesSql =
    s"""WITH p AS ($presenceSql),
       |pairs AS ($pairsSql),
       |edges AS (
       |  SELECT DISTINCT least(a_caid, b_caid) AS src,
       |    greatest(a_caid, b_caid) AS dst
       |  FROM pairs)
       |SELECT count(*) AS n_triangles
       |FROM edges e1
       |JOIN edges e2 ON e1.dst = e2.src
       |JOIN edges e3 ON e1.src = e3.src AND e2.dst = e3.dst""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("graph_degrees", graphDegrees, Some(graphDegreesSql)),
    Op("graph_triangles", graphTriangles, Some(graphTrianglesSql)),
  )
}
