package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Op

/** Duplicate-cluster resolution: candidate PAIRS (from MinHash-LSH)
  * → connected components → one cluster id per document. This is the
  * step that turns near-dup detection into an actionable keep/drop
  * list for a training corpus — pairs alone over-count (A~B, B~C must
  * collapse to one cluster {A,B,C}).
  *
  * Algorithm: iterative min-label propagation (each round every vertex
  * takes the min label among itself and its neighbors; fixpoint =
  * min doc_id of the component). Rounds ≤ graph diameter; near-dup
  * components are clique-like, so 2-3 rounds in practice. Each round
  * is one join + one grouped min — all shuffles on doc_id, no
  * driver-side graph. (The large-star/small-star optimization that
  * bounds rounds to O(log n) on pathological chains slots in here
  * unchanged if a corpus ever needs it.)
  */
object Clustering {

  /** (doc_id, cluster_id) for every doc in ≥1 LSH candidate pair;
    * cluster_id = min doc_id reachable through the pair graph.
    */
  def dedupClusters(spark: SparkSession, dir: String, maxRounds: Int = 10): DataFrame = {
    val pairs = Dedup.dedupMinhashLsh(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    // symmetric edge list; cached for the duration of the loop
    val edges = pairs
      .unionByName(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .cache()
    var labels = edges.select(col("src").as("doc_id"))
      .distinct()
      .withColumn("label", col("doc_id"))
      .cache()
    labels.count()
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("doc_id", "dst")
          .withColumnRenamed("label", "nb_label"), Seq("dst"))
        .select(col("src").as("doc_id"), col("nb_label").as("label"))
      val next = labels.unionByName(viaNeighbors)
        .groupBy(col("doc_id"))
        .agg(min(col("label")).as("label"))
        .cache()
      next.count()
      val changed = next.join(labels.withColumnRenamed("label", "old_label"),
        Seq("doc_id"))
        .where(col("label") =!= col("old_label"))
        .limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      round += 1
    }
    edges.unpersist()
    labels.select(col("doc_id"), col("label").as("cluster_id"))
  }

  // DuckDB oracle: full transitive closure by recursive CTE over the
  // symmetric edge list, component id = min reachable doc (quadratic
  // in component size — fine for an oracle, not a scale path).
  private val dedupClustersSql =
    s"""WITH RECURSIVE lsh AS (${Dedup.dedupMinhashLshSql}),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM lsh
       |  UNION
       |  SELECT doc_b, doc_a FROM lsh),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
       |SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
       |FROM reach GROUP BY src""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("dedup_clusters", (s, d) => dedupClusters(s, d), Some(dedupClustersSql)),
  )
}
