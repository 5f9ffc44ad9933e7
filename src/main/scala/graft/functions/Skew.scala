package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY §4.3: the (h3index_15,
  * time-bucket) key family is bounded-skew by construction, but
  * coarser keys — municipality, AGEB — are not; dense-city keys can
  * carry orders of magnitude more rows than the median).
  *
  * Salting splits each hot LEFT key into `factor` sub-keys and
  * replicates the RIGHT side once per salt, turning one straggler
  * partition into `factor` parallel ones. AQE's skew-join handles
  * sort-merge cases adaptively; explicit salting remains the tool for
  * deterministic layouts, broadcast-ineligible dimension joins, and
  * aggregations.
  */
object Skew {

  /** Equi-join `left ⋈ right` on `key`, salting the left (large,
    * skewed) side. `factor` = number of sub-partitions per key.
    *
    * Only inner/left-flavored joins are legal: the right side is
    * replicated once per salt, so a right/full outer join would emit
    * every unmatched right row `factor` times — silently wrong.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      factor: Int, joinType: String = "inner"): DataFrame = {
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti", "cross")
    require(allowed(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin: joinType '$joinType' would duplicate unmatched right " +
        s"rows $factor times (right side is salt-replicated); use an " +
        "inner/left-flavored join or salt the other side")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(factor)).cast("int"))
    val replicated = right
      .withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase (partial → final) skew-safe aggregation: count rows per
    * key with a salted pre-aggregation, so one hot key spreads over
    * `factor` reducers before the final combine.
    */
  def saltedCount(df: DataFrame, key: String, factor: Int): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(factor)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}
