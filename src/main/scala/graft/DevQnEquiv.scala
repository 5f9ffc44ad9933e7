package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Dev probe (r10): prove the r10 window respelling of
  * quantile_normalize computes EXACTLY the r21 rollup+join spelling at
  * a given SF — order-free multiset signature (sum + xor of
  * xxhash64(struct(cols))) plus row counts, both engine-side. The 10×
  * parity for the new spelling then follows from the r20 sweep's
  * 10× DuckDB hash on the old spelling (the oracle SQL is unchanged).
  *
  * Usage: runMain graft.DevQnEquiv [sfDir]
  */
object DevQnEquiv {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/dev/shm/graft_full10x")
    val spark = Sessions.build("graft-qn-equiv",
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors.toString))
    spark.sparkContext.setLogLevel("WARN")

    def long0 = Tables.lineitem(spark, sfDir)
      .where(col("l_quantity").isNotNull && col("l_extendedprice").isNotNull
        && col("l_discount").isNotNull)
      .select((col("l_orderkey") * 10 + col("l_linenumber")).as("rid"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .selectExpr("rid",
        "stack(3, 'qty', l_quantity, 'price', l_extendedprice, " +
          "'disc', l_discount) AS (feature, value)")
    def ranked = operators.RangeRank.withRankAscGrouped(
      long0, Seq("feature"), "value", Seq(col("rid").asc), "rn")

    // the r21 spelling: rank-keyed rollup + shuffle-hash join-back
    val old = {
      val r = ranked
      val ref = r.groupBy(col("rn"))
        .agg((sum(col("value").cast(DecimalType(18, 2))).cast("double") / 3)
          .as("normalized"))
        .hint("shuffle_hash")
      r.join(ref, Seq("rn"))
        .select(col("feature"), col("rid"), col("value"),
          col("rn").cast("long").as("rn"), col("normalized"))
    }
    // the registered r10 spelling
    val neu = operators.Stats.quantileNormalize(spark, sfDir)

    def sig(df: org.apache.spark.sql.DataFrame): (Long, String, Long) = {
      val h = df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
      val r = h.agg(count(lit(1)),
        sum(col("h").cast(DecimalType(38, 0))),
        sum(pmod(col("h"), lit(1000003L)))).collect()(0)
      (r.getLong(0), r.getDecimal(1).toPlainString, r.getLong(2))
    }
    val so = sig(old)
    val sn = sig(neu)
    println(s"[qn-equiv] old=$so new=$sn match=${so == sn}")
    spark.stop()
    if (so != sn) sys.exit(1)
  }
}
