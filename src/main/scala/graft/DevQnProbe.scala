package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Dev probe (r10): isolate the low-core AQE pathology in
  * quantile_normalize — times (a) the ranked subtree alone, (b) the
  * ranked subtree + rn exchange + window sum, each under the noop
  * sink, at whatever SPARK_GRAFT_CPUS says.
  *
  * Usage: runMain graft.DevQnProbe [sfDir] [runs]
  */
object DevQnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = Sessions.build("graft-qn-probe", cpus)
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
    def full = ranked
      .withColumn("normalized",
        sum(col("value").cast(DecimalType(18, 2)))
          .over(Window.partitionBy(col("rn"))).cast("double") / 3)
    def fullSorted = ranked
      .withColumn("normalized",
        sum(col("value").cast(DecimalType(18, 2)))
          .over(Window.partitionBy(col("rn")).orderBy(col("feature"))
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          .cast("double") / 3)

    def t(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qnprobe] $label%-14s min=${ts.min}%.3f " +
        f"raw=[${ts.map(x => f"$x%.3f").mkString(", ")}]")
    }
    t("ranked")(ranked)
    t("full")(full)
    t("fullSorted")(fullSorted)
    spark.stop()
  }
}
