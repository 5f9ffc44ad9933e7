package graft

/** Dev-only: print the per-polygon polyfill(res4) and compact cell
  * counts of the FIXED 16-tile catalog — data-independent constants
  * used as regression pins in the h3_polyfill/h3_compact oracles.
  */
object DevH3Pins {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-h3pins", "8")
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val pf = operators.Spatial.h3Polyfill(spark, sf)
      .groupBy(col("poly_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    println("POLYFILL4 " + pf.map { case (p, n) => s"('$p', $n)" }.mkString(", "))
    val cp = operators.Spatial.h3Compact(spark, sf)
      .groupBy(col("poly_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    println("COMPACT " + cp.map { case (p, n) => s"('$p', $n)" }.mkString(", "))
    spark.stop()
  }
}
