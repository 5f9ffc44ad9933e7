package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: micro-timings to isolate environment vs plan slowness. */
object DevProbe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
  }
  def main(args: Array[String]): Unit = {
    val aqe = args.headOption.getOrElse("true")
    val spark = SparkSession.builder()
      .appName("probe").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[probe] aqe=$aqe")
    (1 to 6).foreach { i =>
      time(s"rdd.sum $i")(spark.sparkContext.parallelize(1 to 1000000, 4).map(_.toLong).sum())
    }
    (1 to 6).foreach { i =>
      time(s"range.sum $i")(spark.range(1000000).selectExpr("sum(id)").collect())
    }
    (1 to 6).foreach { i =>
      time(s"range.groupBy $i")(
        spark.range(1000000).selectExpr("id % 100 as k", "id as v")
          .groupBy("k").sum("v").collect())
    }
    spark.stop()
  }
}
