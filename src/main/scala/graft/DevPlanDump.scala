package graft

/** Dev-only: print the FINAL adaptive (executed) plan of a registered
  * query. `sbt "runMain graft.DevPlanDump [sfDir] <name>"` — a single
  * argument is the query name (sfDir defaults to sf0.001).
  */
object DevPlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, name) = args match {
      case Array(n) => ("/root/testdata/sf0.001", n)
      case Array(d, n) => (d, n)
      case _ => sys.error("usage: DevPlanDump [sfDir] <queryName>")
    }
    val spark = Sessions.build("graft-plandump", "4")
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    System.err.println(df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0))
    spark.stop()
  }
}
