package graft

/** Dev-only: print the FINAL adaptive (executed) plan of a registered
  * query. `sbt "runMain graft.DevPlanDump <sfDir> <name>"`.
  */
object DevPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val name = args(1)
    val spark = Sessions.build("graft-plandump", "4")
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    System.err.println(df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0))
    spark.stop()
  }
}
