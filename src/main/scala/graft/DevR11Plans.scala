package graft

/** r11 optimization-round deliverable: dump `.explain("formatted")` for
  * named queries to plans/r11/<name>_<suffix>.txt.
  * Usage: sbt "runMain graft.DevR11Plans <suffix> [sfDir] <name> [name ...]"
  * With no names: the whole bench set.
  */
object DevR11Plans {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DevR11Plans <suffix> [sfDir] <names...>")
    val suffix = args(0)
    val (sfDir, names) =
      if (args.length > 1 && args(1).startsWith("/"))
        (args(1), args.drop(2).toSet)
      else ("/root/testdata/sf0.001", args.drop(1).toSet)
    val spark = Sessions.build("graft-r11plans",
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors.toString))
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Paths.get("plans/r11")
    java.nio.file.Files.createDirectories(dir)
    SparkEntry.allOps
      .filter(o => if (names.isEmpty) o.bench else names(o.name))
      .foreach { op =>
        val df = op.run(spark, sfDir)
        // formatted plan, pre-execution (stable across AQE windows);
        // the adaptive executed plan is appended for judge cross-checks
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        df.collect()
        val finalPlan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        java.nio.file.Files.writeString(
          dir.resolve(s"${op.name}_$suffix.txt"),
          s"===== ${op.name} ($suffix, sfDir=$sfDir)\n" + formatted +
            "\n----- final adaptive plan\n" + finalPlan)
        System.err.println(s"[r11plans] wrote ${op.name}_$suffix.txt")
      }
    spark.stop()
  }
}
