package graft

/** Dev tool: print formatted plans + repeat timings for bench ops. */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val explain = sys.env.get("GRAFT_EXPLAIN").contains("1")
    val names = args.drop(1).toSet
    val spark = Sessions.build("graft-explain", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.allOps
      .filter(o => names.isEmpty || names(o.name))
      .filter(_.bench)
      .foreach { op =>
        println(s"===== ${op.name}")
        val df = op.run(spark, sfDir)
        if (explain) df.explain("formatted")
        (1 to 3).foreach { i =>
          val t0 = System.nanoTime()
          val n = df.count()
          println(f"run$i: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      }
    spark.stop()
  }
}
