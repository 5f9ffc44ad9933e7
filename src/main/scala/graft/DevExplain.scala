package graft

/** Dev tool: print formatted plans + repeat timings for bench ops.
  * GRAFT_EXPLAIN=1 adds the pre-execution plan AND the final adaptive
  * plan (post-AQE — shows ReusedExchange/BHJ conversions the static
  * plan hides). GRAFT_RUNS=N overrides the repeat count.
  */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val explain = sys.env.get("GRAFT_EXPLAIN").contains("1")
    val runs = sys.env.getOrElse("GRAFT_RUNS", "3").toInt
    val names = args.drop(1).toSet
    val spark = Sessions.build("graft-explain",
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors.toString))
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.allOps
      .filter(o => if (names.isEmpty) o.bench else names(o.name))
      .foreach { op =>
        println(s"===== ${op.name}")
        val df = op.run(spark, sfDir)
        // GRAFT_COLLECT=1 executes the dataset's own plan (collect), so the
        // adaptive plan printed below is the final one with reused stages;
        // count() would execute a derived plan and leave it non-final.
        val collect = sys.env.get("GRAFT_COLLECT").contains("1")
        // GRAFT_REBUILD=1 re-runs op.run() INSIDE the timing loop —
        // what Bench measures. Matters for the adaptive graph kernels,
        // whose chooser/id-collect/bitset-agg passes run EAGERLY at
        // construction: timing only the returned plan (default) hides
        // that cost entirely (0.2 s vs the bench's 2-3 s for
        // graph_triangles).
        val rebuild = sys.env.get("GRAFT_REBUILD").contains("1")
        (1 to runs).foreach { i =>
          val t0 = System.nanoTime()
          val d = if (rebuild) op.run(spark, sfDir) else df
          val n = if (collect) d.collect().length.toLong else d.count()
          println(f"run$i: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
        if (explain) {
          df.explain("formatted")
          println("----- final adaptive plan")
          println(df.queryExecution.executedPlan.toString)
        }
      }
    spark.stop()
  }
}
