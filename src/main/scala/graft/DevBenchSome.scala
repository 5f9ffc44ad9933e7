package graft

/** Dev probe (r10): min-of-N timing for a NAMED subset of the bench
  * queries — same warm-pass + min-of-runs methodology as [[Bench]],
  * without paying the full 39-query sweep per optimization iteration.
  *
  * Usage: runMain graft.DevBenchSome [sfDir] [runs] name [name ...]
  */
object DevBenchSome {
  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.nonEmpty && args(0).startsWith("/")) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rest = if (args.nonEmpty && args(0).startsWith("/")) args.tail else args
    val (runs, names) =
      if (rest.nonEmpty && rest(0).forall(_.isDigit)) (rest(0).toInt, rest.tail)
      else (5, rest)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = Sessions.build("graft-bench-some", cpus)
    spark.sparkContext.setLogLevel("WARN")
    val ops = names.map(n => SparkEntry.allOps.find(_.name == n)
      .getOrElse(sys.error(s"unknown op: $n")))
    // Same timed action as Bench: noop sink by default (computes EVERY
    // column — guide §1.4); GRAFT_BENCH_ACTION=count opts into the
    // legacy prune-prone action for cross-methodology bridges.
    val useNoop = !sys.env.get("GRAFT_BENCH_ACTION").contains("count")
    def action(op: Op): Unit =
      if (useNoop)
        op.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      else { op.run(spark, sfDir).count(); () }
    ops.foreach(action) // warm
    val out = ops.map { op =>
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        action(op)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[bench-some] ${op.name}%-28s min=${ts.min}%.3f " +
        f"raw=[${ts.map(t => f"$t%.3f").mkString(", ")}]")
      op.name -> ts.min
    }
    println(out.map { case (n, t) => f"$n=$t%.3f" }.mkString("RESULT ", " ", ""))
    spark.stop()
  }
}
