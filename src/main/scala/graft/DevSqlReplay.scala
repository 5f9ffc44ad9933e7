package graft

/** Dev tool (r19): the ORACLE-ENGINE-RESOURCE-BOUND fallback gate from
  * the r18 sweep (COVERAGE.md, impute_fixpoint), generalized. For
  * queries whose DuckDB mirror exhausts this box at 10× (the wedge-
  * family graph queries: DuckDB materializes the Σd² join), replay the
  * SAME oracle SQL through Spark's OWN SQL frontend over the
  * replicated files and compare against the DataFrame spelling with a
  * distributed exceptAll in both directions — an independent
  * FORMULATION check (SQL semantics vs DF plan) that never collects
  * the result to the driver.
  *
  * Usage: runMain graft.DevSqlReplay [sfDir] [reps] names...
  */
object DevSqlReplay {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 10
    val names = args.drop(2).toSeq
    require(names.nonEmpty, "pass query names")
    val spark = Sessions.build("graft-sql-replay",
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors.toString))
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (reps <= 1) sfDir
              else DevScaleProbe.ensureReplicated(spark, sfDir, reps)
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      Tables.load(spark, dir, t).createOrReplaceTempView(t)
    var bad = 0
    for (name <- names) {
      val op = SparkEntry.allOps.find(_.name == name).get
      val t0 = System.nanoTime()
      val df = op.run(spark, dir)
      val sq = spark.sql(op.oracle.get).toDF(df.columns: _*)
      val nDf = df.count(); val nSq = sq.count()
      val extra = df.exceptAll(sq).count()
      val missing = sq.exceptAll(df).count()
      val ok = nDf == nSq && extra == 0 && missing == 0
      if (!ok) bad += 1
      println(f"[replay] $name%-24s ${if (ok) "PASS" else "FAIL"} " +
        f"rows=$nDf/$nSq extra=$extra missing=$missing " +
        f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
