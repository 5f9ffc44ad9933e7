package graft

import org.apache.spark.sql.functions._

/** Dev tool: in-session alternating A/B of the PCY sketch pass on
  * `item_item_cosine` (VERDICT r7 #2). Between-JVM timing noise on
  * this box is ±30% — far larger than the effect under test — so both
  * variants run interleaved in ONE session and the report is
  * min-per-variant.
  *
  * Usage: runMain graft.DevAbPcy [sfDir] [reps] [scaleCatalog]
  *   reps > 1 replicates orders+lineitem reps× into /dev/shm with
  *   key-offset customers/orders. By default the part catalog is
  *   SHARED across replicas (more orders over one catalog — pair
  *   counts inflate reps×, so the threshold prunes LESS: the
  *   PCY-hostile scale-up). scaleCatalog=true offsets partkeys per
  *   replica too (the TPC-H-sf semantics: catalog grows with volume,
  *   per-pair counts and therefore prune selectivity stay at input
  *   levels: the PCY-friendly scale-up). Real corpora land between.
  */
object DevAbPcy {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 1
    val scaleCatalog = args.length > 2 && args(2).toBoolean
    val runs = sys.env.getOrElse("GRAFT_RUNS", "5").toInt
    val spark = Sessions.build("graft-ab-pcy",
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors.toString))
    spark.sparkContext.setLogLevel("WARN")

    val dir = if (reps <= 1) sfDir
              else replicate(spark, sfDir, reps, scaleCatalog)

    val variants = Seq(
      "pcy" -> (() => operators.Recommend
        .itemItemCosine(spark, dir, usePcy = true)),
      "direct" -> (() => operators.Recommend
        .itemItemCosine(spark, dir, usePcy = false)))
    // warm both (codegen/classload/IO cache), then alternate
    variants.foreach { case (_, mk) => mk().count() }
    val times = collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to runs; (label, mk) <- variants) {
      val t0 = System.nanoTime()
      val n = mk().count()
      val dt = (System.nanoTime() - t0) / 1e9
      times(label) = dt :: times.getOrElse(label, Nil)
      println(f"$label%-7s $n rows in $dt%.2f s")
    }
    times.toSeq.sortBy(_._1).foreach { case (l, ts) =>
      println(f"RESULT $l%-7s min=${ts.min}%.2f s median=${
        ts.sorted.apply(ts.size / 2)}%.2f s")
    }
    spark.stop()
  }

  /** Write reps× key-offset copies of orders+lineitem (narrow: only
    * the columns the CF/basket family reads) under /dev/shm; reuse if
    * already present.
    */
  def replicate(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, reps: Int, scaleCatalog: Boolean = false): String = {
    val out = s"/dev/shm/graft_rep${reps}x" + (if (scaleCatalog) "c" else "")
    val done = new java.io.File(s"$out/_done")
    if (!done.exists()) {
      val big = 1000000000L
      val o = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_partkey"))
      (0 until reps).map(r => o.select(
          (col("o_orderkey") + lit(r * big)).as("o_orderkey"),
          (col("o_custkey") + lit(r * big)).as("o_custkey")))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/orders.parquet")
      (0 until reps).map(r => l.select(
          (col("l_orderkey") + lit(r * big)).as("l_orderkey"),
          (if (scaleCatalog) (col("l_partkey") + lit(r * big)).as("l_partkey")
           else col("l_partkey"))))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      done.createNewFile()
    }
    out
  }
}
