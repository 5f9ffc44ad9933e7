package graft

import org.apache.spark.sql.functions._

/** Dev probe (r11, VERDICT r10 #4): A/B the dedup_joinback spellings.
  *
  *   A  registered shape — 2-col distinct exchange, join-back left to
  *      the planner (AQE broadcasts the ~570k-row key relation at
  *      bench SF; SMJ past the threshold)
  *   B  co-partitioned single flow — repartition the 4-col fact on the
  *      key, distinct in place, SHJ in place (no broadcast anywhere)
  *   C  pinned SHJ on the registered shape (B without the fact
  *      repartition: the 2-col distinct exchange + fact exchanged once
  *      by the join itself)
  *
  * A Bloom/semi-join prune (the verdict's other named candidate) is
  * structurally inapplicable: the join is LEFT and the key relation is
  * derived from the fact itself, so every fact row matches — there is
  * nothing to prune. Timed action = noop sink, min-of-N.
  *
  * Usage: runMain graft.DevJbAb [sfDir] [runs]
  */
object DevJbAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = if (args.length > 1) args(1).toInt else 5
    val spark = Sessions.build("graft-jb-ab",
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors.toString))
    spark.sparkContext.setLogLevel("WARN")

    def variantA() = operators.Joins.dedupJoinback(spark, dir)

    def variantB() = {
      val li = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"))
        .repartition(col("l_partkey"), col("l_suppkey"))
      val enriched = li.select(col("l_partkey"), col("l_suppkey")).distinct()
        .withColumn("dist",
          sqrt(col("l_partkey").cast("double") * col("l_suppkey").cast("double")))
      li.join(enriched.hint("shuffle_hash"),
          Seq("l_partkey", "l_suppkey"), "left")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("dist"))
    }

    def variantC() = {
      val li = Tables.lineitem(spark, dir)
      val enriched = li.select(col("l_partkey"), col("l_suppkey")).distinct()
        .withColumn("dist",
          sqrt(col("l_partkey").cast("double") * col("l_suppkey").cast("double")))
      li.join(enriched.hint("shuffle_hash"),
          Seq("l_partkey", "l_suppkey"), "left")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("dist"))
    }

    val variants = Seq(
      "A_registered" -> (() => variantA()),
      "B_copartition" -> (() => variantB()),
      "C_shj_pin" -> (() => variantC()))

    // cross-variant checksum so an A/B winner can't silently change rows
    variants.foreach { case (n, f) =>
      val chk = f().agg(count(lit(1)), sum(xxhash64(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("dist").cast("string"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head()
      println(s"[jb-ab] $n checksum=${chk.mkString(",")}")
    }
    variants.foreach { case (_, f) =>
      f().write.format("noop").mode("overwrite").save() } // warm
    val best = collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to runs; (label, f) <- variants) {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      best(label) = math.min(dt, best.getOrElse(label, Double.MaxValue))
      println(f"[jb-ab] $label%-16s $dt%.3f s")
    }
    variants.foreach { case (l, _) => println(f"BEST $l%-16s ${best(l)}%.3f s") }
    spark.stop()
  }
}
