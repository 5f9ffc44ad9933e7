package graft

import org.apache.spark.sql.functions._

/** Dev-only: sub-plan timing breakdown of the CF pair pipeline. */
object DevPairProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("graft-pairprobe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors.toString))
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); val n = f
        println(f"[p] $label%-22s run$i: $n%9d rows ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    // mirrors Recommend.itemItemCosine's SHIPPED aggregation
    // (min_k_distinct, not collect_set) so the stage timings attribute
    // cost to the code that actually runs
    def sets = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("u"), col("l_partkey").as("i"))
      .groupBy(col("u"))
      .agg(call_function("min_k_distinct", col("i"), lit(61)).as("items"))
      .where(size(col("items")) <= 60)
    t("scan-join")(Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).count())
    t("sets-build")(sets.count())
    def pairs = sets
      .select(explode(call_function("pair_structs", col("items"))).as("p"))
      .select(col("p.ia").as("ia"), col("p.ib").as("ib"),
        xxhash64(col("p.ia"), col("p.ib")).as("pk"))
    t("pairs-explode")(pairs.count())
    t("sketch-build") {
      pairs.select(call_function("pcy_sketch", col("pk"), lit(23)).as("sk")).collect(); 1L
    }
    t("pair-counts")(graft.operators.Recommend.pairCounts(sets, 4).count())
    // alternate exchange spellings, for the BENCH.md trade record
    t("direct-raw-shuffle")(pairs.repartition(col("ia"), col("ib"))
      .groupBy(col("ia"), col("ib"))
      .agg(count(lit(1)).as("co")).where(col("co") >= 4).count())
    t("full-op")(graft.operators.Recommend.itemItemCosine(spark, dir).count())
    spark.stop()
  }
}
