package graft

import org.apache.spark.sql.functions._

/** Dev probe (r8, cited in BENCH.md): where does market_basket's 0.88 s go?
  * Times nested prefixes of the pipeline in one session, warm.
  */
object DevMbProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("GRAFT_RUNS", "4").toInt
    val spark = Sessions.build("graft-mb-profile",
      Runtime.getRuntime.availableProcessors.toString)
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("GRAFT_OHA_THRESH").foreach(t =>
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", t))

    def sets = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("item"))
      .groupBy(col("okey"))
      .agg(call_function("min_k_distinct", col("item"), lit(1025)).as("items"))
      .where(size(col("items")) <= 1024)

    val stages: Seq[(String, () => Long)] = Seq(
      "scan_only" -> (() => Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_partkey")).count()),
      "agg_count" -> (() => Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("okey"), col("l_partkey").as("item"))
        .groupBy(col("okey")).agg(count(lit(1))).count()),
      "agg_collect_set" -> (() => Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("okey"), col("l_partkey").as("item"))
        .groupBy(col("okey")).agg(collect_set(col("item")).as("items"))
        .where(size(col("items")) <= 1024).count()),
      "basket_sets" -> (() => sets.count()),
      "item_cnt" -> (() => sets.select(explode(col("items")).as("item"))
        .groupBy(col("item")).agg(count(lit(1))).count()),
      "pair_counts" -> (() => operators.Recommend
        .pairCounts(sets, minCount = 2).count()),
      "full" -> (() => operators.Recommend
        .marketBasket(spark, sfDir).count()))

    stages.foreach { case (_, f) => f() } // warm
    val best = collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to runs; (label, f) <- stages) {
      val t0 = System.nanoTime()
      val n = f()
      val dt = (System.nanoTime() - t0) / 1e9
      best(label) = math.min(dt, best.getOrElse(label, Double.MaxValue))
      println(f"$label%-12s $n%8d rows in $dt%.3f s")
    }
    stages.foreach { case (l, _) => println(f"BEST $l%-12s ${best(l)}%.3f s") }
    spark.stop()
  }
}
