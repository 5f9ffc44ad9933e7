package graft

import org.apache.spark.sql.functions._

/** Dev probe (r8, cited in BENCH.md): decompose item_item_cosine's ≈sf1 time
  * (19 s at 10× scaled catalog vs DuckDB 2.6 s) into nested prefixes.
  * Run against a DevScaleProbe-replicated dir.
  */
object DevCfProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/dev/shm/graft_sf10x")
    val runs = sys.env.getOrElse("GRAFT_RUNS", "3").toInt
    val spark = Sessions.build("graft-cf-profile",
      Runtime.getRuntime.availableProcessors.toString)
    spark.sparkContext.setLogLevel("WARN")

    def sets = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("u"), col("l_partkey").as("i"))
      .groupBy(col("u"))
      .agg(call_function("min_k_distinct", col("i"), lit(61)).as("items"))
      .where(size(col("items")) <= 60)

    def pairsOnly = sets
      .select(explode(call_function("pair_structs", col("items"))).as("p"))
      .select(col("p.ia").as("ia"), col("p.ib").as("ib"))

    val stages: Seq[(String, () => Long)] = Seq(
      "join_only" -> (() => Tables.orders(spark, dir)
        .join(Tables.lineitem(spark, dir),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey"), col("l_partkey")).count()),
      "sets" -> (() => sets.count()),
      "explode_nocount" -> (() => pairsOnly
        // terminal count() collapses to a row-count agg WITHOUT the
        // exchange; force the full explode CPU but no shuffle
        .select(sum(col("ia") + col("ib"))).count()),
      "pair_counts" -> (() => operators.Recommend
        .pairCounts(sets, minCount = 4).count()),
      "pcy_sketch_only" -> (() => {
        val spread = sets.repartition(
          spark.sparkContext.defaultParallelism)
        val pairs = spread
          .select(explode(call_function("pair_structs", col("items"))).as("p"))
          .select(xxhash64(col("p.ia"), col("p.ib")).as("pk"))
        pairs.select(call_function("pcy_sketch", col("pk"), lit(23)).as("sk"))
          .select(length(col("sk")).cast("long").as("n")).count()
      }),
      "pcy_full" -> (() => operators.Recommend
        .pairCounts(sets, minCount = 4, usePcy = true).count()),
      "pcy_b26" -> (() => operators.Recommend
        .pairCounts(sets, minCount = 4, bits = 26, usePcy = true).count()),

      "full" -> (() => operators.Recommend
        .itemItemCosine(spark, dir).count()))

    stages.foreach { case (_, f) => f() }
    val best = collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to runs; (label, f) <- stages) {
      val t0 = System.nanoTime()
      val n = f()
      val dt = (System.nanoTime() - t0) / 1e9
      best(label) = math.min(dt, best.getOrElse(label, Double.MaxValue))
      println(f"$label%-16s $n%10d rows in $dt%.2f s")
    }
    stages.foreach { case (l, _) => println(f"BEST $l%-16s ${best(l)}%.2f s") }
    spark.stop()
  }
}
