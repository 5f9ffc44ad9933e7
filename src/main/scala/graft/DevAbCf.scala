package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (r9, VERDICT r8 #1): in-session alternating A/B of the CF
  * pair-COUNT spelling at ≈sf1 — the 6.3 s explode+exchange+count
  * prefix DevCfProfile isolated is the whole residual vs DuckDB's
  * vectorized hash aggregation, so this harness times alternative
  * spellings of exactly that prefix, interleaved in ONE session
  * (between-JVM noise ±30% ≫ effect, the DevAbPcy discipline).
  *
  * Variants (identical (ia, ib, co) output, checksum-verified):
  *  - direct   — the registered shape: raw repartition(ia,ib), hash agg
  *  - partial  — groupBy without the explicit raw repartition (planner
  *               inserts map-side partial agg; r8 measured ~+30%,
  *               re-measured here for the record)
  *  - sortagg  — repartition + sortWithinPartitions + run-length count
  *               in a mapPartitions pass: near-unique keys make the
  *               hash table ~|pairs| entries; a streaming run-length
  *               over sorted runs never builds it
  *  - packed   — dense-encode items over the |items|-bounded catalog
  *               (row_number, broadcast both probes), pack the pair
  *               into ONE long (da<<32|db), shuffle 8-byte keys
  *               instead of 16-byte rows, hash-agg the single long,
  *               unpack+decode after the count
  *
  * Usage: runMain graft.DevAbCf [sfDir] [reps] [scaleCatalog]
  *   (replication modes shared/scaled as in DevAbPcy)
  */
object DevAbCf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 1
    val scaleCatalog = args.length > 2 && args(2).toBoolean
    val runs = sys.env.getOrElse("GRAFT_RUNS", "5").toInt
    val spark = Sessions.build("graft-ab-cf",
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors.toString))
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = if (reps <= 1) sfDir
              else DevAbPcy.replicate(spark, sfDir, reps, scaleCatalog)

    def sets = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("u"), col("l_partkey").as("i"))
      .groupBy(col("u"))
      .agg(call_function("min_k_distinct", col("i"), lit(61)).as("items"))
      .where(size(col("items")) <= 60)

    def pairs = sets
      .select(explode(call_function("pair_structs", col("items"))).as("p"))
      .select(col("p.ia").as("ia"), col("p.ib").as("ib"))

    val minCount = 4

    def direct: DataFrame = pairs
      .repartition(col("ia"), col("ib"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("co"))
      .where(col("co") >= minCount)

    def partial: DataFrame = pairs
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("co"))
      .where(col("co") >= minCount)

    def sortagg: DataFrame = pairs
      .repartition(col("ia"), col("ib"))
      .sortWithinPartitions(col("ia"), col("ib"))
      .as[(Long, Long)]
      .mapPartitions { rows =>
        val it = rows.buffered
        new Iterator[(Long, Long, Long)] {
          def hasNext: Boolean = it.hasNext
          def next(): (Long, Long, Long) = {
            val a = it.head._1; val b = it.head._2
            var c = 0L
            while (it.hasNext && it.head._1 == a && it.head._2 == b) {
              it.next(); c += 1
            }
            (a, b, c)
          }
        }
      }
      .toDF("ia", "ib", "co")
      .where(col("co") >= minCount)

    def packed: DataFrame = {
      // |items|-bounded catalog; the single-partition window is probe
      // tooling (an engine version would RangeRank it)
      val dense = sets.select(explode(col("items")).as("i")).distinct()
        .withColumn("did", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("i")))
          .cast("long") - 1)
      val co = pairs
        .join(broadcast(dense.select(col("i").as("ia"), col("did").as("da"))),
          Seq("ia"))
        .join(broadcast(dense.select(col("i").as("ib"), col("did").as("db"))),
          Seq("ib"))
        .select((shiftleft(col("da"), 32) + col("db")).as("pk"))
        .repartition(col("pk"))
        .groupBy(col("pk")).agg(count(lit(1)).as("co"))
        .where(col("co") >= minCount)
      co.select(shiftright(col("pk"), 32).as("da"),
          (col("pk") % lit(1L << 32)).as("db"), col("co"))
        .join(broadcast(dense.select(col("did").as("da"), col("i").as("ia"))),
          Seq("da"))
        .join(broadcast(dense.select(col("did").as("db"), col("i").as("ib"))),
          Seq("db"))
        .select(col("ia"), col("ib"), col("co"))
    }

    val all: Seq[(String, () => DataFrame)] = Seq(
      "direct" -> (() => direct), "partial" -> (() => partial),
      "sortagg" -> (() => sortagg), "packed" -> (() => packed))
    // optional variant filter: args(3+) names a subset to re-measure
    val variants =
      if (args.length > 3) all.filter(v => args.drop(3).contains(v._1))
      else all

    // warm + identical-output check: count and an order-free checksum
    def sig(df: DataFrame): (Long, String) = {
      // decimal accumulate: a long sum of xxhash64 overflows under ANSI
      val r = df.agg(count(lit(1)), sum(xxhash64(col("ia"), col("ib"),
        col("co")).cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1).toString)
    }
    val sigs = variants.map { case (l, mk) => l -> sig(mk()) }
    sigs.foreach { case (l, s) => println(s"[sig] $l -> $s") }
    require(sigs.map(_._2).distinct.size == 1,
      s"variants disagree: $sigs")

    val times = collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to runs; (label, mk) <- variants) {
      val t0 = System.nanoTime()
      val n = mk().count()
      val dt = (System.nanoTime() - t0) / 1e9
      times(label) = dt :: times.getOrElse(label, Nil)
      println(f"$label%-8s $n rows in $dt%.2f s")
    }
    variants.foreach { case (l, _) =>
      val ts = times(l)
      println(f"RESULT $l%-8s min=${ts.min}%.2f s median=${
        ts.sorted.apply(ts.size / 2)}%.2f s")
    }
    spark.stop()
  }
}
