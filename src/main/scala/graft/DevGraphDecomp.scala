package graft

import org.apache.spark.sql.functions._

/** Dev probe (r10, VERDICT r9 #1): stage-level decomposition of the
  * dense-path graph queries, to attribute the sf0.1 bench time that
  * remains after the bitset kernel landed. Replays the PRE-r10-fusion
  * stage sequence of GraphMetrics.withDensityChoice + buildBitsets +
  * the triangle kernel, timing each Spark job separately (its nd +
  * collect numbers are what motivated the r10 one-collect chooser
  * fusion, which deleted stages 2-3 below on the small-universe
  * path — see OPTIMIZATION_r10.md):
  *
  *   1. gate      — approx_count_distinct over events.user_id
  *   2. nd        — edges subtree materialize (persist) + node-degree
  *                  groupBy + bounded collect (the chooser pass)
  *   3. bitset    — mergeable bitset_agg over the cached edges + the
  *                  ≤128 MB driver collect
  *   4. kernel    — the broadcast AND+popcount pair scan itself
  *
  * Usage: runMain graft.DevGraphDecomp [sfDir] [rounds]
  */
object DevGraphDecomp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.build("graft-gdecomp",
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors.toString))
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // warm: classload + codegen
    operators.GraphMetrics.graphTriangles(spark, sfDir).count()
    (1 to rounds).foreach { r =>
      val (ub, tGate) = t {
        Tables.events(spark, sfDir)
          .agg(approx_count_distinct(col("user_id"))).collect()(0).getLong(0)
      }
      val e = operators.Interactions.empiricEdges(spark, sfDir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (nd, tNd) = t {
        e.select(col("src").as("node"))
          .unionByName(e.select(col("dst").as("node")))
          .groupBy(col("node")).agg(count(lit(1)).as("d"))
          .as[(Long, Long)].collect()
      }
      val n = nd.length
      val ids = nd.map(_._1).sorted
      val idmap = spark.createDataset(ids.toSeq.zipWithIndex).toDF("id", "nid")
      val (bits, tBits) = t {
        val enc = e
          .join(broadcast(idmap.select(col("id").as("src"), col("nid").as("na"))), Seq("src"))
          .join(broadcast(idmap.select(col("id").as("dst"), col("nid").as("nb"))), Seq("dst"))
          .select(col("na"), col("nb"))
        val out = Array.fill(n)(new Array[Long]((n + 63) >>> 6))
        enc.select(col("na").as("g"), col("nb").as("i"))
          .unionByName(enc.select(col("nb").as("g"), col("na").as("i")))
          .groupBy(col("g"))
          .agg(call_function("bitset_agg", col("i"), lit(n)).as("bits"))
          .as[(Int, Array[Byte])].collect()
          .foreach { case (g, b) => out(g) = graft.functions.BitsetAgg.words(b) }
        out
      }
      // the r10 small-|E| driver-side build, for comparison with the
      // agg-shuffle path timed above
      val (_, tCollectBuild) = t { e.as[(Long, Long)].collect() }
      val (tri, tKernel) = t {
        operators.GraphMetrics.nodeTrianglesBitset(spark, e, n,
            Some(operators.GraphMetrics.DenseBuild(ids, nd.map(_._2).sum / 2)))
          .agg((sum(col("tri")) / 3).cast("long")).collect()(0).getLong(0)
      }
      e.unpersist()
      // NOTE kernel re-runs bitset_agg internally (it can't take the
      // prebuilt matrix), so tKernel ≈ tBits + the pure pair scan;
      // pure-scan ≈ tKernel - tBits.
      println(f"round$r: gate=$tGate%.2f nd=$tNd%.2f aggBuild=$tBits%.2f " +
        f"collectBuild=$tCollectBuild%.2f kernel(incl. rebuild)=$tKernel%.2f " +
        f"[n=$n ub=$ub tri=$tri] " +
        f"total≈${tGate + tNd + tBits + tKernel}%.2f")
      val _ = bits
    }
    spark.stop()
  }
}
