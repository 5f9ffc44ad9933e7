package graft

import org.apache.spark.sql.functions._

/** Dev tool (VERDICT r7 #8): one-off ≈sf1 measurement of the heaviest
  * events-family bench queries, Spark AND paired DuckDB, to show how
  * the spark/duckdb ratio moves once per-query compute outgrows the
  * 0.1-0.3 s/job scheduling floor that dominates at sf0.1.
  *
  * events replicates `reps`× into /dev/shm with user/event ids offset
  * by a MULTIPLE OF 3600 — lon = (event_id % 3600)/10 − 180 is then
  * invariant, so the replicas land in the SAME cells/time-buckets and
  * per-cell device density grows reps× (what a real sf1 of this
  * generator does), not a reps×-wider geography. Contact-pair volume
  * therefore grows ~reps² — the honest stress. The other nine tables
  * symlink from the source SF so the paired DuckDB run can register
  * its views.
  *
  * Usage: runMain graft.DevScaleProbe [sfDir] [reps] [names...]
  */
object DevScaleProbe {
  private val DefaultQueries = Seq("interaction_pairs", "observed_contacts",
    "total_vs_observed", "cusum_changepoint")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 10
    val names = if (args.length > 2) args.drop(2).toSeq else DefaultQueries
    val runs = sys.env.getOrElse("GRAFT_RUNS", "3").toInt
    val spark = Sessions.build("graft-scale-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors.toString))
    spark.sparkContext.setLogLevel("WARN")

    val out = ensureReplicated(spark, sfDir, reps)

    runProbe(spark, out, names, runs) // stops the session before pairing
  }

  /** Build (once, memoized by a `_done` marker) the density-preserving
    * reps× replication of `sfDir` under /dev/shm: events densify in
    * place (ids offset by a multiple of 3600 so replicas land in the
    * same cells/buckets), orders/lineitem grow TPC-H-style with offset
    * keys, small catalogs symlink. Shared by the scale probes and the
    * in-session perf A/B harnesses.
    */
  def ensureReplicated(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, reps: Int): String = {
    val out = s"/dev/shm/graft_sf${reps}x"
    val done = new java.io.File(s"$out/_done")
    if (!done.exists()) {
      new java.io.File(out).mkdirs()
      // single part file published as a plain .parquet FILE — the
      // DuckDB pairing globs exactly "<dir>/<t>.parquet" like the
      // driver's own testdata layout
      def publish(df: org.apache.spark.sql.DataFrame, t: String): Unit = {
        // 16 MB row groups: a coalesce(1) file with the 128 MB default
        // leaves 1-2 row groups — Spark's scan parallelism is bounded
        // by row-group count, which would throttle the probe's scans
        // in a way a real sf1 file (many row groups) is not
        df.coalesce(1).write.mode("overwrite")
          .option("parquet.block.size", 16 * 1024 * 1024)
          .parquet(s"$out/_tmp_$t")
        val part = new java.io.File(s"$out/_tmp_$t").listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$out/$t.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      val big = 3600000000L // multiple of 3600: lon/tw invariant per copy
      val ev = Tables.events(spark, sfDir)
      publish((0 until reps).map(r => ev.select(
          (col("event_id") + lit(r * big)).as("event_id"), col("ts"),
          (col("user_id") + lit(r * big)).as("user_id"),
          col("event_type"), col("value"), col("props")))
        .reduce(_ unionByName _), "events")
      // orders/lineitem scale with offset order/cust/part keys — the
      // TPC-H sf semantics (catalog grows with volume)
      val o = Tables.orders(spark, sfDir)
      publish((0 until reps).map(r => o.select(
          o.columns.map {
            case c @ ("o_orderkey" | "o_custkey") => (col(c) + lit(r * big)).as(c)
            case c => col(c)
          }: _*)).reduce(_ unionByName _), "orders")
      val l = Tables.lineitem(spark, sfDir)
      publish((0 until reps).map(r => l.select(
          l.columns.map {
            case c @ ("l_orderkey" | "l_partkey" | "l_suppkey") =>
              (col(c) + lit(r * big)).as(c)
            case c => col(c)
          }: _*)).reduce(_ unionByName _), "lineitem")
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
          "documents", "embeddings")) {
        val link = java.nio.file.Paths.get(s"$out/$t.parquet")
        java.nio.file.Files.deleteIfExists(link)
        java.nio.file.Files.createSymbolicLink(link,
          java.nio.file.Paths.get(s"$sfDir/$t.parquet"))
      }
      done.createNewFile()
    }
    out
  }

  private def runProbe(spark: org.apache.spark.sql.SparkSession,
      out: String, names: Seq[String], runs: Int): Unit = {
    val ops = names.map(n => SparkEntry.allOps.find(_.name == n).get)
    ops.foreach(op => op.run(spark, out).count()) // warm
    val spark_t = ops.map { op =>
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        op.run(spark, out).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[spark] ${op.name}%-22s min=${ts.min}%.2f " +
        f"raw=[${ts.map(t => f"$t%.2f").mkString(", ")}]")
      op.name -> ts.min
    }.toMap
    spark.stop()

    // GRAFT_PAIR=0 skips the oracle pairing — for queries where the
    // oracle engine is resource-bound at 10× (the r18 impute_fixpoint
    // lesson: DuckDB materializing a wedge-scale join eats >100 GB)
    if (sys.env.get("GRAFT_PAIR").contains("0")) return

    // paired DuckDB over the SAME replicated dir, same session window
    val spec = ops.flatMap(op => op.oracle.map(sql =>
        jstr(op.name) + ":" + jstr(sql)))
      .mkString(s"""{"sf":${jstr(out)},"runs":$runs,"queries":{""", ",", "}}")
    val sp = java.nio.file.Files.createTempFile("scale_duck", ".json")
    java.nio.file.Files.write(sp, spec.getBytes("UTF-8"))
    val pb = new ProcessBuilder("python3",
      new java.io.File("tools/bench_duckdb.py").getAbsolutePath, sp.toString)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    val proc = pb.start()
    val outStr = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    proc.waitFor()
    java.nio.file.Files.deleteIfExists(sp)
    outStr.linesIterator.filter(_.contains('\t')).foreach { l =>
      val Array(n, t) = l.split('\t')
      val st = spark_t.getOrElse(n, Double.NaN)
      println(f"[paired] $n%-22s spark=$st%.2f duckdb=${t.toDouble}%.2f " +
        f"ratio=${st / t.toDouble}%.2fx")
    }
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
