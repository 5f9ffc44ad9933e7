package graft

import org.apache.spark.sql.functions._

/** Dev tool (r9, VERDICT r8 #2): build a FULL-REFERENTIAL ≈sf1 dataset
  * for the registry-wide correctness sweep — every fact AND dim table
  * replicated `reps`× with CONSISTENT key offsets, so joins match in
  * every replica (DevScaleProbe's bench-oriented builder replicates
  * only events/orders/lineitem; its offset keys join only replica 0 of
  * the untouched dims — fine for timing one family, wrong for a
  * whole-registry correctness stress). region/nation stay symlinked:
  * their keys (c_nationkey etc.) are NOT offset, so FK integrity
  * holds by construction.
  *
  * Offsets are r*3 600 000 000 (multiple of 3600, the DevScaleProbe
  * discipline): events lon/time-bucket derivations are invariant per
  * copy, so replicas land in the SAME cells/buckets and per-cell
  * density grows reps× — contact-pair volume ~reps², the honest
  * stress. Documents/embeddings replicate id-offset with identical
  * payloads: every document becomes a reps-way exact duplicate and
  * every LSH/ANN bucket grows reps× — the honest stress for the
  * dedup/similarity families (both engines see the same inputs, so
  * the oracle comparison stays exact whatever the semantics do).
  *
  * Usage: runMain graft.DevScaleData [sfDir] [reps]
  * Output: /dev/shm/graft_full<reps>x (idempotent via _done marker).
  */
object DevScaleData {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 10
    val spark = Sessions.build("graft-scale-data",
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors.toString))
    spark.sparkContext.setLogLevel("WARN")
    println(build(spark, sfDir, reps))
    spark.stop()
  }

  def build(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, reps: Int): String = {
    val out = s"/dev/shm/graft_full${reps}x"
    val done = new java.io.File(s"$out/_done")
    if (done.exists()) return out
    new java.io.File(out).mkdirs()
    // single part file published as a plain .parquet FILE, 16 MB row
    // groups (scan parallelism at probe scale — the DevScaleProbe note)
    def publish(df: org.apache.spark.sql.DataFrame, t: String): Unit = {
      df.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", 16 * 1024 * 1024)
        .parquet(s"$out/_tmp_$t")
      val part = new java.io.File(s"$out/_tmp_$t").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$out/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val big = 3600000000L
    /** Replicate with the named key columns offset per replica. */
    def rep(df: org.apache.spark.sql.DataFrame, keys: Set[String])
        : org.apache.spark.sql.DataFrame =
      (0 until reps).map(r => df.select(df.columns.map {
        case c if keys(c) => (col(c) + lit(r * big)).as(c)
        case c => col(c)
      }: _*)).reduce(_ unionByName _)

    publish(rep(Tables.events(spark, sfDir),
      Set("event_id", "user_id")), "events")
    publish(rep(Tables.orders(spark, sfDir),
      Set("o_orderkey", "o_custkey")), "orders")
    publish(rep(Tables.lineitem(spark, sfDir),
      Set("l_orderkey", "l_partkey", "l_suppkey")), "lineitem")
    publish(rep(Tables.customer(spark, sfDir), Set("c_custkey")), "customer")
    publish(rep(Tables.supplier(spark, sfDir), Set("s_suppkey")), "supplier")
    publish(rep(Tables.part(spark, sfDir), Set("p_partkey")), "part")
    publish(rep(Tables.documents(spark, sfDir), Set("doc_id")), "documents")
    publish(rep(Tables.embeddings(spark, sfDir), Set("vec_id")), "embeddings")
    for (t <- Seq("region", "nation")) {
      val link = java.nio.file.Paths.get(s"$out/$t.parquet")
      java.nio.file.Files.deleteIfExists(link)
      java.nio.file.Files.createSymbolicLink(link,
        java.nio.file.Paths.get(s"$sfDir/$t.parquet"))
    }
    done.createNewFile()
    out
  }
}
