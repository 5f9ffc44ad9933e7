package graft

import org.apache.spark.sql.functions._

/** One-off scaling probe (dev-only, like DevExplain): replicate the
  * sf0.1 documents corpus in memory and measure the crawl front end's
  * row-local throughput — evidence that the kernels are compute-bound
  * scan work, not shuffle-bound.
  */
object DevCrawlProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("crawl-probe", "32")
    spark.sparkContext.setLogLevel("ERROR")
    val mult = args.headOption.map(_.toInt).getOrElse(100)
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    val big = base.crossJoin(
        spark.range(mult).select(col("id").as("rep")))
      .select((col("doc_id") * mult + col("rep")).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
    val dir = "/dev/shm/crawl-probe"
    // the try starts BEFORE the write: a partial corpus from a failed
    // write (tmpfs full at high mult) must also be cleaned up
    try {
      // 64 files so the scan parallelizes across the 32 cores — a single
      // 150 MB parquet would coalesce to ~2 input splits
      big.repartition(64).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      // one setup pass for both corpus stats
      val stats = spark.read.parquet(s"$dir/documents.parquet")
        .agg(count(lit(1)), sum(length(col("text")))).head()
      val n = stats.getLong(0)
      val bytes = stats.getLong(1)
      for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      val r = operators.WebCuration.crawlPipeline(spark, dir)
        .agg(sum(col("n_docs")), sum(col("n_chars"))).head()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] round=$round docs=$n%,d textMB=${bytes / 1e6}%.0f " +
        f"wall=$dt%.2f s -> ${n / dt / 1e6}%.2f Mdocs/s, " +
        f"${bytes / 1e6 / dt}%.0f MB/s (kept=${r.getLong(0)})")
      }
    } finally {
      // tmpfs is RAM — a leftover 150 MB corpus would squat on shared
      // memory until reboot
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
    spark.stop()
  }
}
