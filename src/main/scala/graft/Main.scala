package graft

import java.time.LocalDate
import graft.pipeline.Pipeline
import graft.pipeline.Pipeline.RunConfig

/** CLI entry point (replaces the reference's per-script click CLIs,
  * e.g. /root/reference/scripts/NetworkBuilder.py:483-538):
  *
  *   run-daily <dataDir> <yyyy-MM-dd> <outDir> [nSeeds]
  *       full daily pipeline: contact matrix → SBM network (GraphML)
  *       → seeded SEIR runs → status + infected-per-block parquet
  *   query <name> <sfDir>
  *       run one registered operator and print 20 rows
  *   list
  *       list registered operators
  */
object Main {
  def main(args: Array[String]): Unit = args.toList match {
    case "run-daily" :: dataDir :: date :: outDir :: rest =>
      val seeds = 0 until rest.headOption.map(_.toInt).getOrElse(4)
      val spark = Sessions.build("graft", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      spark.sparkContext.setLogLevel("WARN")
      val cfg = RunConfig(dataDir, LocalDate.parse(date))
      val (matrix, vertices, edges, status) = Pipeline.dailyRun(spark, cfg, seeds)
      new java.io.File(outDir).mkdirs()
      matrix.coalesce(1).write.mode("overwrite").parquet(s"$outDir/contact_matrix")
      graft.sources.GraphML.write(vertices, edges, s"$outDir/network.graphml")
      status.write.mode("overwrite").parquet(s"$outDir/seir_status")
      val blocks = vertices.selectExpr("CAST(node_id AS LONG) AS nodeId",
        "attrs['block'] AS block")
      graft.sim.Seir.infectedPerBlock(status, blocks)
        .write.mode("overwrite").parquet(s"$outDir/infected_per_block")
      println(s"[graft] daily run ${cfg.date} -> $outDir")
      spark.stop()
    case "query" :: name :: sfDir :: Nil =>
      val spark = Sessions.build("graft", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      spark.sparkContext.setLogLevel("WARN")
      SparkEntry.queries.get(name) match {
        case Some(fn) => fn(spark, sfDir).show(20, truncate = false)
        case None =>
          System.err.println(s"unknown query '$name'; try: graft.Main list")
          sys.exit(2)
      }
      spark.stop()
    case "list" :: Nil =>
      SparkEntry.allOps.sortBy(_.name).foreach { op =>
        val kind = if (op.oracle.isDefined) "oracle" else "rows  "
        println(f"$kind  ${op.name}")
      }
    case _ =>
      System.err.println(
        """usage: graft.Main run-daily <dataDir> <yyyy-MM-dd> <outDir> [nSeeds]
          |       graft.Main query <name> <sfDir>
          |       graft.Main list""".stripMargin)
      sys.exit(2)
  }
}
