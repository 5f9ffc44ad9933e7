package graft

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev-only: per-stage wall breakdown for named bench ops.
  * `sbt "runMain graft.DevProfile <sfDir> <name> [name...]"`.
  */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = Sessions.build("graft-profile", cpus)
    spark.sparkContext.setLogLevel("WARN")
    val stages = ArrayBuffer[(Int, String, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += ((i.stageId, i.name.takeWhile(_ != '\n').take(60), wall, i.numTasks))
        }
      }
    })
    val ops = SparkEntry.benchQueries.filter(o => names.isEmpty || names(o.name))
    ops.foreach { op =>
      op.run(spark, sfDir).count() // warm
      Thread.sleep(200)
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      op.run(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      System.err.println(f"== ${op.name} total=$total%.3f s")
      stages.synchronized {
        stages.sortBy(_._1).foreach { case (id, nm, wall, nt) =>
          System.err.println(f"   stage $id%4d $wall%6d ms tasks=$nt%3d  $nm")
        }
        System.err.println(f"   sum-stage-wall=${stages.map(_._3).sum} ms over ${stages.size} stages")
      }
    }
    spark.stop()
  }
}
