package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{GraphMetrics, Interactions}

/** r10 chooser-path coverage (added with the small-universe fast
  * path): at every fixture SF the fast path (ONE bounded edge
  * collect, ids/degrees derived driver-side) now handles the bench
  * graph queries, so the mid-universe chooser cell — device upper
  * bound past the fast-path bound (1.25·ub)²/2 > MaxDriverEdges, yet
  * |E| under the driver cap — would otherwise run in no test at all.
  * This fixture (12 000 devices, 6 000 disjoint co-location pairs)
  * forces exactly that cell: the chooser runs the persisted degree
  * pre-aggregate and buildBitsets runs its own cache-scan edge
  * collect. The registered query through that path must agree row-
  * for-row with (a) the kernel invoked directly with pre=None — the
  * mergeable bitset_agg build, a THIRD construction route — and
  * (b) the closed-form answer of a disjoint-pairs graph.
  */
class GraphChooserSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** 2·pairs devices; devices (2i, 2i+1) co-locate in cell c_i, one
    * 10-minute window; no cross-pair co-location.
    */
  private def pairFixture(pairs: Int): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r10chooser").toString
    (0L until pairs.toLong).flatMap { i =>
      Seq((2 * i, 0L, 2 * i, s"c$i", 1.0),
        (2 * i + 1, 0L, 2 * i + 1, s"c$i", 1.0))
    }.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("ts_s"))).drop("ts_s")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("mid-universe chooser: degree pass + cache edge collect == direct agg-built kernel == closed form") {
    val pairs = 6000
    val dir = pairFixture(pairs)
    // registered-query route: deviceUb ≈ 12000 ⇒ (1.25·ub)²/2 ≈ 112M
    // > MaxDriverEdges ⇒ the fast path is bypassed; n = 12000 ≤ cap
    // and acceptDense = always for components ⇒ dense via the
    // persisted chooser + buildBitsets' own collect
    val viaChooser = GraphMetrics.graphComponents(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(viaChooser.length == 2 * pairs)
    // closed form: component of {2i, 2i+1} is 2i, size 2
    viaChooser.foreach { case (node, comp, csize) =>
      assert(comp == node - node % 2, s"node $node labeled $comp")
      assert(csize == 2L)
    }
    // third build route: kernel direct, pre=None ⇒ ids distinct +
    // mergeable bitset_agg exchange
    val direct = GraphMetrics.componentsKernel(spark,
        Interactions.empiricEdges(spark, dir), 2 * pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(viaChooser.toSeq == direct.toSeq,
      "chooser-built and agg-built kernels must agree exactly")
  }
}
