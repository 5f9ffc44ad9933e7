package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Clustering

/** The adaptive CC chooser's correctness claim: the bounded driver
  * union-find and the distributed star contraction are the SAME
  * function (integer set semantics — no float discipline needed, per
  * the r20 kernel lesson). The equality is checked on a seeded random
  * multigraph with self-loops, duplicate edges and both orientations
  * (everything the prep stage must normalize away), plus corner
  * shapes. R2/R3Spec keep the crafted-graph expectations (which now
  * ride the local path by default) and the forced-distributed
  * convergence guard.
  */
class ClusteringKernelSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("local union-find == distributed star on a seeded random multigraph") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    // sparse region (many components) + a dense clique core, ids
    // deliberately NON-contiguous so the dense re-index is exercised
    val edges = (
      Seq.fill(600)((rnd.nextInt(400).toLong * 7919L, rnd.nextInt(400).toLong * 7919L)) ++
        (0 until 40).flatMap(i => (i + 1 until 40).map(j => (i.toLong, j.toLong))) ++
        Seq((5L, 5L), (13L, 13L)) // self loops: prep must drop them
      ).toDF("src", "dst")
    val local = labelsOf(Clustering.connectedComponentsStar(edges))
    val dist = labelsOf(Clustering.connectedComponentsStar(edges, maxLocalEdges = 0L))
    assert(local == dist, {
      val diff = (local.keySet ++ dist.keySet)
        .filter(k => local.get(k) != dist.get(k)).take(5)
      s"kernel divergence at nodes $diff: local=${diff.map(local.get)} dist=${diff.map(dist.get)}"
    })
    assert(local.nonEmpty)
    // label convention: every component labels itself with its min member
    val byComp = local.groupBy(_._2).view.mapValues(_.keys.min).toMap
    assert(byComp.forall { case (comp, minNode) => comp == minNode },
      "component label must be the minimum member id")
  }

  test("local kernel corners: empty edges, all-self-loops, single edge") {
    import spark.implicits._
    val empty = Clustering.connectedComponentsStar(
      Seq.empty[(Long, Long)].toDF("src", "dst"))
    assert(empty.columns.toSeq == Seq("node", "component"))
    assert(empty.count() == 0)
    val loops = Clustering.connectedComponentsStar(
      Seq((3L, 3L), (9L, 9L)).toDF("src", "dst"))
    assert(loops.count() == 0, "self-loop-only input labels no nodes (prep drops loops)")
    val one = labelsOf(Clustering.connectedComponentsStar(
      Seq((42L, 7L)).toDF("src", "dst")))
    assert(one == Map(42L -> 7L, 7L -> 7L))
  }
}
