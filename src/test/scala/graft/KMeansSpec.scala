package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Lloyd-iteration invariants the assignment oracle can't express. */
class KMeansSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("inertia is monotonically non-increasing across Lloyd iterations") {
    val trace = Similarity.kmeansIterate(spark, sf, k = 8, iters = 3)
    assert(trace.length == 3)
    trace.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"inertia rose: $trace")
    }
    // and it must actually improve from the seed assignment
    assert(trace.last < trace.head, s"no improvement: $trace")
  }

  test("first-iteration assignment equals the registered kmeans_assign op") {
    // iterate()'s first assignment uses the identical seed centroids as
    // the oracle-checked op; cluster sizes must agree
    val opSizes = Similarity.kmeansAssign(spark, sf)
      .groupBy("cluster").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(opSizes.values.sum > 0)
    assert(opSizes.keySet.subsetOf((0L until 8L).toSet))
  }
}
