package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** quantile_normalize (operators/Stats.scala): the defining property
  * of quantile normalization — after the transform, every feature
  * carries the IDENTICAL multiset of values (the shared reference
  * distribution) — plus monotonicity within each feature. The oracle
  * pins the arithmetic; this pins that the op does what the method
  * promises.
  */
class QuantileNormalizeSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("all features share one distribution after normalization; order is kept") {
    val rows = SparkEntry.queries("quantile_normalize")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4)))
    val byFeature = rows.groupBy(_._1)
    assert(byFeature.keySet == Set("qty", "price", "disc"))
    val sizes = byFeature.values.map(_.length).toSet
    assert(sizes.size == 1, s"unequal feature sizes: $sizes")
    // identical multiset of normalized values in every feature
    val dists = byFeature.values.map(_.map(_._5).sorted.toSeq).toSeq
    assert(dists.distinct.size == 1,
      "features do not share the reference distribution")
    // within a feature, normalization preserves the value ordering
    byFeature.values.foreach { f =>
      val byRank = f.sortBy(_._4)
      byRank.sliding(2).foreach { case Array((_, _, v1, _, n1), (_, _, v2, _, n2)) =>
        assert(v1 <= v2, "rank order disagrees with value order")
        assert(n1 <= n2, "normalized values not monotone in rank")
      case _ => ()
      }
    }
    // and it actually rescaled: price values land on the shared scale
    val priceMax = byFeature("price").map(_._5).max
    val qtyMax = byFeature("qty").map(_._5).max
    assert(priceMax == qtyMax, "shared distribution must share extremes")
  }
}
