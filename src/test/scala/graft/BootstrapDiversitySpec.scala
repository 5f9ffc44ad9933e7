package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** r15 batch: poisson_bootstrap and l_diversity. The oracles pin
  * cross-engine arithmetic; these pin the STATISTICS — that the
  * bootstrap actually behaves like a bootstrap, and that the
  * diversity report matches a from-scratch model.
  */
class BootstrapDiversitySpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("poisson bootstrap replicates behave like resamples of the mean") {
    import org.apache.spark.sql.functions._
    val truth = Tables.lineitem(spark, sf)
      .agg(avg(col("l_extendedprice"))).collect()(0).getDouble(0)
    val n = Tables.lineitem(spark, sf).count()
    val reps = SparkEntry.queries("poisson_bootstrap")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(reps.length == 32 && reps.map(_._1).toSet == (0 until 32).toSet)
    // n_eff ~ Poisson(n) per replicate: 6-sigma band around n
    val band = 6 * math.sqrt(n.toDouble)
    reps.foreach { case (b, nEff, _) =>
      assert(math.abs(nEff - n) <= band, s"replicate $b n_eff $nEff vs n $n")
    }
    // the truth lands inside the replicate range (32 resampled means
    // of a 6k-row fixture bracket the point estimate overwhelmingly)
    val means = reps.map(_._3)
    assert(means.min <= truth && truth <= means.max,
      s"truth $truth outside [${means.min}, ${means.max}]")
    // and the replicates genuinely vary (weights aren't constant)
    assert(means.distinct.length > 16)
  }

  test("l_diversity matches a from-scratch model and flags homogeneity") {
    val rows = Tables.customer(spark, sf)
      .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getString(1), r.getDouble(2)))
    val model = rows.groupBy(t => (t._1, t._2)).map { case ((nk, seg), xs) =>
      val bands = xs.map(t => math.floor(t._3 / 2000).toLong)
      val counts = bands.groupBy(identity).view.mapValues(_.size)
      val top = counts.values.max
      (nk, seg) -> (xs.length.toLong, counts.size.toLong,
        BigDecimal(top.toDouble / xs.length)
          .setScale(9, BigDecimal.RoundingMode.HALF_EVEN).toDouble)
    }
    val got = SparkEntry.queries("l_diversity")(spark, sf).collect()
    assert(got.length == model.size)
    got.foreach { r =>
      val key = (r.getAs[Number](0).longValue, r.getString(1))
      val (size, l, share) = model(key)
      assert(r.getLong(2) == size && r.getLong(3) == l, s"$key")
      assert(math.abs(r.getDouble(4) - share) < 1e-9, s"$key share")
      assert(r.getBoolean(5) == (l < 3 || r.getDouble(4) > 0.8), s"$key flag")
    }
  }
}
