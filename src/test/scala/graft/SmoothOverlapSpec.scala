package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r14 batch 3: ewma_smooth, calibration_bins, kmv_overlap. Driver-side
  * models pin the arithmetic the oracles only mirror.
  */
class SmoothOverlapSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("ewma_smooth equals the exact power-of-two weighted model") {
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getDate(0), r.getLong(1)))
      .sortBy(_._1.getTime)
    val xs = daily.map(_._2)
    val want = xs.indices.map { t =>
      val s = (0 to math.min(29, t)).map(j => xs(t - j) << (29 - j)).sum
      s.toDouble / (1L << 30)
    }
    val got = SparkEntry.queries("ewma_smooth")(spark, sf)
      .orderBy("day").collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == daily.length)
    got.zipWithIndex.foreach { case ((day, n, ewma), t) =>
      assert(day == daily(t)._1 && n == xs(t))
      assert(ewma == want(t), s"day $day: $ewma != ${want(t)}")
    }
    // smoothing actually smooths: ewma variance < raw variance
    def variance(v: Seq[Double]) = {
      val m = v.sum / v.size
      v.map(x => (x - m) * (x - m)).sum / v.size
    }
    // skip the warm-up ramp (zero implicit history) when comparing
    val w = got.map(_._3).drop(5)
    assert(variance(w) < variance(xs.drop(5).map(_.toDouble)),
      "EWMA must reduce day-to-day variance")
  }

  test("calibration_bins reconciles with quality_classifier scores and labels") {
    val lang = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val scores = SparkEntry.queries("quality_classifier")(spark, sf)
      .select(col("doc_id"), col("score")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val want = scores.groupBy { case (_, s) => math.floor(s * 10).toInt }
      .map { case (bin, g) =>
        val n = g.length
        val mean = g.map(p => BigDecimal(p._2)
          .setScale(15, BigDecimal.RoundingMode.HALF_UP))
          .foldLeft(BigDecimal(0))(_ + _).toDouble / n
        val pos = g.count(p => lang(p._1) == "en")
        def r9(v: Double) =
          BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        bin -> ((n.toLong, r9(mean), r9(pos.toDouble / n)))
      }
    val got = SparkEntry.queries("calibration_bins")(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got == want)
    assert(got.values.map(_._1).sum == scores.length,
      "bins must partition the scored corpus")
  }

  test("kmv_overlap: exact anchor is right and the estimate is a plausible Jaccard") {
    val bySrc = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).toSet }
    val got = SparkEntry.queries("kmv_overlap")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap
    val srcs = bySrc.keys.toSeq.sorted
    assert(got.size == srcs.size * (srcs.size - 1) / 2,
      "every unordered source pair must appear, including zero-overlap ones")
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case ((a, b), (est, exact, nAb)) =>
      val inter = (bySrc(a) intersect bySrc(b)).size
      val union = (bySrc(a) union bySrc(b)).size
      assert(nAb == inter, s"($a,$b) n_ab $nAb != $inter")
      assert(exact == r6(inter.toDouble / union), s"($a,$b) exact_jaccard")
      assert(est >= 0.0 && est <= 1.0)
      // k = 64 >= per-source distinct count at this SF, so the sketch
      // is the exact set and the estimator must DEGENERATE to exact
      // Jaccard of the distinct-hash sets — pin that regime
      if (bySrc(a).size <= 64 && bySrc(b).size <= 64)
        assert(est == r6(inter.toDouble / union),
          s"($a,$b) sketch covers both sets, estimate must be exact: $est")
    }
  }
}
