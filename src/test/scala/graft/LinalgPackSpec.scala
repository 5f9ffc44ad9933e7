package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r14 additions: pca_power, zipf_fit, sequence_pack. Oracle rows pin
  * cross-engine parity; these specs pin the MATH — the engine result
  * must equal a from-scratch driver-side model that re-implements the
  * documented determinism discipline (sequential-fold dots, round-15
  * decimal sums, 12-dp iterate canonicalization), and the packing must
  * tile the corpus token stream exactly.
  */
class LinalgPackSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def r(v: Double, dp: Int): Double =
    BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Order-free sum: round each term to 15 dp, accumulate exactly. */
  private def ofSum(terms: Iterable[Double]): Double =
    terms.map(t => BigDecimal(t).setScale(15, BigDecimal.RoundingMode.HALF_UP))
      .foldLeft(BigDecimal(0))(_ + _).toDouble

  test("pca_power equals a driver-side power iteration under the same discipline") {
    val x = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val d = 64
    val mu = (0 until d).map(j => r(ofSum(x.map(_(j))) / x.length, 12)).toArray
    val c = x.map(row => row.indices.map(j => row(j) - mu(j)).toArray)
    var v = Array.fill(d)(0.125)
    val want = (1 to 3).map { _ =>
      // sequential fold, exactly vec_dot's order
      val s = c.map { row =>
        var acc = 0.0
        var j = 0
        while (j < d) { acc += row(j) * v(j); j += 1 }
        acc
      }
      val w = (0 until d).map(j => ofSum(c.indices.map(i => s(i) * c(i)(j)))).toArray
      val nrm = math.sqrt(ofSum(w.map(wj => wj * wj)))
      v = w.map(wj => r(wj / nrm, 12))
      (v.toSeq, r(nrm, 9))
    }
    val got = SparkEntry.queries("pca_power")(spark, sf).collect()
      .map(row => (row.getInt(0), row.getInt(1), row.getDouble(2), row.getDouble(3)))
    assert(got.length == 3 * d)
    got.foreach { case (round, dim, loading, lambda) =>
      val (wv, wl) = want(round - 1)
      assert(loading == wv(dim), s"round $round dim $dim: $loading != ${wv(dim)}")
      assert(lambda == wl, s"round $round lambda: $lambda != $wl")
    }
    // the iterate is a unit vector after every round
    (1 to 3).foreach { round =>
      val n2 = want(round - 1)._1.map(x => x * x).sum
      assert(math.abs(n2 - 1.0) < 1e-9, s"round $round |v|^2 = $n2")
    }
    // eigenvalue estimate is non-decreasing across rounds (power
    // iteration converges from below on this fixture)
    assert(want(0)._2 <= want(1)._2 + 1e-9 && want(1)._2 <= want(2)._2 + 1e-9,
      s"lambda sequence ${want.map(_._2)}")
  }

  test("zipf_fit equals a driver-side OLS over the top-500 vocabulary") {
    val tf = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
      .where(col("t") =!= "")
      .groupBy("t").agg(count(lit(1)).as("n")).collect()
      .map(row => (row.getString(0), row.getLong(1)))
      .sortBy { case (t, n) => (-n, t) }.take(500)
    val xy = tf.zipWithIndex.map { case ((_, n), i) =>
      (r(math.log(i + 1.0), 12), r(math.log(n.toDouble), 12))
    }
    val k = xy.length.toDouble
    val (sx, sy) = (ofSum(xy.map(_._1)), ofSum(xy.map(_._2)))
    val sxx = ofSum(xy.map(p => p._1 * p._1))
    val syy = ofSum(xy.map(p => p._2 * p._2))
    val sxy = ofSum(xy.map(p => p._1 * p._2))
    val cov = k * sxy - sx * sy
    val varx = k * sxx - sx * sx
    val vary = k * syy - sy * sy
    val row = SparkEntry.queries("zipf_fit")(spark, sf).collect().head
    assert(row.getLong(0) == xy.length)
    assert(row.getDouble(1) == r(cov / varx, 9), "slope")
    assert(row.getDouble(2) == r((sy - (cov / varx) * sx) / k, 9), "intercept")
    assert(row.getDouble(3) == r(cov * cov / (varx * vary), 9), "r2")
    assert(row.getDouble(1) < 0, "Zipf exponent must be negative")
    // the fixture's generator draws from a near-uniform vocabulary, so
    // its rank-frequency curve is FLAT (r2 ≈ 0.06 here vs ≈0.9+ for
    // natural text) — exactly the synthetic-text signal the diagnostic
    // exists to raise. Pin the low-r2 regime so a fixture change that
    // breaks this reading is noticed.
    assert(row.getDouble(3) > 0.0 && row.getDouble(3) < 0.5,
      s"synthetic fixture must read as non-Zipfian, got r2=${row.getDouble(3)}")
  }

  test("sequence_pack tiles the corpus token stream with no gaps or overlaps") {
    val rows = SparkEntry.queries("sequence_pack")(spark, sf).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2),
        row.getLong(3), row.getLong(4), row.getLong(5)))
      .sortBy(_._3)
    val total = rows.map(_._2).sum
    // perfect concatenation: each document starts where the previous ends
    rows.foldLeft(0L) { case (expectOff, (id, n, off, first, last, cuts)) =>
      assert(off == expectOff, s"doc $id: offset $off, expected $expectOff")
      assert(first == off / 64 && last == (off + n - 1) / 64 && cuts == last - first,
        s"doc $id sequence arithmetic")
      off + n
    } match { case end => assert(end == total) }
    // cut accounting: total cuts == interior sequence boundaries that
    // land strictly inside a document
    val cutTotal = rows.map(_._6).sum
    val boundaries = (1L until (total + 63) / 64).map(_ * 64)
    val starts = rows.map(_._3).toSet
    assert(cutTotal == boundaries.count(b => !starts.contains(b)),
      "every interior boundary not at a document start cuts exactly one document")
  }
}
