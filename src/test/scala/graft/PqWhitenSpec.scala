package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r14 batch 2: ann_pq, embedding_whiten, lang_confusion. Oracle rows
  * pin cross-engine parity; these pin semantics — the PQ ranking must
  * match a from-scratch ADC model, whitening must actually whiten
  * (unit variance, zero mean), and the confusion matrix must reconcile
  * with the lang_id predictions it summarizes.
  */
class PqWhitenSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def vecs(): Map[Long, Array[Double]] =
    Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap

  test("ann_pq equals a driver-side product-quantization ADC model") {
    val x = vecs()
    val cbIds = Seq(0L, 50L, 100L, 150L)
    // codeword k of subspace m = dims [m*8, m*8+8) of seed vector k*50
    def cw(k: Int, m: Int): Array[Double] = x(cbIds(k)).slice(m * 8, m * 8 + 8)
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    def code(v: Array[Double], m: Int): Int =
      (0 until 4).minBy(k => (l2(v.slice(m * 8, m * 8 + 8), cw(k, m)), k))
    def r9(v: Double) =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r15(v: Double) =
      BigDecimal(v).setScale(15, BigDecimal.RoundingMode.HALF_UP)
    val want = (0L until 10L).map { q =>
      val qv = x(q)
      val dt = Array.tabulate(8, 4)((m, k) => l2(qv.slice(m * 8, m * 8 + 8), cw(k, m)))
      val scored = x.toSeq.filter(_._1 != q).map { case (id, v) =>
        (id, r9((0 until 8).map(m => r15(dt(m)(code(v, m)))).sum.toDouble))
      }
      q -> scored.sortBy { case (id, d) => (d, id) }.take(3)
    }.toMap
    val got = SparkEntry.queries("ann_pq")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .groupBy(_._1)
    assert(got.keySet == (0L until 10L).toSet)
    got.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._4).map(r => (r._2, r._3))
      assert(sorted.toSeq == want(q).toSeq,
        s"query $q: ${sorted.toSeq} != ${want(q)}")
    }
  }

  test("ann_pq plan: codebook and distance table broadcast; no cartesian join") {
    val df = SparkEntry.queries("ann_pq")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "codebook/dtab sides must broadcast:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct"),
      "corpus may never cartesian-join:\n" + p.take(1500))
    assert(!p.contains("SortMergeJoin"), "nothing here warrants a corpus sort")
  }

  test("embedding_whiten output has zero mean and unit variance per dimension") {
    // the ARRAY-returning library API (the registered query is its
    // long-form scalar projection — r8 canonizer fix)
    val rows = operators.Linalg.embeddingWhiten(spark, sf).collect()
      .map(r => r.getSeq[Double](1).toArray)
    val n = rows.length
    assert(n == 500 && rows.forall(_.length == 64))
    (0 until 64).foreach { j =>
      val c = rows.map(_(j))
      val mean = c.sum / n
      val v = c.map(x => (x - mean) * (x - mean)).sum / n
      assert(math.abs(mean) < 1e-6, s"dim $j mean $mean")
      assert(math.abs(v - 1.0) < 1e-6, s"dim $j var $v")
    }
  }

  test("lang_confusion reconciles with lang_id row-for-row") {
    val truth = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pred = SparkEntry.queries("lang_id")(spark, sf)
      .select(col("doc_id"), col("pred_lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val wantCells = truth.toSeq
      .groupBy { case (id, lang) => (lang, pred(id)) }
      .map { case (k, g) => k -> g.size.toLong }
    val got = SparkEntry.queries("lang_confusion")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == wantCells.keySet)
    val totals = truth.groupBy(_._2).map { case (l, g) => l -> g.size }
    got.foreach { case ((lang, p), (n, rate)) =>
      assert(n == wantCells((lang, p)))
      val wantRate = BigDecimal(n.toDouble / totals(lang))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rate == wantRate, s"($lang,$p) rate $rate != $wantRate")
    }
    assert(got.values.map(_._1).sum == truth.size, "cells must partition the corpus")
  }
}
