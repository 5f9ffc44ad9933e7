package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r14 batch 5: auc_score, target_encoding, feature_hashing. */
class EvalFeaturesSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  test("auc_score equals the pair-counting definition of AUC") {
    val lang = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val scored = SparkEntry.queries("quality_classifier")(spark, sf)
      .select(col("doc_id"), col("score")).collect()
      .map(r => (r.getDouble(1), lang(r.getLong(0)) == "en"))
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filterNot(_._2).map(_._1)
    // brute-force definition: P(pos > neg) + 0.5 P(pos == neg)
    var wins = 0.0
    for (p <- pos; q <- neg)
      wins += (if (p > q) 1.0 else if (p == q) 0.5 else 0.0)
    val wantAuc = BigDecimal(wins / (pos.length.toLong * neg.length))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = SparkEntry.queries("auc_score")(spark, sf).collect().head
    assert(row.getLong(0) == pos.length && row.getLong(1) == neg.length)
    assert(row.getDouble(2) == wantAuc,
      s"auc ${row.getDouble(2)} != pair-counting $wantAuc")
    // the fixture's lang labels are independent of the stand-in
    // weights' features, so the metric must report near-chance
    // discrimination (observed ≈ 0.448) — an AUC far from 0.5 here
    // would mean the metric, not the model, is broken
    assert(row.getDouble(2) > 0.3 && row.getDouble(2) < 0.7,
      s"stand-in model on random labels must score near chance: ${row.getDouble(2)}")
  }

  test("auc_score plan: prefix runs bucketed — no corpus-wide single partition") {
    val df = SparkEntry.queries("auc_score")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the only SinglePartition exchanges allowed are the bounded
    // bucket-offsets relation and the final 1-row aggregate
    val n = p.sliding("Exchange SinglePartition".length)
      .count(_ == "Exchange SinglePartition")
    assert(n <= 2, s"distinct-score relation must not single-partition:\n"
      + p.take(2000))
    assert(p.contains("Exchange hashpartitioning(score"),
      "the distinct-score aggregation must be a hashed exchange")
  }

  test("lm_kneser_ney equals a driver-side KN model and never beats MLE on training data") {
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" "))
    val bigrams = toks.flatMap { case (id, ts) =>
      ts.sliding(2).filter(_.length == 2).map(p => (id, p(0), p(1)))
    }
    val c2 = bigrams.groupBy(b => (b._2, b._3)).map { case (k, g) => k -> g.size }
    val c1 = c2.groupBy(_._1._1).map { case (w1, g) => w1 -> g.values.sum }
    val n1fw = c2.groupBy(_._1._1).map { case (w1, g) => w1 -> g.size }
    val cont = c2.groupBy(_._1._2).map { case (w2, g) => w2 -> g.size }
    val bt = c2.size.toDouble
    def r(v: Double, dp: Int) =
      BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_UP)
    def prob(w1: String, w2: String): Double =
      math.max(c2((w1, w2)) - 0.75, 0.0) / c1(w1) +
        0.75 * n1fw(w1) / c1(w1) * (cont(w2) / bt)
    val want = bigrams.groupBy(_._1).map { case (id, g) =>
      val lps = g.map(b => math.log(r(prob(b._2, b._3), 12).toDouble))
      val alp = (lps.map(v => r(v, 15)).foldLeft(BigDecimal(0))(_ + _).toDouble
        / g.size)
      id -> ((g.size.toLong, r(alp, 9).toDouble))
    }
    val got = SparkEntry.queries("lm_kneser_ney")(spark, sf).collect()
      .map(row => row.getLong(0) -> ((row.getLong(1), row.getDouble(2))))
      .toMap
    assert(got == want)
    // MLE maximizes the CORPUS training likelihood (per-document the
    // continuation term can nose ahead by a few 1e-6 — observed on
    // doc 69) — so the claim to pin is bigram-weighted and global
    val mle = SparkEntry.queries("lm_perplexity")(spark, sf).collect()
      .map(row => row.getLong(0) -> row.getDouble(2)).toMap
    val totalKn = got.map { case (id, (n, alp)) => n * alp }.sum
    val totalMle = got.map { case (id, (n, _)) => n * mle(id) }.sum
    assert(totalKn <= totalMle + 1e-6,
      s"corpus KN log-likelihood $totalKn must not beat MLE $totalMle")
    // interpolated KN must leave probability mass for unseen
    // continuations: per context, observed mass stays under 1
    c1.keys.take(50).foreach { w1 =>
      val mass = c2.keys.filter(_._1 == w1).map(k => prob(k._1, k._2)).sum
      assert(mass < 1.0 + 1e-9, s"context $w1 observed mass $mass")
    }
  }

  test("brier_score equals the driver model; no-signal model has near-zero skill") {
    val lang = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val scored = SparkEntry.queries("quality_classifier")(spark, sf)
      .select(col("doc_id"), col("score")).collect()
      .map(r => (r.getDouble(1), if (lang(r.getLong(0)) == "en") 1.0 else 0.0))
    def r9(v: Double) =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r15(v: Double) =
      BigDecimal(v).setScale(15, BigDecimal.RoundingMode.HALF_UP)
    val n = scored.length
    val brier = r9(scored.map { case (s, y) => r15((s - y) * (s - y)) }
      .foldLeft(BigDecimal(0))(_ + _).toDouble / n)
    val base = scored.map(_._2).sum / n
    val ref = r9(base * (1 - base))
    val row = SparkEntry.queries("brier_score")(spark, sf).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == scored.map(_._2).sum.toLong)
    assert(row.getDouble(2) == brier && row.getDouble(3) == ref)
    assert(row.getDouble(4) == r9(1.0 - brier / ref))
    // random labels vs the stand-in model: skill must hover near zero
    // (it can dip slightly negative — worse than climatology)
    assert(math.abs(row.getDouble(4)) < 0.6,
      s"no-signal model must have near-zero Brier skill: ${row.getDouble(4)}")
  }

  test("mixture_epochs reconciles with the temperature weights and the 10x budget") {
    val tw = SparkEntry.queries("source_temperature_weights")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(4)))).toMap
    val total = tw.values.map(_._1).sum
    val got = SparkEntry.queries("mixture_epochs")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == tw.keySet)
    def r9(v: Double) =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (s, (nTok, q, target, epochs)) =>
      assert(nTok == tw(s)._1 && q == tw(s)._2)
      assert(target == math.round(10.0 * total * q), s"source $s target")
      assert(epochs == BigDecimal(target.toDouble / nTok)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // the plan must spend the whole budget (up to per-source rounding)
    val spent = got.values.map(_._3).sum
    assert(math.abs(spent - 10.0 * total) <= got.size,
      s"budget: $spent vs ${10L * total}")
    // temperature flattening: the smallest source is repeated MORE
    // often than the largest (q > p upsampling)
    val smallest = got.minBy(_._2._1)._2._4
    val largest = got.maxBy(_._2._1)._2._4
    assert(smallest >= largest,
      s"temperature must upsample small sources: $smallest vs $largest")
  }

  test("target_encoding is the exact leave-one-out mean") {
    val rows = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.getString(2) == "en") 1L else 0L))
    val bySrc = rows.groupBy(_._2)
      .map { case (s, g) => s -> ((g.length, g.map(_._3).sum)) }
    val got = SparkEntry.queries("target_encoding")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    assert(got.size == rows.length)
    rows.foreach { case (id, src, y) =>
      val (n, s) = bySrc(src)
      val want =
        if (n == 1) None
        else Some(BigDecimal((s - y).toDouble / (n - 1))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(got(id) == ((y, want)), s"doc $id: ${got(id)} != ($y, $want)")
    }
  }

  test("feature_hashing matches the driver hash model and has zero global bias") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.flatMap { case (id, text) =>
      text.split(" ").filter(_.nonEmpty).map { tok =>
        ((id, hash60(tok) % 64),
          if (hash60(s"s1:$tok") % 2 == 0) 1L else -1L)
      }
    }.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
    val got = SparkEntry.queries("feature_hashing")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want)
    // signed hashing cancels in expectation: the corpus-wide mean
    // bucket value must sit near zero relative to total token mass
    val totalAbs = docs.map(_._2.split(" ").count(_.nonEmpty)).map(_.toLong).sum
    val bias = math.abs(got.values.sum.toDouble) / totalAbs
    // the fixture's vocabulary is small (hundreds of distinct tokens),
    // so sign-cancellation variance is ~1/√V, not 1/√N — observed
    // ≈ 0.067; a systematic-sign bug would push this toward 1
    assert(bias < 0.2, s"signed buckets must not skew globally, bias=$bias")
  }
}
