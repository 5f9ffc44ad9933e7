package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r14 curation additions: fuzzy decontamination, the quality
  * classifier pair, and per-domain boilerplate removal. Oracle rows
  * pin cross-engine parity on the fixture; these specs pin semantics
  * the fixture can't force — a PLANTED near-duplicate straddling the
  * split must be caught, the trainer must descend, and the
  * boilerplate gate must keep exactly the content lines in order.
  */
class CurationClassifierSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Driver-side CrossHash.hash60 (md5 15-hex prefix). */
  private def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }
  private def splitBucket(id: Long): Long = hash60(id.toString) % 10

  /** Driver-side MinHash signature (Dedup's kernel semantics: distinct
    * word-3-grams, md5 15-hex halves, h_i = h1 + i·h2 mod 2^60).
    */
  private def minhashSig(text: String): Seq[Long] = {
    val toks = text.split(" ")
    val shingles = toks.sliding(3).filter(_.length == 3)
      .map(_.mkString(" ")).toSet
    val hs = shingles.toSeq.map { s =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.take(15), 16),
        java.lang.Long.parseLong(hex.slice(15, 30), 16))
    }
    (0 until 8).map(i =>
      hs.map { case (h1, h2) => (h1 + i * h2) % 1152921504606846976L }.min)
  }

  test("decontaminate_fuzzy catches a planted near-duplicate across the split") {
    // find ids landing in the test (bucket 9) and train (< 8) splits
    val testId = (0L to 200L).find(splitBucket(_) == 9).get
    val trainId = (0L to 200L).find(splitBucket(_) < 8).get
    val otherTest = (testId + 1 to 400L).find(splitBucket(_) == 9).get
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    // a single-token edit only GUARANTEES an LSH candidate if one band
    // of 4 minhashes survives the edit (else banding is probabilistic —
    // the whole point of the sketch). Search for such an edit with the
    // same signature arithmetic the engine uses; one must exist because
    // an edit at position p only touches shingles overlapping p.
    val baseSig = minhashSig(base)
    def bandSurvives(edited: String): Boolean = {
      val s = minhashSig(edited)
      s.slice(0, 4) == baseSig.slice(0, 4) || s.slice(4, 8) == baseSig.slice(4, 8)
    }
    val toks = base.split(" ")
    val nearDup = toks.indices.iterator
      .map(i => toks.updated(i, "EDITED").mkString(" "))
      .find(bandSurvives)
      .getOrElse(fail("no band-preserving single-token edit found"))
    val unrelated = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen"
    val distractor = "red orange yellow green blue indigo violet cyan " +
      "magenta white black brown pink grey gold silver"
    import spark.implicits._
    val docs = Seq(
      (testId, nearDup, "en", "s0", nearDup.length.toLong),
      (trainId, base, "en", "s0", base.length.toLong),
      (otherTest, unrelated, "en", "s0", unrelated.length.toLong),
      ((0L to 400L).find(splitBucket(_) < 8).filter(_ != trainId)
        .getOrElse(trainId + 100), distractor, "en", "s0",
        distractor.length.toLong),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzzy").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("decontaminate_fuzzy")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getBoolean(4)))).toMap
    assert(got.contains(testId),
      "the planted near-duplicate test doc must surface as a candidate")
    assert(got(testId)._1 >= 0.5 && got(testId)._2,
      s"one-token edit must score contaminated, got ${got(testId)}")
    assert(!got.contains(otherTest),
      "an unrelated test doc must not collide with any train band")
  }

  test("decontaminate_fuzzy plan: shuffle join on bands, no broadcast of a corpus side") {
    val df = SparkEntry.queries("decontaminate_fuzzy")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("ShuffledHashJoin"),
      "band join must stay a shuffle join (both sides corpus-derived):\n"
        + p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("quality_classifier: scores match a driver-side model, keep is the threshold") {
    val rows = SparkEntry.queries("quality_classifier")(spark, sf).collect()
    assert(rows.nonEmpty)
    val raw = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val stop = Set("the", "a", "of", "and")
    rows.foreach { r =>
      val (id, score, keep) = (r.getLong(0), r.getDouble(1), r.getBoolean(2))
      val (text, nChars) = raw(id)
      val toks = text.split(" ")
      val z = -1.0 + 2.4 * (nChars.toDouble / 1000) +
        0.8 * (toks.length.toDouble / 100) +
        6.0 * (toks.count(stop) .toDouble / toks.length) -
        1.5 * (toks.distinct.length.toDouble / toks.length)
      val want = BigDecimal(1.0 / (1.0 + math.exp(
        -BigDecimal(z).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(score == want, s"doc $id: $score != $want")
      assert(keep == (score > 0.5))
    }
  }

  test("logreg_train: loss strictly descends and round 1 matches the closed form") {
    val rows = SparkEntry.queries("logreg_train")(spark, sf)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3))
    val losses = rows.map(_._4)
    assert(losses(0) > losses(1) && losses(1) > losses(2),
      s"log-loss must descend: ${losses.toSeq}")
    // round 1 starts at w = b = 0 ⇒ σ = 0.5 exactly ⇒ closed-form grads
    val feats = Tables.documents(spark, sf)
      .select((col("n_chars").cast("double") / 1000).as("x"),
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    def r15(v: Double) =
      BigDecimal(v).setScale(15, BigDecimal.RoundingMode.HALF_UP)
    val n = feats.length
    val wantW = -(feats.map { case (x, y) => r15((0.5 - y) * x) }.sum
      .toDouble / n)
    val wantB = -(feats.map { case (_, y) => r15(0.5 - y) }.sum.toDouble / n)
    def r12(v: Double) =
      BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows(0)._2 == r12(wantW) && rows(0)._3 == r12(wantB),
      s"round-1 gradient mismatch: ${(rows(0)._2, rows(0)._3)} vs " +
        s"${(r12(wantW), r12(wantB))}")
  }

  test("logreg_train survives sigmoid saturation: clamp keeps every loss finite") {
    // n_chars = 1e8 → x = 1e5 → after round 1 the argument w·x+b is
    // deep in saturation; without the [1e-9, 1−1e-9] clamp the y=0
    // rows' log(1−σ) would be log(0) (NULL on Spark, -inf in DuckDB)
    import spark.implicits._
    val docs = (0L to 19L).map { id =>
      val huge = id < 10
      (id, "a b c", if (huge) "en" else "xx", "s0",
        if (huge) 100000000L else 10L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-sat").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("logreg_train")(spark, dir)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 3)
    rows.foreach { case (round, w, b, loss) =>
      assert(!loss.isNaN && !loss.isInfinite && loss > 0,
        s"round $round loss must be finite and positive, got $loss")
      assert(!w.isNaN && !b.isNaN, s"round $round weights must stay finite")
    }
    // with the en-labeled rows at x = 1e5 the model saturates: the
    // clamped per-row loss floor is -ln(1-1e-9) ≈ 1e-9, so rounds
    // 2-3 must report a loss that the clamp kept bounded
    assert(rows.forall(_._4 < 50), "clamp must bound the saturated loss")
  }

  test("preference_pairs: chosen/rejected are each source's true extremes, heap-built") {
    val scored = SparkEntry.queries("quality_classifier")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val src = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2) }
    val df = SparkEntry.queries("preference_pairs")(spark, sf)
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    src.foreach { case (s, ids) =>
      val bySc = ids.sortBy(id => (-scored(id), id))
      val top3 = bySc.take(3).toSet
      val bot3 = ids.sortBy(id => (scored(id), id)).take(3).toSet
      val mine = got.filter(_._1 == s)
      assert(mine.map(_._2).toSet == top3, s"source $s chosen set")
      assert(mine.map(_._3).toSet == bot3, s"source $s rejected set")
      mine.foreach { case (_, c, r, m) =>
        assert(m > 0 && math.abs(m - (scored(c) - scored(r))) < 1e-9)
      }
    }
    // heap aggregate, not a ranking window: no sort of the corpus
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("Window"), "extremes must come from the bounded heap")
  }

  test("boilerplate_lines: template lines out, content lines kept in order") {
    val raw = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = SparkEntry.queries("boilerplate_lines")(spark, sf).collect()
    assert(rows.length == raw.size)
    rows.foreach { r =>
      val (id, nLines, nBoiler, clean) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      assert(nLines == 4 && nBoiler == 2,
        s"doc $id: header+copyright are template, text+promo are not")
      val promo = s"Promo of the week no ${(id / 20) % 4}"
      assert(clean == raw(id) + "\n" + promo,
        s"doc $id: content must survive in original line order")
    }
  }
}
