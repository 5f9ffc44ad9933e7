package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Tokenizer

/** r14 family: BPE tokenizer induction + deterministic sketches.
  *
  * The oracle rows prove cross-engine parity; these specs pin the
  * properties parity alone cannot see: the merge kernel's equivalence
  * to the greedy BPE reference walk on ADVERSARIAL symbol streams (the
  * fixture corpus never chains overlapping pairs), the training loop's
  * equivalence to a sequential driver-side BPE trainer, the
  * one-corpus-scan plan shape, and the sketches' estimator guarantees.
  */
class TokenizerSketchesSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  // ---- reference implementations (sequential, obviously-correct) ----

  /** Greedy left-to-right BPE merge as an explicit symbol walk. */
  private def greedyMerge(syms: List[String], a: String, b: String): List[String] = {
    val out = List.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Sequential BPE trainer over a word-frequency table. */
  private def referenceTrain(freq: Map[String, Long], rounds: Int)
      : Seq[(String, String, Long)] = {
    var reprs: Map[String, List[String]] =
      freq.keys.map(w => w -> w.map(_.toString).toList).toMap
    (1 to rounds).map { _ =>
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- reprs; Seq(x, y) <- syms.sliding(2) if syms.length > 1)
        pc((x, y)) = pc.getOrElse((x, y), 0L) + freq(w)
      val maxCnt = pc.values.max
      val (a, b) = pc.collect { case (p, c) if c == maxCnt => p }.toSeq.min
      reprs = reprs.map { case (w, syms) => w -> greedyMerge(syms, a, b) }
      (a, b, maxCnt)
    }
  }

  // ---------------------------------------------------------- kernel

  test("mergeApply (double-space sentinel) == greedy BPE walk on adversarial streams") {
    // overlap-chaining symbol soup: every hazard the space-sentinel
    // trick must survive ('a a a', 'a b a b', pre-merged 'ab' symbols
    // adjacent to their own constituents, single-symbol words)
    val rnd = new scala.util.Random(14)
    val alphabet = Vector("a", "b", "ab", "c", "ba")
    val cases = Seq.tabulate(400) { _ =>
      List.fill(1 + rnd.nextInt(11))(alphabet(rnd.nextInt(alphabet.length)))
    }
    val pairs = Seq(("a", "b"), ("a", "a"), ("b", "a"), ("ab", "a"), ("c", "c"))
    import spark.implicits._
    val df = cases.map(_.mkString(" ")).toDF("repr")
    for ((a, b) <- pairs) {
      val got = df.select(Tokenizer.mergeApply(
        col("repr"), lit(a), lit(b), lit(a + b)).as("m"))
        .as[String].collect()
      val want = cases.map(c => greedyMerge(c, a, b).mkString(" "))
      assert(got.toSeq == want,
        s"pair ($a,$b): kernel diverged from the greedy walk")
    }
  }

  // --------------------------------------------------------- training

  test("bpe_train == sequential driver-side BPE trainer") {
    val freq = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referenceTrain(freq, 3)
    val got = SparkEntry.queries("bpe_train")(spark, sf)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(got.toSeq == want)
  }

  test("bpe_encode: symbol counts bracket correctly and compression is consistent") {
    val rows = SparkEntry.queries("bpe_encode")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, nc, nb, comp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nb <= nc, "a merge can only shrink the symbol count")
      assert(nb >= nw, "a word never encodes below one symbol")
      assert(math.abs(comp - nc.toDouble / nb) < 1e-6 + 1e-9)
    }
  }

  test("bpe_train plan: ONE corpus scan, reused exchanges, no window/cartesian") {
    val df = SparkEntry.queries("bpe_train")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    def count(needle: String) = p.sliding(needle.length).count(_ == needle)
    assert(count("Scan parquet") == 1,
      "the corpus must be scanned exactly once — every round reuses the " +
        "words exchange:\n" + p.take(2000))
    assert(count("ReusedExchange") >= 1, p.take(2000))
    assert(count("WindowExec") == 0 && count("CartesianProduct") == 0,
      "argmax must be TakeOrderedAndProject; the 1-row winner broadcasts")
    assert(count("TakeOrderedAndProject") >= 3, p.take(2000))
  }

  // --------------------------------------------------------- sketches

  /** Driver-side hash60 (same md5 15-hex-digit prefix as CrossHash). */
  private def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  test("kmv_distinct: exact branch exact, estimator in band, merge == direct sketch") {
    val rows = SparkEntry.queries("kmv_distinct")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val (uSize, uExact, uEst) = rows("__union")
    // per-source groups hold 25 < k=64 distinct texts at this SF: the
    // sketch IS the distinct set and the estimate must be exact
    rows.filterKeys(_ != "__union").foreach { case (src, (size, exact, est)) =>
      assert(size == exact && est == exact.toDouble,
        s"$src: under-k sketch must report the exact count")
    }
    // the union overflows k: bottom-k estimator, CV ≈ 1/√(k−2) ≈ 13%
    assert(uSize == 64 && math.abs(uEst - uExact) / uExact < 0.25,
      s"union estimate $uEst vs exact $uExact out of band")
    // mergeability: folding the 20 per-source sketches must equal the
    // sketch of the whole corpus — k-th smallest hash computed
    // driver-side from the raw texts
    val allH = Tables.documents(spark, sf).select(col("text")).collect()
      .map(r => hash60(r.getString(0))).distinct.sorted
    val kth = allH(63)
    val directEst = BigDecimal(63.0 * 1152921504606846976L / kth)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(uEst == directEst,
      "merged per-source sketches must equal the direct corpus sketch")
  }

  test("cms_counts: never undercounts, overcount within the epsilon bound") {
    val rows = SparkEntry.queries("cms_counts")(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalN = rows.map(_.getLong(1)).sum // every distinct token probed
    rows.foreach { r =>
      val (exact, est, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= exact, s"${r.getString(0)}: CMS can never undercount")
      assert(over == est - exact)
      assert(over <= 2 * totalN / 512,
        s"${r.getString(0)}: overcount $over beyond the 2N/w bound")
    }
  }
}
