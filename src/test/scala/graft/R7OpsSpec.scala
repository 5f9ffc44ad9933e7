package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Curation, Dedup, Layout, TextAnalysis}

/** Round-7 additions: exact duplicated-substring spans, n-gram novelty,
  * text normalization, Hilbert layout keys. The oracle harness pins
  * cross-engine hashes; these pin SEMANTICS on constructed corpora
  * where the right answers are known in closed form, plus an
  * independent reference walk for the Hilbert curve.
  */
class R7OpsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Writes a documents.parquet fixture; returns its table dir. */
  private def fixtureDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r7docs").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("substring_dup_spans: a shared 10-token substring yields one merged span per doc") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val dir = fixtureDir(Seq(
      (1L, s"u1 u2 $shared u3", "en", "s"),   // shared at token offset 2
      (2L, s"$shared u4 u5", "en", "s"),      // shared at token offset 0
      (3L, "v1 v2 v3 v4 v5 v6 v7 v8 v9", "en", "s"))) // all-unique: no dup
    val got = Dedup.substringDupSpans(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    // 3 dup windows (8-grams fully inside the shared region) merge to one span
    assert(got.toSeq == Seq(
      (1L, 2L, 11L, 10L, 3L),
      (2L, 0L, 9L, 10L, 3L)))
  }

  test("substring_dup_spans: a doc-internal repeat splits into two spans (gap > k)") {
    val rep = (1 to 8).map(i => s"r$i").mkString(" ")
    val dir = fixtureDir(Seq(
      (1L, s"$rep z1 z2 z3 $rep", "en", "s"))) // repeat at offsets 0 and 11
    val got = Dedup.substringDupSpans(spark, dir)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(4)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((0L, 7L, 1L), (11L, 18L, 1L)))
  }

  test("ngram_novelty: owner-by-min-doc-id semantics in closed form") {
    val dir = fixtureDir(Seq(
      (1L, "a b c d e", "en", "s"), // 2 grams, owns both -> 1.0
      (2L, "a b c d x", "en", "s"), // 'a b c d' owned by doc 1 -> 0.5
      (3L, "a b c d e", "en", "s"), // identical to doc 1 -> 0.0
      (4L, "q r", "en", "s")))      // < 4 tokens: no grams, drops out
    val got = TextAnalysis.ngramNovelty(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(1L) == ((2L, 2L, 1.0)))
    assert(got(2L) == ((2L, 1L, 0.5)))
    assert(got(3L) == ((2L, 0L, 0.0)))
    assert(!got.contains(4L))
  }

  test("text_normalize: lowercase, punct->space, collapsed runs, trimmed, md5-keyed") {
    val dir = fixtureDir(Seq(
      (1L, "  Hello, World!!  ", "en", "s"),
      (2L, "a   b", "en", "s"),
      (3L, "hello world", "en", "s"))) // already canonical: same hash as 1
    val rows = Curation.textNormalize(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getString(1) == "hello world")
    assert(rows(1L).getLong(3) == 11L)
    assert(rows(2L).getString(1) == "a b")
    // normalized variants of the same content share the dedup key
    assert(rows(1L).getString(2) == rows(3L).getString(2))
    // invariant: output never has doubled spaces or edge whitespace
    val bad = Curation.textNormalize(spark, "/root/testdata/sf0.001")
      .where(col("norm_text").rlike("  ")
        || col("norm_text").rlike("^ ")
        || col("norm_text").rlike(" $")
        || col("norm_text").rlike("[^a-z0-9 ]"))
      .count()
    assert(bad == 0L)
  }

  test("spearman_corr: +1 / -1 / tied-rank closed forms") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r7li").toString
    Seq(
      ("A", 1.0, 10.0), ("A", 2.0, 20.0), ("A", 3.0, 30.0), ("A", 4.0, 40.0),
      ("B", 1.0, 40.0), ("B", 2.0, 30.0), ("B", 3.0, 20.0), ("B", 4.0, 10.0),
      ("C", 1.0, 1.0), ("C", 1.0, 2.0), ("C", 2.0, 3.0), ("C", 2.0, 4.0))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.operators.Analytics.spearmanCorr(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("A") == 1.0)
    assert(got("B") == -1.0)
    // tied x-ranks (1.5,1.5,3.5,3.5) vs (1,2,3,4): rho = 2/sqrt(5)
    assert(math.abs(got("C") - 2.0 / math.sqrt(5.0)) < 1e-9)
  }

  test("ks_test: hand-computed D and argmax on a 4-doc fixture") {
    // src0 lengths {1,2}, src1 lengths {2,3}: support (1,2,3) gives
    // |c0*n1 - c1*n0| = (2,2,0) -> D = 2/(2*2) = 0.5, first at v=1
    val dir = fixtureDir(Seq(
      (1L, "a", "en", "src0"), (2L, "ab", "en", "src0"),
      (3L, "xy", "en", "src1"), (4L, "xyz", "en", "src1"),
      (5L, "ignored middle", "en", "src2")))
    val r = graft.operators.Analytics.ksTest(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 2L && r(0).getLong(1) == 2L)
    assert(r(0).getDouble(2) == 0.5)
    assert(r(0).getLong(3) == 1L)
  }

  test("heavy_hitters: Misra-Gries bounds hold in the sub-capacity approximate regime") {
    import spark.implicits._
    // N = 100 tokens, capacity 4: error bound N/(cap+1) = 20, so both
    // items with true count > 20 are guaranteed to survive, and every
    // estimate e satisfies true - 20 <= e <= true
    val toks = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++
      (1 to 20).map(i => s"one$i")
    val got = toks.toDF("token")
      .agg(call_function("heavy_hitters", col("token"), lit(4)).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.token"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size <= 4, s"capacity bound violated: $got")
    assert(got.contains("a") && got("a") <= 50 && got("a") >= 30, got.toString)
    assert(got.contains("b") && got("b") <= 30 && got("b") >= 10, got.toString)
    // exact regime: capacity above distinct count -> exact counts
    val exact = toks.toDF("token")
      .agg(call_function("heavy_hitters", col("token"), lit(100)).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.token"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact("a") == 50 && exact("b") == 30 && exact.size == 22)
  }

  /** Writes an events.parquet fixture; returns its table dir. */
  private def eventsFixture(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r7ev").toString
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("ts_s"))).drop("ts_s")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("interval_overlap: hand-computed pair counts across bucket boundaries") {
    // intervals (s, s+value): A[0,100) B[50,150) C[200,300) D[120,220)
    // overlaps: A-B 50s, B-D 30s, C-D 20s; B and D each cross the
    // 128 s bucket boundary, so the owner-bucket rule is exercised
    val dir = eventsFixture(Seq(
      (1L, 0L, 1L, "x", 100.0), (2L, 50L, 1L, "x", 100.0),
      (3L, 200L, 1L, "x", 100.0), (4L, 120L, 1L, "x", 100.0)))
    val got = graft.operators.Temporal.intervalOverlap(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((1L, 50000000L)))
    assert(got(2L) == ((2L, 80000000L)))
    assert(got(3L) == ((1L, 20000000L)))
    assert(got(4L) == ((2L, 50000000L)))
  }

  test("time_weighted_avg: closed-form hold-weighted mean; last reading drops") {
    val dir = eventsFixture(Seq(
      (1L, 0L, 7L, "x", 10.0), (2L, 10L, 7L, "x", 20.0),
      (3L, 30L, 7L, "x", 99.0)))
    val r = graft.operators.Temporal.timeWeightedAvg(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getLong(2) == 2L)           // n_holds (99.0 never holds)
    assert(r(0).getLong(3) == 30000000L)    // dur_us
    assert(r(0).getDouble(4) == 16.666666667) // (10*10 + 20*20)/30 @ 1e-9
  }

  test("user_growth: new/active/cumulative in closed form") {
    // u1 on d1,d2; u2 on d2: active (1,2), new (1,1), total (1,2)
    val dir = eventsFixture(Seq(
      (1L, 0L, 1L, "x", 1.0), (2L, 86400L, 1L, "x", 1.0),
      (3L, 86400L, 2L, "x", 1.0)))
    val got = graft.operators.Behavior.userGrowth(spark, dir)
      .orderBy(col("day")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 1L, 1L), (2L, 1L, 2L)))
  }

  test("pareto_contribution: shares sum to 1 and classes split on the running share") {
    val df = graft.operators.Behavior.paretoContribution(spark, "/root/testdata/sf0.001")
    val rows = df.orderBy(col("cum_share")).collect()
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-6)
    assert(rows.last.getDouble(3) == 1.0, "cumulative share must end at 1")
    // class boundaries: every A precedes every B precedes every C in
    // cum_share order, and all three classes exist on real data
    val classes = rows.map(_.getString(4)).toSeq
    assert(classes.toSet == Set("A", "B", "C"))
    assert(classes.mkString == classes.sorted.mkString,
      "A/B/C must be contiguous in ranked order")
  }

  /** Independent reference walk of the public xy2d Hilbert algorithm. */
  private def hilbertRef(x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 32768L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("hilbert_key: matches an independent reference walk and is injective on the grid") {
    val df = Layout.hilbertKey(spark, "/root/testdata/sf0.001")
    val sample = df.select(col("gx"), col("gy"), col("hkey")).limit(500).collect()
    assert(sample.nonEmpty)
    sample.foreach { r =>
      val (gx, gy, hk) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(hk == hilbertRef(gx, gy), s"hkey mismatch at ($gx,$gy)")
    }
    val nCells = df.select(col("gx"), col("gy")).distinct().count()
    val nKeys = df.select(col("hkey")).distinct().count()
    assert(nCells == nKeys, "distinct grid cells must map to distinct keys")
    // locality: the four curve-adjacent corner cases of the 2x2 base grid
    assert(hilbertRef(0, 0) == 0L)
    assert(hilbertRef(65535, 0) == (1L << 32) - 1, "curve must end at (65535,0)")
  }

  test("hilbert_d expression (r10): full-grid sweep vs reference, null-safe, exhaustive small grid") {
    import spark.implicits._
    // the r10 fused expression must walk every quadrant transition the
    // 16 unrolled projections walked: dense 256x256 corner sweep +
    // the extreme corners of the full 16-bit grid
    val corners = Seq(0L, 1L, 255L, 256L, 32767L, 32768L, 65534L, 65535L)
    val pts = (for (x <- 0L until 256L; y <- 0L until 256L) yield (x, y)) ++
      (for (x <- corners; y <- corners) yield (x, y))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        call_function("hilbert_d", col("x"), col("y")).as("d"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == hilbertRef(r.getLong(0), r.getLong(1)),
        s"hilbert_d mismatch at (${r.getLong(0)},${r.getLong(1)})")
    }
    // BinaryExpression default null-intolerance: null in => null out
    val n = spark.sql(
      "SELECT hilbert_d(CAST(NULL AS BIGINT), CAST(3 AS BIGINT))").collect()(0)
    assert(n.isNullAt(0), "null input must yield null, not a garbage key")
  }
}
