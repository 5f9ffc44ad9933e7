package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Curation, TextAnalysis}

/** Round-5 text/curation additions: BM25 ranking, token entropy, PMI
  * collocations, percentile length trimming. The oracle harness pins
  * cross-engine hashes; these pin the SEMANTICS on a constructed
  * corpus where the right answers are known in closed form.
  */
class R5OpsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Writes a documents.parquet fixture; returns its table dir. */
  private def fixtureDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r5docs").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("token_entropy: closed-form values on degenerate and uniform docs") {
    val dir = fixtureDir(Seq(
      (1L, "a a a a", "en", "s"),            // all same token -> H = 0
      (2L, "w x y z", "en", "s"),            // uniform over 4 -> H = ln 4
      (3L, "b b c c", "en", "s")))           // uniform over 2 -> H = ln 2
    val got = TextAnalysis.tokenEntropy(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(math.abs(got(1L)) < 1e-9)
    assert(math.abs(got(2L) - math.log(4)) < 1e-6)
    assert(math.abs(got(3L) - math.log(2)) < 1e-6)
  }

  test("bm25_rank: only matching docs rank; rarer terms outscore common ones") {
    // "hash" appears in 1 of 4 docs, "join" in 3 -> idf(hash) > idf(join);
    // doc 4 has no query terms and must be absent.
    val dir = fixtureDir(Seq(
      (1L, "hash table lookup", "en", "s"),
      (2L, "join order join plan join", "en", "s"),
      (3L, "join scan", "en", "s"),
      (4L, "nothing relevant here", "en", "s")))
    val rows = TextAnalysis.bm25Rank(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!rows.contains(4L))
    assert(rows.keySet == Set(1L, 2L, 3L))
    assert(rows.values.forall(_._2 > 0.0))
    // doc 3 matches two terms -> n_hits 2
    assert(rows(3L)._1 == 2L)
  }

  test("pmi_bigrams: an always-adjacent pair beats an independent pair") {
    // "p q" always adjacent (8 times); filler tokens vary. c2 >= 5 gate
    // drops every filler bigram (each occurs once).
    val text = (1 to 8).map(i => s"p q f$i").mkString(" ")
    val dir = fixtureDir(Seq((1L, text, "en", "s")))
    val rows = TextAnalysis.pmiBigrams(spark, dir).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet == Set(("p", "q")))
    val pmi = rows.head.getAs[Double]("pmi")
    assert(pmi > 0.0, s"always-adjacent pair should have positive PMI, got $pmi")
  }

  test("h3_polyfill: every center inside its polygon; interior cells covered") {
    import graft.functions.H3Core
    val rows = graft.operators.Spatial.h3Polyfill(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length > 1000, s"16 tiles x ~200 res-4 cells expected, got ${rows.length}")
    // exactness: the returned center must sit inside the named tile
    rows.foreach { r =>
      val Array(_, i, j) = r.getString(0).split("_")
      val x0 = 5.0 * i.toInt + 0.005
      val y0 = 5.0 * j.toInt + 0.005
      val (cLat, cLon) = (r.getDouble(2), r.getDouble(3))
      assert(cLon >= x0 && cLon <= x0 + 5.0 && cLat >= y0 && cLat <= y0 + 5.0,
        s"center ($cLat,$cLon) outside ${r.getString(0)}")
    }
    // coverage: any random interior point whose res-4 cell center is
    // in-tile must appear in that tile's fill set
    val byTile = rows.groupBy(_.getString(0))
      .map { case (k, v) => k -> v.map(_.getString(1)).toSet }
    val rng = new scala.util.Random(7)
    var checked = 0
    for (_ <- 0 until 300) {
      val ti = rng.nextInt(4); val tj = rng.nextInt(4)
      val x0 = 5.0 * ti + 0.005; val y0 = 5.0 * tj + 0.005
      val lon = x0 + rng.nextDouble() * 5.0
      val lat = y0 + rng.nextDouble() * 5.0
      val cell = H3Core.latLngToCell(lat, lon, 4)
      val (cLa, cLo) = H3Core.cellToLatLng(cell)
      if (cLo >= x0 && cLo <= x0 + 5.0 && cLa >= y0 && cLa <= y0 + 5.0) {
        assert(byTile(s"P_${ti}_${tj}").contains(H3Core.h3ToString(cell)),
          s"cell ${H3Core.h3ToString(cell)} with in-tile center missing from P_${ti}_$tj")
        checked += 1
      }
    }
    assert(checked > 150, s"coverage probe too weak: $checked")
  }

  test("h3_compact: uncompacting the compact covering recovers the res-5 fill exactly") {
    import graft.functions.GraftFunctions.h3_children
    val dir = "/root/testdata/sf0.001"
    val fill = graft.operators.Spatial.h3Polyfill(spark, dir, res = 5)
      .select(col("poly_id"), col("cell"))
    val compact = graft.operators.Spatial.h3Compact(spark, dir)
    val nFill = fill.count()
    val nCompact = compact.count()
    assert(nCompact < nFill / 2,
      s"compaction should fold the interior: $nCompact vs $nFill")
    assert(compact.where(col("res") < 5).count() > 0, "mixed resolutions expected")
    // identity: expanding every compact cell back to res 5 gives the fill
    val un = compact
      .select(col("poly_id"), explode(h3_children(col("cell"), lit(5))).as("cell"))
    assert(un.count() == nFill, "uncompact must not add or drop cells")
    assert(un.exceptAll(fill).isEmpty && fill.exceptAll(un).isEmpty,
      "uncompact(compact(S)) must equal S")
    // minimality: no parent may still have a complete sibling set
    import graft.functions.GraftFunctions.{h3_parent, h3_resolution}
    val residual = compact
      .withColumn("p", h3_parent(col("cell"), h3_resolution(col("cell")) - 1))
    // (grouping by (poly, parent, res) — complete sets only fold within a level)
    val full = residual.groupBy(col("poly_id"), col("p"), col("res"))
      .agg(count(lit(1)).as("n")).where(col("n") >= 7)
    assert(full.isEmpty, "a complete sibling set survived compaction")
  }

  test("h3_boundary: WKT rings close and carry 6 (or 5) vertices") {
    val rows = graft.operators.Spatial.h3Boundary(spark, "/root/testdata/sf0.001")
      .limit(500).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val wkt = r.getString(1)
      assert(wkt.startsWith("POLYGON((") && wkt.endsWith("))"))
      val pts = wkt.stripPrefix("POLYGON((").stripSuffix("))").split(", ")
      val want = if (r.getBoolean(2)) 6 else 7 // ring closes on first vertex
      assert(pts.length == want, s"${r.getString(0)}: ${pts.length} points, want $want")
      assert(pts.head == pts.last, "ring must close")
    }
  }

  test("length_trim: per-lang p5/p95 band drops both extremes") {
    // en: lengths 1..20 (distinct powers via repeated 'x'); the 1-char
    // and 20-char docs sit outside the [p5, p95] band. de: uniform
    // lengths -> degenerate band keeps everything.
    val en = (1 to 20).map(i => (i.toLong, "x" * i, "en", "s"))
    val de = (21 to 24).map(i => (i.toLong, "yyyy", "de", "s"))
    val dir = fixtureDir(en ++ de)
    val kept = Curation.lengthTrim(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(!kept.contains(1L) && !kept.contains(20L),
      s"extreme en lengths must trim, kept=$kept")
    assert((21 to 24).forall(i => kept.contains(i.toLong)),
      "degenerate de band must keep all docs")
    assert((3 to 18).forall(i => kept.contains(i.toLong)),
      "interior en lengths must survive")
  }
}
