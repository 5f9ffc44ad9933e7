package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Engine invariants on sf0.001 (fast smoke; exact-value parity runs
  * through the DuckDB oracle harness — tools/check_parity.py).
  */
class EngineSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }
  private val sf = "/root/testdata/sf0.001"

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and every oracle key exists") {
    val qs = SparkEntry.queries
    val oracle = SparkEntry.oracleSql
    assert(oracle.keySet.subsetOf(qs.keySet))
    // names are unique
    assert(SparkEntry.allOps.map(_.name).distinct.size == SparkEntry.allOps.size)
  }

  test("scaled sizes sum exactly to the target (reference invariant)") {
    val total = Scaling.scaledSizesExact(spark, sf)
      .agg(sum(col("scaled_size"))).head().getLong(0)
    assert(total == Scaling.Target)
  }

  test("weighted sampling is seeded-reproducible and sums to n") {
    val w = Seq("a" -> 1.0, "b" -> 3.0, "c" -> 6.0)
    val s1 = Scaling.weightedSample(w, 1000, seed = 3696L)
    val s2 = Scaling.weightedSample(w, 1000, seed = 3696L)
    assert(s1 == s2)
    assert(s1.values.sum == 1000L)
    assert(s1("c") > s1("a"))
  }

  test("interaction pairs are symmetric and irreflexive") {
    val pairs = Interactions.interactionPairs(spark, sf).cache()
    val n = pairs.count()
    assert(n > 0)
    assert(pairs.where(col("a_caid") === col("b_caid")).count() == 0)
    val sym = pairs.select(col("b_caid").as("a_caid"), col("a_caid").as("b_caid"))
    assert(pairs.unionByName(sym).distinct().count() == n)
  }

  test("total_vs_observed: observed <= total, probs in [0,1]") {
    val m = Interactions.totalVsObserved(spark, sf).cache()
    assert(m.where(col("observed_contacts") > col("total_contacts")).count() == 0)
    assert(m.where(col("prob") < 0 || col("prob") > 1).count() == 0)
  }

  test("fixpoint imputation only adds homes and converges") {
    val base = Ntl.ntlWinner(spark, sf).count()
    val fixed = Imputation.imputeFixpoint(spark, sf).count()
    assert(fixed >= base)
  }

  test("hex expressions work through SQL and Column APIs") {
    import graft.functions.GraftFunctions._
    val df = spark.range(3).select(
      hex_index(lit(19.4326), lit(-99.1332), lit(15)).as("cell"))
    val cells = df.collect().map(_.getString(0)).distinct
    assert(cells.length == 1 && cells.head.length == 15)
    val viaSql = spark.sql(
      "SELECT hex_index(19.4326D, -99.1332D, 15) AS c").head().getString(0)
    assert(viaSql == cells.head)
    val k = spark.sql("SELECT size(hex_kring(hex_index(0.5D, 0.5D, 9), 2)) AS n")
      .head().getInt(0)
    assert(k == 19)
  }

  test("k-ring spatial imputer covers points the direct containment missed") {
    val direct = Spatial.pointInPolygon(spark, sf).cache()
    val missed = direct.where(col("cve_geo") === "0000000000000").count()
    val imputed = Spatial.imputeByKRing(spark, sf).cache()
    // every point ends up with a polygon: direct hits at k=0, misses
    // recovered by ring expansion (tiles cover the space densely)
    assert(imputed.count() == direct.count())
    assert(imputed.where(col("poly_id").isNull).count() == 0)
    if (missed > 0)
      assert(imputed.where(col("k") > 0).count() == missed)
  }

  test("multimodal typed decode batch: histogram mass equals byte count") {
    val feats = Multimodal.decodeBatch(spark, sf).cache()
    assert(feats.count() > 0)
    val bad = feats.filter(f => f.feature.sum.toInt != f.n_bytes).count()
    assert(bad == 0, "per-byte histogram mass must equal payload length")
    // deterministic: same input -> same checksum
    val a = feats.filter(_.media_id == 0L).head().checksum
    val b = Multimodal.decodeBatch(spark, sf).filter(_.media_id == 0L).head().checksum
    assert(a == b)
  }

  test("st_contains ray casting handles a concave polygon") {
    // L-shaped polygon: (0,0)-(4,0)-(4,2)-(2,2)-(2,4)-(0,4)
    val geo = """{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,2],[2,2],[2,4],[0,4],[0,0]]]}"""
    val df = spark.sql(
      s"""SELECT st_contains(from_json('$geo', 'STRUCT<coordinates: ARRAY<ARRAY<ARRAY<DOUBLE>>>>').coordinates,
         |  x, y) AS hit
         |FROM VALUES (1.0D, 1.0D), (3.0D, 1.0D), (3.0D, 3.0D), (1.0D, 3.0D), (5.0D, 1.0D)
         |  AS t(x, y)""".stripMargin)
      .collect().map(_.getBoolean(0)).toSeq
    assert(df == Seq(true, true, false, true, false))
  }
}
