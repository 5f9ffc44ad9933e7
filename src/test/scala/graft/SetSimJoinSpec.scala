package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** set_sim_join: prefix-filtered EXACT τ-Jaccard token-set join.
  * The whole point of the operator is the zero-false-negative
  * guarantee of the prefix-filtering principle, so the load-bearing
  * test is brute-force equality on a real corpus slice; the hand
  * fixture pins the integer-exact τ = 3/5 boundary.
  */
class SetSimJoinSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_ssj_").toString
    // 3-word shingle sets: "a b c d e f" → {abc,bcd,cde,def} (4);
    // doc 2 shares 3 of those (∩=3, ∪=5 → J = 3/5 exactly);
    // doc 3 shares only {abc} (1/7); doc 5 is a 3-shingle subset of
    // both 1 and 2 (∩=3, ∪=4 → 3/4).
    Seq(
      (1L, "a b c d e f", "en", "web"),
      (2L, "a b c d e g", "en", "web"),
      (3L, "a b c x y z", "en", "web"),
      (5L, "a b c d e", "en", "web"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("τ = 3/5 boundary is INCLUSIVE and integer-exact") {
    val rows = operators.Dedup.setSimJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(rows.keySet == Set((1L, 2L), (1L, 5L), (2L, 5L)), rows.toString)
    assert(rows((1L, 2L)) == (3L, 0.6)) // exactly at τ — kept
    assert(rows((1L, 5L)) == (3L, 0.75))
    assert(rows((2L, 5L)) == (3L, 0.75))
  }

  test("prefix filter loses nothing: equals brute force on a real corpus slice") {
    import graft.functions.GraftFunctions.shingle_hash_set
    val sf = "/root/testdata/sf0.001"
    val tok = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(shingle_hash_set(col("text"))).as("token"))
    val sizes = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val brute = tok.alias("a")
      .join(tok.alias("b"),
        col("a.token") === col("b.token") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
      .join(sizes.select(col("doc_id"), col("sz").as("sz_a")),
        col("doc_a") === col("doc_id")).drop("doc_id")
      .join(sizes.select(col("doc_id"), col("sz").as("sz_b")),
        col("doc_b") === col("doc_id")).drop("doc_id")
      .where(lit(5) * col("n_inter")
        >= lit(3) * (col("sz_a") + col("sz_b") - col("n_inter")))
      .select(col("doc_a"), col("doc_b"), col("n_inter"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pruned = operators.Dedup.setSimJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pruned == brute,
      s"missing=${(brute -- pruned).take(5)} extra=${(pruned -- brute).take(5)}")
  }
}
