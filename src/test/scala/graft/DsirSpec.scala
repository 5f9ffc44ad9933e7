package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** dsir_weights: hashed-n-gram importance weights (DSIR). The fixture
  * gives the target (`en`) and off-target (`fr`) slices disjoint
  * vocabularies, so the sign structure of the log-likelihood ratio is
  * forced: en-doc grams live in target-heavy buckets (λ > 0), fr-doc
  * grams in target-empty ones (λ < 0 once the bucket count clears the
  * smoothing ratio). A rare hash collision between one en and one fr
  * gram can dilute a single bucket, so the assertion is on the group
  * MEANS, not every row.
  */
class DsirSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_dsir_").toString
    val en = (1 to 4).map(i =>
      (i.toLong, s"alpha beta gamma delta alpha beta tok$i", "en", "web"))
    val fr = (5 to 8).map(i =>
      (i.toLong, s"rouge bleu vert jaune rouge bleu mot$i", "fr", "web"))
    (en ++ fr)
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("target-slice documents outweigh off-target; n_grams = 2n−1 exactly") {
    val rows = operators.Curation.dsirWeights(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.size == 8)
    // every doc has 7 tokens → 7 unigrams + 6 bigrams = 13 gram instances
    rows.values.foreach { case (n, _) => assert(n == 13L, s"n_grams $n") }
    val enMean = (1 to 4).map(i => rows(i.toLong)._2).sum / 4
    val frMean = (5 to 8).map(i => rows(i.toLong)._2).sum / 4
    assert(enMean > 0, s"target-slice mean must be positive: $enMean")
    assert(frMean < 0, s"off-target mean must be negative: $frMean")
    assert(enMean > frMean + 0.5,
      s"separation too weak: en=$enMean fr=$frMean")
  }

  test("gram_bucket_hist equals the relational explode+count formula") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // real corpus text (punctuation, repeated spaces, unicode) — the
    // kernel's byte-scan tokenization and md5-60 bucketing must agree
    // with split(text,' ') + explode + conv(substring(md5(g),1,15),16,10)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200).select(col("doc_id"), col("text"))
    val hist = docs.select(col("doc_id"),
        posexplode(call_function("gram_bucket_hist", col("text"), lit(128))))
      .where(col("col") > 0)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val t = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val grams = t.select(col("doc_id"), explode(col("toks")).as("g"))
      .unionByName(t.select(col("doc_id"), explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("g")))
    val rel = grams.select(col("doc_id"),
        (graft.functions.CrossHash.hash60(col("g")) % 128).as("b"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt) -> r.getLong(2)).toMap
    assert(hist == rel, s"hist size ${hist.size} vs rel ${rel.size}")
    assert(hist.nonEmpty)
  }

  test("deterministic across runs on the real corpus") {
    val sf = "/root/testdata/sf0.001"
    val a = operators.Curation.dsirWeights(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = operators.Curation.dsirWeights(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }
}
