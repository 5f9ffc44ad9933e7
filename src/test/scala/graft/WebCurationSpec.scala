package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Similarity, WebCuration}

/** Invariants of the web-crawl curation front end (r12): HTML
  * stripping, URL canonicalization/dedup, CCNet perplexity buckets,
  * and SemDeDup. The DuckDB oracle pins exact values; these specs pin
  * the SEMANTIC contracts that stay true under any fixture drift.
  */
class WebCurationSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("html_strip removes every tag and decodes every entity") {
    val rows = WebCuration.htmlStrip(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val clean = r.getAs[String]("text_clean")
      // the decoded literals '<raw>' and '&' DO survive — proof the
      // entity pass ran after the tag pass, not before...
      assert(clean.contains("& <raw> \"q\" 's' end"), s"entities: $clean")
      // ...and once that known decoded literal is accounted for, no
      // angle-bracket construct remains (a real tag would have been
      // emitted by the scaffold, not the entity decode)
      val residue = clean.replace("& <raw> ", "")
      assert(!residue.matches(".*<[a-zA-Z/][^>]*>.*"), s"tag residue: $clean")
      // script/style payloads must not leak into the text
      assert(!clean.contains("var x"), s"script residue: $clean")
      assert(!clean.contains("color: red"), s"style residue: $clean")
      assert(r.getAs[Long]("n_clean") < r.getAs[Long]("n_raw"))
      // collapsed whitespace: never two spaces, never leading/trailing
      assert(!clean.contains("  ") && clean == clean.trim)
    }
  }

  test("url_canonicalize: lowercase authority, no port/www/tracking/fragment") {
    val rows = WebCuration.urlCanonicalize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cu = r.getAs[String]("canonical_url")
      assert(cu.startsWith("https://"), cu)
      assert(!cu.contains("www."), cu)
      assert(!cu.contains(":443"), cu)
      assert(!cu.contains("utm_"), cu)
      assert(!cu.contains("ref="), cu)
      assert(!cu.contains("#"), cu)
      assert(!cu.contains("&&") && !cu.contains("?&"), cu)
      assert(cu.contains("?id="), s"payload param must survive: $cu")
      val auth = cu.stripPrefix("https://").takeWhile(_ != '/')
      assert(auth == auth.toLowerCase, cu)
      // path case is significant and must NOT be folded
      assert(cu.contains("/docs/"), cu)
    }
  }

  test("url_dedup partitions the corpus: aliases + uniques == all docs") {
    val canon = WebCuration.urlCanonicalize(spark, sf)
    val total = canon.count()
    val groups = WebCuration.urlDedup(spark, sf).collect()
    assert(groups.nonEmpty, "fixture must actually collapse some URLs")
    val aliased = groups.map(r => r.getAs[Long]("n_dups") + 1).sum
    val uniqueKeys = canon.select("canonical_url").distinct().count()
    // every doc is either in a collapsed group or alone under its key
    assert(aliased - groups.length + uniqueKeys == total)
    // the keeper is the group minimum, so it can never exceed any alias
    groups.foreach(r => assert(r.getAs[Long]("n_dups") > 0))
  }

  test("perplexity_buckets: exact terciles, head strictly most fluent") {
    val rows = WebCuration.perplexityBuckets(spark, sf)
      .collect().sortBy(_.getAs[Long]("doc_id"))
    val byBucket = rows.groupBy(_.getAs[Int]("bucket"))
    assert(byBucket.keySet == Set(1, 2, 3))
    val sizes = byBucket.view.mapValues(_.length).toMap
    assert(sizes.values.max - sizes.values.min <= 1,
      s"ntile balance: $sizes")
    // bucket boundaries respect the perplexity order: every head doc's
    // ppl <= every middle doc's ppl <= every tail doc's ppl
    def ppl(b: Int) = byBucket(b).map(_.getAs[Double]("ppl"))
    assert(ppl(1).max <= ppl(2).min)
    assert(ppl(2).max <= ppl(3).min)
    assert(byBucket(1).forall(_.getAs[String]("bucket_name") == "head"))
    assert(byBucket(3).forall(_.getAs[String]("bucket_name") == "tail"))
  }

  test("crawl_pipeline reconciles with its stages run individually") {
    val rolled = WebCuration.crawlPipeline(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"))).toMap
    // manual composition from the INDIVIDUAL registered ops: survivors
    // = one doc per canonical key, then the same length gate
    val canon = WebCuration.urlCanonicalize(spark, sf)
      .select(col("doc_id").as("kdoc"), col("canonical_url"))
    val strip = WebCuration.htmlStrip(spark, sf)
    val manual = canon.groupBy(col("canonical_url"))
      .agg(min(col("kdoc")).as("doc_id"))
      .join(strip, Seq("doc_id"))
      .where(col("n_clean") >= 120)
      .join(Tables.documents(spark, sf).select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"))).toMap
    assert(rolled == manual,
      s"pipeline drifted from its stages: $rolled vs $manual")
  }

  test("canonicalizeUrl under readStream: streamed dedup == batch keys") {
    // the Column kernel must behave identically inside a streaming
    // micro-batch plan — crawl-frontier dedup is a STREAMING workload
    // in production (dropDuplicates on the canonical key; bound with
    // dropDuplicatesWithinWatermark at scale, same plan shape)
    val docs = Tables.documents(spark, sf)
    val urlExpr = concat(lit("HTTPS://WWW."), col("source"),
      lit(".Example.COM:443/p/"), (col("doc_id") % 25).cast("string"),
      lit("?utm_s=x&id="), (col("doc_id") % 25).cast("string"), lit("#f"))
    val batchKeys = docs.select(
        WebCuration.canonicalizeUrl(urlExpr).as("canonical_url"))
      .distinct().collect().map(_.getString(0)).toSet
    // FileStreamSource needs a DIRECTORY; the fixture is a single file
    val dir = java.nio.file.Files.createTempDirectory("crawl-stream")
      .toString + "/docs"
    docs.write.parquet(dir)
    val q = spark.readStream.schema(docs.schema)
      .parquet(dir)
      .select(WebCuration.canonicalizeUrl(urlExpr).as("canonical_url"))
      .dropDuplicates("canonical_url")
      .writeStream.outputMode("append").format("memory")
      .queryName("crawl_keys")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()
    val streamed = spark.table("crawl_keys")
      .collect().map(_.getString(0)).toSet
    assert(streamed == batchKeys)
    assert(batchKeys.size < 500, "the modulus must actually collapse keys")
  }

  test("sem_dedup: cluster minima always survive; drops are justified") {
    val rows = Similarity.semDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getAs[Long]("cluster"))
    byCluster.foreach { case (_, members) =>
      val minId = members.map(_.getAs[Long]("vec_id")).min
      // keep-min semantics: the smallest id of a cluster has no
      // lower-id neighbor, so it can never be dropped
      assert(members.find(_.getAs[Long]("vec_id") == minId)
        .get.getAs[Boolean]("kept"))
    }
    // seeds 0..7 are their own nearest centroid (d2 = 0) — each seed
    // must sit in its own cluster and survive (it IS the cluster min
    // unless a smaller id joined, impossible for seed 0)
    val seed0 = rows.find(_.getAs[Long]("vec_id") == 0L).get
    assert(seed0.getAs[Long]("cluster") == 0L && seed0.getAs[Boolean]("kept"))
  }
}
