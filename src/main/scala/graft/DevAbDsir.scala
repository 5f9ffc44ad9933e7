package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (r10, VERDICT r9 #3): interleaved in-session A/B of the
  * DSIR importance-weight spelling — the one new operator above 2×
  * past the job floor (5.5× at sf0.1, 3.2× at ≈sf1) without its own
  * floor proof. Same discipline as DevAbCf: identical output
  * checksum-verified, variants alternated within ONE session so the
  * ±30% between-JVM window noise cancels.
  *
  * Variants (identical (doc_id, n_grams, dsir_weight) output):
  *  - direct    — the registered shape: two branches (unigrams,
  *                bigrams), each re-splitting text, UNION ALL, then
  *                hash+bucket on the exploded string
  *  - onesplit  — split text ONCE, build the combined gram array
  *                (toks ++ bigrams) in-row, single explode; halves
  *                the tokenize work and the number of scan branches
  *  - prehash   — like onesplit but hash+bucket INSIDE the array
  *                (transform) before exploding: the explode emits a
  *                LONG bucket id instead of the gram string, so the
  *                aggregation input rows are fixed-width and the
  *                per-row hash runs once per gram either way
  *
  * Usage: runMain graft.DevAbDsir [sfDir]   (GRAFT_RUNS overrides 5)
  */
object DevAbDsir {
  // mirror of Curation's private constants (probe tooling)
  private val Buckets = 128

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("GRAFT_RUNS", "5").toInt
    val spark = Sessions.build("graft-ab-dsir",
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors.toString))
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.CrossHash

    def toksDf = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))

    def bigramsCol = zip_with(
      slice(col("toks"), lit(1), size(col("toks")) - 1),
      slice(col("toks"), lit(2), size(col("toks")) - 1),
      (a, b) => concat(a, lit(" "), b))

    // the shared tail from the (doc_id, lang, b) exploded relation:
    // per-(doc,lang,bucket) counts → bucket λ → join-back → per-doc sum
    def tail(buckets: DataFrame): DataFrame = {
      val counts = buckets
        .groupBy(col("doc_id"), col("lang"), col("b"))
        .agg(count(lit(1)).as("c"))
      val agg = counts.groupBy(col("b"))
        .agg(sum(col("c")).as("raw_c"),
          sum(when(col("lang") === "en", col("c")).otherwise(lit(0L))).as("tgt_c"))
      val tot = agg.agg(sum(col("raw_c")).as("nr"), sum(col("tgt_c")).as("nt"))
      val lamSql =
        s"ln((CAST(tgt_c AS DOUBLE) + 1.0) / (CAST(nt AS DOUBLE) + $Buckets.0))" +
          s" - ln((CAST(raw_c AS DOUBLE) + 1.0) / (CAST(nr AS DOUBLE) + $Buckets.0))"
      val lam = agg.crossJoin(broadcast(tot))
        .select(col("b"), expr(s"round($lamSql, 9)").as("lam"))
      counts.join(broadcast(lam), "b")
        .withColumn("s", expr("CAST(round(c * lam, 9) AS DECIMAL(24,9))"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_grams"), sum(col("s")).as("w"))
        .select(col("doc_id"), col("n_grams"),
          expr("CAST(w AS DOUBLE)").as("dsir_weight"))
    }

    def direct: DataFrame = {
      val t = toksDf
      val uni = t.select(col("doc_id"), col("lang"), explode(col("toks")).as("g"))
      val bi = t.select(col("doc_id"), col("lang"), explode(bigramsCol).as("g"))
      tail(uni.unionByName(bi)
        .select(col("doc_id"), col("lang"),
          (CrossHash.hash60(col("g")) % Buckets).as("b")))
    }

    def onesplit: DataFrame =
      tail(toksDf
        .select(col("doc_id"), col("lang"),
          explode(concat(col("toks"), bigramsCol)).as("g"))
        .select(col("doc_id"), col("lang"),
          (CrossHash.hash60(col("g")) % Buckets).as("b")))

    def prehash: DataFrame =
      tail(toksDf
        .select(col("doc_id"), col("lang"),
          explode(transform(concat(col("toks"), bigramsCol),
            g => CrossHash.hash60(g) % Buckets)).as("b")))

    val all: Seq[(String, () => DataFrame)] = Seq(
      "direct" -> (() => direct), "onesplit" -> (() => onesplit),
      "prehash" -> (() => prehash))
    val variants =
      if (args.length > 1) all.filter(v => args.drop(1).contains(v._1))
      else all

    def sig(df: DataFrame): (Long, String) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("doc_id"), col("n_grams"),
          col("dsir_weight").cast("string")).cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1).toString)
    }
    val sigs = variants.map { case (l, mk) => l -> sig(mk()) }
    sigs.foreach { case (l, s) => println(s"[sig] $l -> $s") }
    require(sigs.map(_._2).distinct.size == 1, s"variants disagree: $sigs")

    val times = collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to runs; (label, mk) <- variants) {
      val t0 = System.nanoTime()
      mk().count()
      val dt = (System.nanoTime() - t0) / 1e9
      times(label) = dt :: times.getOrElse(label, Nil)
    }
    variants.foreach { case (label, _) =>
      val ts = times(label).reverse
      println(f"[ab-dsir] $label%-9s min=${ts.min}%.3f " +
        f"raw=[${ts.map(t => f"$t%.3f").mkString(", ")}]")
    }
    spark.stop()
  }
}
