package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Op, Tables}
import graft.functions.CrossHash

/** Mergeable cardinality / frequency sketches with DETERMINISTIC,
  * cross-engine-reproducible estimates.
  *
  * The approx family elsewhere in the registry (HLL
  * `count_distinct_approx`, `percentile_approx_sketch`) uses Spark's
  * built-in randomized sketches, which no other engine can replay —
  * those queries carry tolerance-band oracles. The two sketches here
  * take the other route: every hash is the portable md5-based
  * [[CrossHash.hash60]], so the ESTIMATE ITSELF is a pure function of
  * the data and the DuckDB oracle reproduces it bit-for-bit — a
  * hash-exact scorecard row for an approximate algorithm.
  *
  * Reference context: the reference counts distinct devices exactly
  * (/root/reference/src/queries/ntl_queries.py grouped COUNT(DISTINCT));
  * at 100 TB a pre-pass cardinality estimate per partition/source is
  * what sizes those jobs. Both sketches here are one-pass, mergeable,
  * and bounded-size — the shapes that survive a 1000-executor fan-in.
  */
object Sketches {

  // ---------------------------------------------------------------- KMV

  /** Sketch size: k smallest distinct hash values are kept per group.
    * At the fixture SFs this exercises BOTH estimator branches:
    * per-source distinct counts (25 at sf0.01) sit under k → the sketch
    * IS the exact distinct set; the merged union row (500 distinct) and
    * the sf0.1 per-source rows (250) overflow k → the (k−1)·2^60/h_k
    * estimator path runs.
    */
  private val K = 64
  private val Mod60 = 1152921504606846976L // 2^60

  /** KMV (k minimum values / bottom-k) distinct sketch per source, plus
    * a `__union` row computed by MERGING the per-source sketches — the
    * k smallest of the union of sketch members is exactly the sketch of
    * the union, which is the property that lets 1000 executors each
    * sketch their shard and a coordinator fold the results without ever
    * seeing raw keys.
    *
    * Estimator: with h the k-th smallest of n distinct uniform 60-bit
    * hashes, E[h/2^60] ≈ k/(n+1), so n̂ = (k−1)·2^60/h (the classic
    * unbiased bottom-k estimate); when the group holds fewer than k
    * distinct keys the sketch is the exact set and n̂ = |sketch|.
    *
    * Scale shape: `min_k_distinct` (the in-repo O(k) ordered-buffer
    * aggregate) builds per-source sketches map-side — the only exchange
    * carries ≤ k longs per (source, partition); the union row folds the
    * 20 sketch arrays, never the corpus. The exact-count anchor columns
    * share the same single scan.
    */
  def kmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    val keys = Tables.documents(spark, dir)
      .select(col("source"), CrossHash.hash60(col("text")).as("h"))
    // min_k_distinct dedups while it collects: no pre-distinct exchange
    val perSrc = keys.groupBy(col("source"))
      .agg(call_function("min_k_distinct", col("h"), lit(K)).as("sk"),
        countDistinct(col("h")).as("n_exact"))
    val merged = perSrc.select(explode(col("sk")).as("h"))
      .agg(call_function("min_k_distinct", col("h"), lit(K)).as("sk"))
    val uniExact = keys.agg(countDistinct(col("h")).as("n_exact"))
    val uni = merged.crossJoin(uniExact)
      .select(lit("__union").as("source"), col("sk"), col("n_exact"))
    perSrc.select(col("source"), col("sk"), col("n_exact"))
      .unionAll(uni)
      .select(col("source"),
        size(col("sk")).cast("long").as("sk_size"),
        col("n_exact").cast("long").as("n_exact"),
        // (k−1)·2^60 = 63·2^60 is exactly representable in a double and
        // h_k < 2^60 converts exactly, so the one division is the only
        // rounding step — bit-identical across engines before round(3)
        when(size(col("sk")) < K, size(col("sk")).cast("double"))
          .otherwise(round(
            lit((K - 1).toDouble * Mod60) / element_at(col("sk"), K), 3))
          .as("est"))
  }

  private val kmvDistinctSql =
    s"""WITH keys AS (
       |  SELECT source, ${CrossHash.hash60Sql("text")} AS h FROM documents),
       |dk AS (SELECT DISTINCT source, h FROM keys),
       |ranked AS (
       |  SELECT source, h,
       |    row_number() OVER (PARTITION BY source ORDER BY h ASC) AS rk
       |  FROM dk),
       |sk AS (SELECT source, h, rk FROM ranked WHERE rk <= $K),
       |per_src AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS sk_size,
       |    max(h) AS kth,
       |    (SELECT CAST(count(*) AS BIGINT) FROM dk d2
       |     WHERE d2.source = sk.source) AS n_exact
       |  FROM sk GROUP BY source),
       |mranked AS (
       |  SELECT h, row_number() OVER (ORDER BY h ASC) AS rk
       |  FROM (SELECT DISTINCT h FROM sk)),
       |uni AS (
       |  SELECT CAST('__union' AS VARCHAR) AS source,
       |    CAST(count(*) AS BIGINT) AS sk_size, max(h) AS kth,
       |    (SELECT CAST(count(DISTINCT h) AS BIGINT) FROM keys) AS n_exact
       |  FROM mranked WHERE rk <= $K)
       |SELECT source, sk_size, n_exact,
       |  CASE WHEN sk_size < $K THEN CAST(sk_size AS DOUBLE)
       |       ELSE round(CAST($K - 1 AS DOUBLE) * $Mod60 / kth, 3)
       |  END AS est
       |FROM (SELECT * FROM per_src UNION ALL SELECT * FROM uni)""".stripMargin

  // ---------------------------------------------------------------- CMS

  private val Depth = 4
  private val Width = 512

  /** Count–min sketch over the token stream: `Depth` hash rows ×
    * `Width` counters, point estimate = min over rows of the probed
    * counter. Guarantees est ≥ exact and est ≤ exact + ⌈2N/Width⌉ with
    * probability 1−2^−Depth — the `overcount` column exposes the error
    * and the oracle reproduces it exactly (seeded portable hashes).
    *
    * Scale shape: the counter table is AT MOST Depth×Width rows no
    * matter the corpus — the (row, bucket) aggregation combines
    * map-side into a bounded state that a streaming or multi-day
    * pipeline can keep folding into. The probe side broadcasts those
    * ≤2048 counters; the exact anchor shares the token exchange a
    * frequency query pays anyway. (In production the probe list is a
    * fixed keyword set; probing the whole vocabulary here maximizes
    * oracle coverage.)
    */
  def cmsCounts(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
    val rows = (0 until Depth).map { i =>
      struct(lit(i).as("i"), (CrossHash.hash60Seeded(col("tok"), i) % Width).as("bucket"))
    }
    val cells = toks
      .select(explode(array(rows: _*)).as("rb"))
      .groupBy(col("rb.i").as("i"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
    val probes = exact.select(col("tok"), col("n_exact"),
      explode(array(rows: _*)).as("rb"))
      .select(col("tok"), col("n_exact"),
        col("rb.i").as("i"), col("rb.bucket").as("bucket"))
    probes.join(broadcast(cells), Seq("i", "bucket"))
      .groupBy(col("tok"), col("n_exact"))
      .agg(min(col("c")).as("est"))
      .select(col("tok"), col("n_exact"), col("est"),
        (col("est") - col("n_exact")).as("overcount"))
  }

  private val cmsCountsSql = {
    val buckets = (0 until Depth)
      .map(i => s"(SELECT $i AS i, ${CrossHash.hash60SeededSql("tok", i)} % $Width AS bucket)")
      .mkString(" UNION ALL ")
    s"""WITH toks AS (
       |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       |rb AS (
       |  SELECT tok, i, bucket FROM toks, LATERAL ($buckets) AS t),
       |cells AS (
       |  SELECT i, bucket, CAST(count(*) AS BIGINT) AS c
       |  FROM rb GROUP BY 1, 2),
       |exact AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS n_exact
       |  FROM toks GROUP BY 1),
       |probes AS (
       |  SELECT DISTINCT e.tok, e.n_exact, r.i, r.bucket
       |  FROM exact e JOIN rb r ON r.tok = e.tok)
       |SELECT p.tok, p.n_exact, min(c.c) AS est,
       |  min(c.c) - p.n_exact AS overcount
       |FROM probes p JOIN cells c ON c.i = p.i AND c.bucket = p.bucket
       |GROUP BY 1, 2""".stripMargin
  }

  // ------------------------------------------------------- KMV overlap

  /** Pairwise cross-source overlap from the KMV sketches: for every
    * source pair, the Jaccard ESTIMATE computed entirely from the two
    * bottom-k sketches (merge to the union sketch U = k smallest of
    * A ∪ B, then Ĵ = |{h ∈ U : h ∈ A ∧ h ∈ B}| / |U| — the classic
    * KMV set-operation estimator), next to the exact Jaccard anchor.
    * This is how a 100 TB ingest decides WHICH source pairs need a
    * dedup pass without ever joining the corpora: sketches are ≤ k
    * longs per source, so all |sources|² work happens on a broadcast-
    * sized relation.
    *
    * Scale shape: one corpus scan builds the per-source sketches
    * map-side (`min_k_distinct`); the pair enumeration, merge, and
    * estimate are pure array expressions over the tiny sketch table.
    * The exact anchor costs one content-hash exchange — the same
    * exchange `dedup_exact` pays — and is the part you'd DROP at
    * 100 TB; it exists here to expose the estimator's error.
    */
  def kmvOverlap(spark: SparkSession, dir: String): DataFrame = {
    val keys = Tables.documents(spark, dir)
      .select(col("source"), CrossHash.hash60(col("text")).as("h"))
    val sk = keys.groupBy(col("source"))
      .agg(call_function("min_k_distinct", col("h"), lit(K)).as("sk"),
        countDistinct(col("h")).as("n_exact"))
    val pairs = sk.select(col("source").as("source_a"), col("sk").as("ska"),
        col("n_exact").as("na"))
      .crossJoin(sk.select(col("source").as("source_b"), col("sk").as("skb"),
        col("n_exact").as("nb")))
      .where(col("source_a") < col("source_b"))
    val dk = keys.distinct()
    // both anchor-join sides are corpus-derived: shuffle-hash, no sort
    val inter = dk.select(col("source").as("source_a"), col("h"))
      .hint("shuffle_hash")
      .join(dk.select(col("source").as("source_b"), col("h")), Seq("h"))
      .where(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_ab"))
    val u = slice(array_sort(array_union(col("ska"), col("skb"))), 1, K)
    val commonInU = size(array_intersect(u,
      array_intersect(col("ska"), col("skb"))))
    pairs.join(broadcast(inter), Seq("source_a", "source_b"), "left")
      .withColumn("n_ab", coalesce(col("n_ab"), lit(0L)))
      .select(col("source_a"), col("source_b"),
        round(commonInU.cast("double") / size(u), 6).as("est_jaccard"),
        round(col("n_ab").cast("double")
          / (col("na") + col("nb") - col("n_ab")), 6).as("exact_jaccard"),
        col("n_ab"))
  }

  private val kmvOverlapSql =
    s"""WITH keys AS (
       |  SELECT source, ${CrossHash.hash60Sql("text")} AS h FROM documents),
       |dk AS (SELECT DISTINCT source, h FROM keys),
       |sk AS (
       |  SELECT source, (list(h ORDER BY h))[1:$K] AS sk,
       |    CAST(count(*) AS BIGINT) AS n_exact
       |  FROM dk GROUP BY 1),
       |pairs AS (
       |  SELECT a.source AS source_a, a.sk AS ska, a.n_exact AS na,
       |    b.source AS source_b, b.sk AS skb, b.n_exact AS nb
       |  FROM sk a JOIN sk b ON a.source < b.source),
       |inter AS (
       |  SELECT a.source AS source_a, b.source AS source_b,
       |    CAST(count(*) AS BIGINT) AS n_ab
       |  FROM dk a JOIN dk b ON a.h = b.h AND a.source < b.source
       |  GROUP BY 1, 2),
       |est AS (
       |  SELECT source_a, source_b, na, nb,
       |    list_sort(list_distinct(ska || skb))[1:$K] AS u, ska, skb
       |  FROM pairs)
       |SELECT e.source_a, e.source_b,
       |  round(CAST(len(list_filter(u,
       |      x -> list_contains(ska, x) AND list_contains(skb, x))) AS DOUBLE)
       |    / len(u), 6) AS est_jaccard,
       |  round(CAST(COALESCE(i.n_ab, 0) AS DOUBLE)
       |    / (na + nb - COALESCE(i.n_ab, 0)), 6) AS exact_jaccard,
       |  COALESCE(i.n_ab, 0) AS n_ab
       |FROM est e LEFT JOIN inter i USING (source_a, source_b)""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("kmv_distinct", kmvDistinct, Some(kmvDistinctSql)),
    Op("cms_counts", cmsCounts, Some(cmsCountsSql)),
    Op("kmv_overlap", kmvOverlap, Some(kmvOverlapSql)),
  )
}
