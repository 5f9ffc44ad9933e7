package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Op, Tables}

/** Generation-eval metrics: ROUGE-1/2 and BLEU-2 between a candidate
  * and a reference token sequence — the standard summary/translation
  * quality scores an LLM eval pipeline computes per example (the
  * reference's pandas EDA territory; in Spark they must be row-local,
  * not a gram join). The fixture pairs each document's text (the
  * reference side) with a deterministic candidate derived from it
  * (every other token, every 10th of those upper-cased) so clipping,
  * misses, and case divergence all actually occur; a real eval swaps
  * in a model-output column.
  *
  * Scale shape: the ENTIRE computation is row-local higher-order
  * functions over the two token arrays — zero exchanges, scan
  * parallelism, the embarrassingly-parallel shape per-example eval
  * keeps at any corpus size (clipped-count matching is O(|distinct
  * grams| · n) per row over short arrays, never a corpus join).
  *
  * Cross-engine determinism: every metric is spelled as integer gram
  * counts combined by single IEEE-exact operations (division, sqrt,
  * min) — F1 uses the algebraic identity 2pr/(p+r) = 2·clipped/(ct+rt)
  * so one division replaces three, and BLEU's brevity penalty is the
  * linear min(1, c/r) variant (the exp(1-r/c) form is libm-dependent
  * and would not hash across engines; the simplification is
  * documented, not hidden).
  */
object TextEval {

  def rougeBleuEval(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ref"))
      // candidate: even-index tokens, every 10th index upper-cased
      .withColumn("cand", expr(
        "transform(filter(sequence(0, size(ref) - 1), i -> i % 2 = 0), " +
          "i -> CASE WHEN i % 10 = 0 THEN upper(element_at(ref, i + 1)) " +
          "ELSE element_at(ref, i + 1) END)"))
      .withColumn("ref2", expr(
        "zip_with(slice(ref, 1, size(ref) - 1), slice(ref, 2, size(ref) - 1), " +
          "(x, y) -> concat(x, ' ', y))"))
      .withColumn("cand2", expr(
        "zip_with(slice(cand, 1, size(cand) - 1), slice(cand, 2, size(cand) - 1), " +
          "(x, y) -> concat(x, ' ', y))"))
      // clipped gram matches: per distinct candidate gram, min of the
      // two multiplicities — the ROUGE/BLEU clipping rule, row-local
      .withColumn("clip1", expr(
        "aggregate(array_distinct(cand), 0, (acc, g) -> acc + " +
          "least(size(filter(cand, x -> x = g)), size(filter(ref, x -> x = g))))"))
      .withColumn("clip2", expr(
        "aggregate(array_distinct(cand2), 0, (acc, g) -> acc + " +
          "least(size(filter(cand2, x -> x = g)), size(filter(ref2, x -> x = g))))"))
    base.select(
      col("doc_id"),
      size(col("ref")).cast("long").as("n_ref"),
      size(col("cand")).cast("long").as("n_cand"),
      col("clip1").cast("long").as("r1_clipped"),
      col("clip2").cast("long").as("r2_clipped"),
      (col("clip1").cast("double") / size(col("cand"))).as("rouge1_p"),
      (col("clip1").cast("double") / size(col("ref"))).as("rouge1_r"),
      when(col("clip1") === 0, lit(0.0)).otherwise(
        lit(2.0) * col("clip1") / (size(col("cand")) + size(col("ref"))))
        .as("rouge1_f"),
      when(col("clip2") === 0 || size(col("cand2")) === 0 || size(col("ref2")) === 0,
        lit(0.0)).otherwise(
        lit(2.0) * col("clip2") / (size(col("cand2")) + size(col("ref2"))))
        .as("rouge2_f"),
      when(col("clip1") === 0 || col("clip2") === 0 || size(col("cand2")) === 0,
        lit(0.0)).otherwise(
        least(lit(1.0),
          size(col("cand")).cast("double") / size(col("ref"))) *
          sqrt((col("clip1").cast("double") / size(col("cand"))) *
            (col("clip2").cast("double") / size(col("cand2")))))
        .as("bleu2"))
  }

  private val rougeBleuEvalSql =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS ref FROM documents),
      |c AS (
      |  SELECT doc_id, ref,
      |    list_transform(list_filter(range(len(ref)), i -> i % 2 = 0),
      |      i -> CASE WHEN i % 10 = 0 THEN upper(ref[CAST(i + 1 AS INTEGER)])
      |           ELSE ref[CAST(i + 1 AS INTEGER)] END) AS cand
      |  FROM t),
      |g AS (
      |  SELECT doc_id, ref, cand,
      |    list_transform(range(len(ref) - 1),
      |      i -> ref[CAST(i + 1 AS INTEGER)] || ' ' || ref[CAST(i + 2 AS INTEGER)]) AS ref2,
      |    list_transform(range(len(cand) - 1),
      |      i -> cand[CAST(i + 1 AS INTEGER)] || ' ' || cand[CAST(i + 2 AS INTEGER)]) AS cand2
      |  FROM c),
      |k AS (
      |  SELECT doc_id, ref, cand, ref2, cand2,
      |    list_reduce(list_prepend(0, list_transform(list_distinct(cand),
      |      gr -> least(len(list_filter(cand, x -> x = gr)),
      |                  len(list_filter(ref, x -> x = gr))))),
      |      (acc, v) -> acc + v) AS clip1,
      |    list_reduce(list_prepend(0, list_transform(list_distinct(cand2),
      |      gr -> least(len(list_filter(cand2, x -> x = gr)),
      |                  len(list_filter(ref2, x -> x = gr))))),
      |      (acc, v) -> acc + v) AS clip2
      |  FROM g)
      |SELECT doc_id,
      |  CAST(len(ref) AS BIGINT) AS n_ref,
      |  CAST(len(cand) AS BIGINT) AS n_cand,
      |  CAST(clip1 AS BIGINT) AS r1_clipped,
      |  CAST(clip2 AS BIGINT) AS r2_clipped,
      |  CAST(clip1 AS DOUBLE) / len(cand) AS rouge1_p,
      |  CAST(clip1 AS DOUBLE) / len(ref) AS rouge1_r,
      |  CASE WHEN clip1 = 0 THEN 0.0
      |       ELSE 2.0 * clip1 / (len(cand) + len(ref)) END AS rouge1_f,
      |  CASE WHEN clip2 = 0 OR len(cand2) = 0 OR len(ref2) = 0 THEN 0.0
      |       ELSE 2.0 * clip2 / (len(cand2) + len(ref2)) END AS rouge2_f,
      |  CASE WHEN clip1 = 0 OR clip2 = 0 OR len(cand2) = 0 THEN 0.0
      |       ELSE least(1.0, CAST(len(cand) AS DOUBLE) / len(ref)) *
      |            sqrt((CAST(clip1 AS DOUBLE) / len(cand)) *
      |                 (CAST(clip2 AS DOUBLE) / len(cand2))) END AS bleu2
      |FROM k""".stripMargin

  /** T5-style span corruption: mask length-3 token spans with
    * `<extra_id_k>` sentinels, emitting the (inputs, targets) pair a
    * denoising seq2seq objective trains on (Raffel et al. 2020 §3.1.4
    * — published method, re-derived here). Span placement is a FIXED
    * STRIDE of 17 with a per-document offset (doc_id % 17): real T5
    * samples spans randomly, but random placement needs sequential
    * greedy state that neither distributes nor cross-checks; the fixed
    * stride keeps ~17.6% corruption, guarantees non-overlap by
    * construction, makes the k-th span's ordinal a closed form
    * ((start − offset) / 17), and leaves the whole op row-local —
    * zero exchanges at any corpus size.
    */
  def spanCorrupt(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"),
        (col("doc_id") % 17).cast("int").as("off"))
      .withColumn("n", size(col("t")))
      // span starts: every 17th index from the offset, with room for 3
      .withColumn("starts", expr(
        "filter(sequence(0, n - 1), i -> i % 17 = off AND i + 2 < n)"))
      .select(
        col("doc_id"),
        col("n").cast("long").as("n_tokens"),
        size(col("starts")).cast("long").as("n_spans"),
        // inputs: sentinel at each span start, covered tokens dropped,
        // everything else verbatim. m = position within a would-be
        // span; the (+17)%17 spelling keeps it non-negative in both
        // engines (% takes the dividend's sign in each).
        expr(
          "array_join(filter(transform(sequence(0, n - 1), i -> " +
            "CASE WHEN ((i - off) % 17 + 17) % 17 = 0 AND i + 2 < n " +
            "  THEN concat('<extra_id_', CAST((i - off) div 17 AS STRING), '>') " +
            "WHEN ((i - off) % 17 + 17) % 17 <= 2 " +
            "  AND i - ((i - off) % 17 + 17) % 17 >= 0 " +
            "  AND i - ((i - off) % 17 + 17) % 17 + 2 < n THEN NULL " +
            "ELSE element_at(t, i + 1) END), x -> x IS NOT NULL), ' ')")
          .as("inputs"),
        // targets: '<extra_id_k> span tokens' per span + closing sentinel
        expr(
          "CASE WHEN size(starts) = 0 THEN '<extra_id_0>' ELSE concat(" +
            "array_join(transform(starts, s -> concat(" +
            "  '<extra_id_', CAST((s - off) div 17 AS STRING), '> ', " +
            "  element_at(t, s + 1), ' ', element_at(t, s + 2), ' ', " +
            "  element_at(t, s + 3))), ' '), " +
            "' <extra_id_', CAST(size(starts) AS STRING), '>') END")
          .as("targets"))

  private val spanCorruptSql =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS t,
      |    CAST(doc_id % 17 AS INTEGER) AS off,
      |    len(string_split(text, ' ')) AS n
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, t, off, n,
      |    list_filter(range(n), i -> i % 17 = off AND i + 2 < n) AS starts
      |  FROM t)
      |SELECT doc_id,
      |  CAST(n AS BIGINT) AS n_tokens,
      |  CAST(len(starts) AS BIGINT) AS n_spans,
      |  array_to_string(list_filter(list_transform(range(n), i ->
      |    CASE WHEN ((i - off) % 17 + 17) % 17 = 0 AND i + 2 < n
      |      THEN '<extra_id_' || CAST((i - off) // 17 AS VARCHAR) || '>'
      |    WHEN ((i - off) % 17 + 17) % 17 <= 2
      |      AND i - ((i - off) % 17 + 17) % 17 >= 0
      |      AND i - ((i - off) % 17 + 17) % 17 + 2 < n THEN NULL
      |    ELSE t[CAST(i + 1 AS INTEGER)] END), x -> x IS NOT NULL), ' ')
      |    AS inputs,
      |  CASE WHEN len(starts) = 0 THEN '<extra_id_0>' ELSE
      |    array_to_string(list_transform(starts, sp ->
      |      '<extra_id_' || CAST((sp - off) // 17 AS VARCHAR) || '> ' ||
      |      t[CAST(sp + 1 AS INTEGER)] || ' ' || t[CAST(sp + 2 AS INTEGER)] ||
      |      ' ' || t[CAST(sp + 3 AS INTEGER)]), ' ') ||
      |    ' <extra_id_' || CAST(len(starts) AS VARCHAR) || '>' END AS targets
      |FROM s""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("rouge_bleu_eval", rougeBleuEval, Some(rougeBleuEvalSql)),
    Op("span_corrupt", spanCorrupt, Some(spanCorruptSql)),
  )
}
