package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Op, Tables}

/** Document chunking and passage-level deduplication — the two corpus
  * transforms that sit between curation and tokenization in a training
  * pipeline: long documents are split into fixed token windows
  * (context-length packing, RAG indexing), and passages repeated across
  * documents (boilerplate, licenses, navigation) are detected at
  * sub-document granularity where whole-doc dedup can't see them.
  *
  * Both scale linearly: chunking is a pure per-row explode (no
  * shuffle), passage dedup is one exchange keyed on the passage text.
  */
object Chunking {

  /** Tokens per chunk. */
  private val Width = 10
  /** Step between chunk starts; Width - Stride tokens overlap. */
  private val Stride = 8

  /** Sliding-window chunking: 10-token windows every 8 tokens, so
    * consecutive chunks share a 2-token overlap (the context-stitching
    * pattern RAG indexes use). The last window of a document may be
    * short; a document always yields at least one chunk.
    *
    * Scale shape: a single generate-and-explode projection — no
    * shuffle, no window, perfectly partition-parallel. Output size is
    * corpus_tokens/Stride rows regardless of document skew.
    */
  def chunkDocuments(spark: SparkSession, dir: String): DataFrame = {
    val chunk = slice(col("toks"), col("chunk_id") * Stride + lit(1), lit(Width))
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L), expr(s"(size(toks) - 1) div $Stride")))
          .as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        size(chunk).cast("long").as("n_tokens"),
        array_join(chunk, " ").as("chunk_text"))
  }

  private val chunkDocumentsSql =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |e AS (SELECT doc_id, toks,
       |        unnest(range(0, (len(toks) - 1) // $Stride + 1)) AS chunk_id
       |      FROM d)
       |SELECT doc_id, chunk_id,
       |  CAST(len(toks[chunk_id * $Stride + 1 : chunk_id * $Stride + $Width])
       |    AS BIGINT) AS n_tokens,
       |  array_to_string(toks[chunk_id * $Stride + 1 : chunk_id * $Stride + $Width],
       |    ' ') AS chunk_text
       |FROM e""".stripMargin

  /** Passage-level duplication profile (RefinedWeb/CCNet line-dedup
    * generalized to fixed windows): documents split into
    * NON-overlapping 10-token passages; an occurrence is a duplicate
    * when the identical passage appears earlier in corpus order
    * (doc_id, passage index) — the first occurrence stays canonical.
    * Emits per-document passage counts and the duplicated fraction,
    * the signal boilerplate filters threshold on.
    *
    * Scale shape: one exchange, partitioned by passage text (the
    * row_number window); everything before it is a shuffle-free
    * explode, everything after is a map-side-combined re-aggregation
    * by doc_id. At 100 TB the window key would be the passage's 8-byte
    * content hash (same plan, ~10× smaller exchange payload) — text is
    * kept here so the oracle comparison stays string-exact.
    */
  def passageDedup(spark: SparkSession, dir: String): DataFrame = {
    val passage = slice(col("toks"), col("pid") * Width + lit(1), lit(Width))
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L), expr(s"(size(toks) - 1) div $Width")))
          .as("pid"))
      .select(col("doc_id"), col("pid"), array_join(passage, " ").as("p"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("p"))
          .orderBy(col("doc_id").asc, col("pid").asc)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_passages"),
        count(when(col("rk") > 1, lit(1))).as("n_dup_passages"))
      .select(col("doc_id"), col("n_passages"), col("n_dup_passages"),
        (col("n_dup_passages").cast("double") / col("n_passages"))
          .as("dup_frac"))
  }

  private val passageDedupSql =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |e AS (SELECT doc_id, toks,
       |        unnest(range(0, (len(toks) - 1) // $Width + 1)) AS pid
       |      FROM d),
       |p AS (SELECT doc_id, pid,
       |        array_to_string(toks[pid * $Width + 1 : pid * $Width + $Width],
       |          ' ') AS p
       |      FROM e),
       |r AS (SELECT doc_id, pid,
       |        ROW_NUMBER() OVER (PARTITION BY p
       |          ORDER BY doc_id ASC, pid ASC) AS rk
       |      FROM p)
       |SELECT doc_id, count(*) AS n_passages,
       |  count(*) FILTER (WHERE rk > 1) AS n_dup_passages,
       |  CAST(count(*) FILTER (WHERE rk > 1) AS DOUBLE) / count(*) AS dup_frac
       |FROM r GROUP BY 1""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("chunk_documents", chunkDocuments, Some(chunkDocumentsSql)),
    Op("passage_dedup", passageDedup, Some(passageDedupSql)),
  )
}
