package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Op, Tables}

/** Byte-pair-encoding tokenizer induction over the corpus — the step a
  * training-data pipeline runs between curation and tokenization
  * (Sennrich et al. 2016; every modern LLM vocab is a descendant).
  *
  * `bpe_train` learns the first [[Rounds]] merges: count adjacent
  * symbol pairs over the word-frequency table, take the most frequent
  * pair (deterministic tie-break: smallest (a, b) lexicographically),
  * rewrite every word with the pair merged, repeat. `bpe_encode`
  * applies the learned merge sequence back to the corpus and reports
  * per-document symbol counts — the compression a vocab actually buys.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - the corpus is scanned ONCE — `words1`'s token aggregation. Every
  *    later round operates on the word-frequency VOCABULARY relation
  *    (sub-linear in corpus size; Heaps' law), never the corpus.
  *  - each round is one (a, b) pair aggregation with map-side partials
  *    plus a 1-row TakeOrderedAndProject argmax; the winning pair
  *    broadcasts back (1 row) for the row-local rewrite. No driver
  *    collect, no loop state outside the plan — the whole training is
  *    ONE lazy composition, like the unrolled `pagerank` rounds.
  *  - merge application is row-local string rewriting fused into
  *    whatever feeds it (codegen'd `replace`).
  *
  * Merge application uses a double-space sentinel encoding: symbols
  * are re-joined with TWO spaces (plus one pad space at each end) and
  * the pattern `' a  b '` replaces with `' ab '` — each match consumes
  * one space from each side's separator, leaving the other for the
  * neighboring occurrence, so ONE left-to-right non-overlapping
  * `replace` pass IS the greedy BPE merge scan, including the a == b
  * odd-run case ('c c c' → 'cc c'). (The naive single-space
  * `' a b '` → `' ab '` spelling is NOT greedy: its replacement eats
  * the trailing space the next occurrence needs, and repeating the
  * pass mis-places merges inside odd runs of a repeated symbol —
  * 'c c c c c' → 'cc c cc' where greedy left-packs 'cc cc c'. Caught
  * by the TokenizerSketchesSpec fuzz, which compares the kernel
  * against an explicit symbol-walk reference on adversarial streams.)
  * Both engines' `replace` are left-to-right non-overlapping, so the
  * oracle mirrors the kernel verbatim.
  */
object Tokenizer {

  private val Rounds = 3

  /** Greedy left-to-right BPE merge of pair (a, b) inside a
    * space-joined symbol string — the double-space sentinel kernel
    * (see object doc).
    */
  def mergeApply(repr: Column, a: Column, b: Column, merged: Column): Column = {
    val enc = concat(lit(" "), replace(repr, lit(" "), lit("  ")), lit(" "))
    val pat = concat(lit(" "), a, lit("  "), b, lit(" "))
    val sub = concat(lit(" "), merged, lit(" "))
    trim(replace(replace(enc, pat, sub), lit("  "), lit(" ")))
  }

  /** Word-frequency table with initial character-level symbolization:
    * 'low' → 'l o w'. The ONLY corpus-wide pass in the family.
    */
  private def words1(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .withColumn("repr", trim(regexp_replace(col("w"), "(.)", "$1 ")))

  /** Most frequent adjacent symbol pair of the current vocabulary,
    * occurrence-weighted by word frequency. Bigrams zip-slice per row
    * (the `pmi_bigrams` shape — no positional shuffle); the argmax is a
    * 1-row TakeOrderedAndProject with a total deterministic order.
    */
  private def bestPair(words: DataFrame): DataFrame =
    words.select(split(col("repr"), " ").as("s"), col("freq"))
      .select(explode(zip_with(
        slice(col("s"), lit(1), size(col("s")) - 1),
        slice(col("s"), lit(2), size(col("s")) - 1),
        (x, y) => struct(x.as("a"), y.as("b")))).as("p"), col("freq"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("a").asc, col("b").asc).limit(1)
      .withColumn("merged", concat(col("a"), col("b")))

  /** One training round: broadcast the 1-row winner, rewrite the
    * vocabulary row-locally.
    */
  private def step(words: DataFrame, best: DataFrame): DataFrame =
    words.crossJoin(broadcast(best.select(
        col("a").as("__a"), col("b").as("__b"), col("merged").as("__m"))))
      .select(col("w"), col("freq"),
        mergeApply(col("repr"), col("__a"), col("__b"), col("__m")).as("repr"))

  /** The chain (words_1, best_1, words_2, best_2, ...) as lazy frames. */
  private def chain(spark: SparkSession, dir: String): (Seq[DataFrame], DataFrame) = {
    var words = words1(spark, dir)
    val bests = (1 to Rounds).map { _ =>
      val b = bestPair(words)
      words = step(words, b)
      b
    }
    (bests, words)
  }

  /** The learned merge table: (round, pair_a, pair_b, merged, cnt). */
  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    val (bests, _) = chain(spark, dir)
    bests.zipWithIndex.map { case (b, i) =>
      b.select(lit(i + 1).as("round"), col("a").as("pair_a"),
        col("b").as("pair_b"), col("merged"), col("cnt"))
    }.reduce(_ unionAll _)
  }

  // ---- oracle: the identical unrolled rounds as CTEs ----------------

  private def roundSql(i: Int): String =
    s"""pairs$i AS (
       |  SELECT p.a, p.b, CAST(SUM(freq) AS BIGINT) AS cnt
       |  FROM (
       |    SELECT unnest(s[1:len(s) - 1]) AS a, unnest(s[2:len(s)]) AS b,
       |      freq
       |    FROM (SELECT string_split(repr, ' ') AS s, freq FROM words$i)
       |  ) p GROUP BY 1, 2),
       |best$i AS (
       |  SELECT a, b, a || b AS merged, cnt
       |  FROM pairs$i ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
       |words${i + 1} AS (
       |  SELECT w, freq,
       |    trim(replace(replace(' ' || replace(repr, ' ', '  ') || ' ',
       |      ' ' || a || '  ' || b || ' ', ' ' || merged || ' '),
       |      '  ', ' ')) AS repr
       |  FROM words$i CROSS JOIN best$i)""".stripMargin

  private def chainSql: String =
    s"""words1 AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq,
       |    trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS repr
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) > 0 GROUP BY 1),
       |${(1 to Rounds).map(roundSql).mkString(",\n")}""".stripMargin

  private val bpeTrainSql =
    s"""WITH $chainSql
       |${(1 to Rounds).map(i =>
          s"SELECT $i AS round, a AS pair_a, b AS pair_b, merged, cnt FROM best$i")
          .mkString("\nUNION ALL\n")}""".stripMargin

  // ---- encode --------------------------------------------------------

  /** Apply the learned merges to the corpus: per-document symbol counts
    * before (characters) and after (BPE symbols) — the compression the
    * vocabulary buys, per document. The final vocabulary (word → merged
    * representation) broadcasts: it is the word-frequency relation,
    * sub-linear in the corpus.
    */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val (_, vocab) = chain(spark, dir)
    val docWords = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
    docWords
      .join(broadcast(vocab.select(col("w"), col("repr"))), "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w"))).cast("long").as("n_sym_char"),
        sum(size(split(col("repr"), " "))).cast("long").as("n_sym_bpe"))
      .withColumn("compression",
        round(col("n_sym_char").cast("double") / col("n_sym_bpe"), 6))
  }

  private val bpeEncodeSql =
    s"""WITH $chainSql,
       |doc_words AS (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) > 0)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(SUM(length(d.w)) AS BIGINT) AS n_sym_char,
       |  CAST(SUM(len(string_split(v.repr, ' '))) AS BIGINT) AS n_sym_bpe,
       |  round(CAST(SUM(length(d.w)) AS DOUBLE)
       |    / CAST(SUM(len(string_split(v.repr, ' '))) AS BIGINT), 6)
       |    AS compression
       |FROM doc_words d JOIN words${Rounds + 1} v ON d.w = v.w
       |GROUP BY 1""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("bpe_train", bpeTrain, Some(bpeTrainSql)),
    Op("bpe_encode", bpeEncode, Some(bpeEncodeSql)),
  )
}
