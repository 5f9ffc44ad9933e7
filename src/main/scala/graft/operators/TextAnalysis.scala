package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Op, Tables}
import graft.functions.CrossHash
import graft.functions.GraftFunctions.sum_order_free

/** Text-analysis operators for LLM data pipelines: token counting,
  * quality scoring, language-ID (marker-word profiles), winnowing
  * document fingerprints. All single-pass column expressions over the
  * documents table — fully pushdown/codegen friendly; only the
  * fingerprint op shuffles (per-doc window over shingle positions).
  */
object TextAnalysis {

  private[operators] val Stopwords = Seq("the", "a", "of", "and", "to")

  /** Whitespace token count + BPE-ish size estimate + token-length
    * extremes (`aggregate` over the split array — no explode).
    */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).as("n_tokens"),
        ceil(col("n_chars") / lit(4.0)).cast("long").as("bpe_estimate"),
        expr("aggregate(split(text, ' '), 0, (acc, t) -> greatest(acc, length(t)))")
          .as("max_tok_len"),
        expr("aggregate(split(text, ' '), 1000000, (acc, t) -> least(acc, length(t)))")
          .as("min_tok_len"),
        // BPE-ish regex tokenization: letter runs, digit runs, and
        // single non-alnum marks each count as one token
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .as("n_bpe_tokens"),
      )

  private val tokenCountSql =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_tokens,
      |  CAST(ceil(n_chars / 4.0) AS BIGINT) AS bpe_estimate,
      |  list_reduce(list_prepend(0, list_transform(string_split(text, ' '), t -> length(t))),
      |    (acc, x) -> greatest(acc, x)) AS max_tok_len,
      |  list_reduce(list_prepend(1000000, list_transform(string_split(text, ' '), t -> length(t))),
      |    (acc, x) -> least(acc, x)) AS min_tok_len,
      |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens
      |FROM documents""".stripMargin

  /** Quality scoring: stopword ratio, average token length, composite
    * score. All ratios are exact-int divisions evaluated identically in
    * both engines.
    */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("double")
    val stopList = Stopwords.map(w => s"'$w'").mkString(", ")
    val nStop = expr(s"size(filter(split(text, ' '), t -> t IN ($stopList)))").cast("double")
    val avgLen = (col("n_chars") - (size(toks) - 1)).cast("double") / size(toks)
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        col("lang"),
        nTok.as("n_tokens"),
        (nStop / nTok).as("stopword_ratio"),
        avgLen.as("avg_token_len"),
        (least(nTok / 100.0, lit(1.0)) * 0.3
          + (lit(1.0) - nStop / nTok) * 0.4
          + least(avgLen / 8.0, lit(1.0)) * 0.3).as("quality_score"),
      )
  }

  private val textQualitySql = {
    val stopList = Stopwords.map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id, lang,
       |  CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
       |  CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stopList))) AS DOUBLE)
       |    / len(string_split(text, ' ')) AS stopword_ratio,
       |  CAST(n_chars - (len(string_split(text, ' ')) - 1) AS DOUBLE)
       |    / len(string_split(text, ' ')) AS avg_token_len,
       |  least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) * 0.3
       |    + (1.0 - CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stopList))) AS DOUBLE)
       |        / len(string_split(text, ' '))) * 0.4
       |    + least((CAST(n_chars - (len(string_split(text, ' ')) - 1) AS DOUBLE)
       |        / len(string_split(text, ' '))) / 8.0, 1.0) * 0.3 AS quality_score
       |FROM documents""".stripMargin
  }

  /** Inverted index: token → sorted postings list of the documents
    * containing it, plus document frequency — the search-engine /
    * retrieval build step. ONE exchange on the token (r10 opt, guide
    * §2.4): the (doc, token) dedup happens INSIDE the aggregation —
    * `collect_set` dedups during partial aggregation, so the separate
    * pre-distinct exchange the r-spelling paid is gone and df falls
    * out as the set size (identical values: sorted distinct doc ids
    * and their count). The per-token buffer is df-sized either way —
    * the exact op's postings ARE df-sized — so this changes exchange
    * count, not the memory class. At 100 TB the postings for
    * stop-word-grade tokens dominate — the standard mitigations (df
    * cutoffs, posting-list sharding by doc range; see
    * [[invertedIndexCapped]]) compose on top of this exact shape.
    */
  def invertedIndex(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ps"))
      .select(col("token"), array_join(col("ps"), ",").as("postings"),
        size(col("ps")).cast("long").as("df"))

  private val invertedIndexSql =
    """SELECT token,
      |  array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings,
      |  count(*) AS df
      |FROM (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      |      FROM documents)
      |GROUP BY 1""".stripMargin

  /** The 100 TB spelling of [[invertedIndex]]: posting lists truncated
    * to the 32 smallest doc ids per token. Two structural upgrades
    * over the exact build — `min_k_distinct` dedups (doc, token)
    * INSIDE the aggregation (deleting the pre-distinct exchange: one
    * corpus shuffle, not two) and bounds every aggregation buffer at
    * O(32), so a stop-word token holds 32 doc ids instead of the
    * corpus. This is the standard df-truncation mitigation the exact
    * op's Scaladoc points at, as its own oracle-checked operator.
    */
  def invertedIndexCapped(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token"))
      .agg(call_function("min_k_distinct", col("doc_id"), lit(32)).as("ps"))
      .select(col("token"), array_join(col("ps"), ",").as("postings"),
        size(col("ps")).cast("long").as("df_kept"))

  private val invertedIndexCappedSql =
    """SELECT token,
      |  array_to_string((list(DISTINCT doc_id ORDER BY doc_id))[1:32], ',')
      |    AS postings,
      |  CAST(least(count(DISTINCT doc_id), 32) AS BIGINT) AS df_kept
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |      FROM documents)
      |GROUP BY 1""".stripMargin

  /** Positional trigram rows through the custom `ngram_explode`
    * Generator ([[graft.functions.NgramExplodeExpr]]): each document's
    * word-3-grams with their positions, generated lazily — no
    * intermediate ngram array in the row. Bounded to a doc subset so
    * the oracle comparison stays small; the corpus-wide form feeds the
    * dedup/decontamination family.
    */
  def ngramExplode(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .where(col("doc_id") < 40)
      .select(col("doc_id"), expr("ngram_explode(text, 3)"))

  private val ngramExplodeSql =
    """SELECT doc_id, CAST(i AS INTEGER) AS pos,
      |  array_to_string(toks[i + 1 : i + 3], ' ') AS ngram
      |FROM (
      |  SELECT doc_id, toks,
      |    unnest(range(0, greatest(len(toks) - 2, 0))) AS i
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
      |        FROM documents WHERE doc_id < 40))""".stripMargin

  /** Sparse cosine document similarity over word-3-gram term
    * frequencies: the classic inverted-index join — pairs meet only
    * through shared grams, never all-pairs. Reference-family op for
    * near-duplicate mining where MinHash recall isn't enough and the
    * corpus needs exact cosine on sparse features.
    *
    * Scale shape — TWO corpus exchanges total (the item_item_cosine
    * discipline):
    *   1. per-doc gram tfs AND the squared norm are computed ROW-LOCAL
    *      by the one-pass codegen'd `gram_tf` kernel (a doc's grams
    *      all live in its row — no `groupBy(doc, gram)` shuffle, no
    *      separate norm aggregation, no gram strings materialized);
    *   2. ONE exchange on the gram hash builds the per-gram posting
    *      list (collect_list of (doc, tf, n2)); the df cap (≤ 50
    *      postings) is a free `size()` filter on that list — a
    *      stopword-ish gram with df=10⁶ would alone emit 10¹² pairs
    *      at corpus scale, so every production sparse-similarity
    *      system caps exactly here, keeping join output linear in
    *      corpus size at the cost of non-discriminative grams that
    *      contribute least to the cosine anyway;
    *   3. pairs explode IN-GROUP (a<b, ≤ df²/2 per gram) carrying
    *      both docs' norms, so the pair exchange groups straight to
    *      the final cosine — no doc-keyed norm joins afterward.
    * All arithmetic stays integral — counts, Σtf², dot — until one
    * double division + sqrt, rounded 1e-9; the 0.05 floor keeps only
    * pairs with real overlap.
    */
  def sparseCosinePairs(spark: SparkSession, dir: String): DataFrame = {
    // gram HASHES are the working keys (one codegen'd byte-scan pass,
    // no gram strings materialize anywhere — the substring_dup_spans
    // discipline); they are internal join/group keys only, never
    // output, so the string-keyed oracle matches value-for-value
    import graft.functions.GraftFunctions.gram_tf
    val postings = Tables.documents(spark, dir)
      .select(col("doc_id"), gram_tf(col("text"), lit(3)).as("gt"))
      .select(col("doc_id"), col("gt.n2").as("n2"),
        explode(col("gt.tfs")).as("e"))
      .groupBy(col("e.g"))
      // capped_collect, not collect_list: a stopword-hot gram must not
      // build an unbounded single-group buffer before the df gate can
      // discard it — the aggregate stops retaining past 51 elements
      // (enough to prove size > 50), so buffer memory is O(cap) per
      // gram no matter the df. Within-cap groups retain everything:
      // output identical to collect_list for every surviving gram.
      .agg(call_function("capped_collect",
        struct(col("doc_id"), col("e.tf").as("tf"), col("n2")), lit(50))
        .as("ps"))
      .where(size(col("ps")) <= 50)
    // r11 (VERDICT r10 #2, guide §4/§2.3): the canonical-pair kernel
    // emits each a<b co-posting pair ONCE with the tf product and both
    // norms — the a×b double explode it replaces generated df² rows
    // (2× the canonical pairs) and re-scanned the postings array per
    // outer row before the a<b filter dropped half.
    val pairs = postings
      .select(explode(call_function("posting_pairs", col("ps"))).as("pr"))
      .select(col("pr.doc_a").as("doc_a"), col("pr.doc_b").as("doc_b"),
        col("pr.p").as("p"), col("pr.na2").as("na2"), col("pr.nb2").as("nb2"))
    pairs
      // na2/nb2 are functions of doc_a/doc_b, so grouping by all four
      // keys is the same grouping — and saves two doc-keyed joins
      .groupBy(col("doc_a"), col("doc_b"), col("na2"), col("nb2"))
      .agg(sum(col("p")).as("dot"))
      .select(col("doc_a"), col("doc_b"), col("dot"),
        // widen BEFORE multiplying: na2*nb2 as longs wraps negative
        // for degenerate high-tf documents (sqrt→NaN would silently
        // drop exactly the long-document near-dupes); double×double
        // is the identical IEEE sequence the oracle runs
        round(col("dot").cast("double")
          / sqrt(col("na2").cast("double") * col("nb2").cast("double")), 9)
          .as("cosine"))
      .where(col("cosine") >= 0.05)
  }

  private val sparseCosinePairsSql =
    """WITH grams AS (
      |  SELECT doc_id, array_to_string(toks[i + 1 : i + 3], ' ') AS g
      |  FROM (
      |    SELECT doc_id, toks,
      |      unnest(range(0, greatest(len(toks) - 2, 0))) AS i
      |    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))),
      |tf AS (SELECT doc_id, g, count(*) AS tf FROM grams GROUP BY 1, 2),
      |norms AS (SELECT doc_id, sum(tf * tf) AS n2 FROM tf GROUP BY 1),
      |keep AS (
      |  SELECT tf.doc_id, tf.g, tf.tf FROM tf
      |  JOIN (SELECT g FROM tf GROUP BY g HAVING count(*) <= 50) d USING (g)),
      |dot AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
      |  FROM keep a JOIN keep b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b, dot, cosine FROM (
      |  SELECT doc_a, doc_b, dot,
      |    round(CAST(dot AS DOUBLE)
      |      / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 9)
      |      AS cosine
      |  FROM dot
      |  JOIN norms na ON na.doc_id = doc_a
      |  JOIN norms nb ON nb.doc_id = doc_b)
      |WHERE cosine >= 0.05""".stripMargin

  /** Gopher-style hard quality GATES — the keep/drop boolean filter
    * stage downstream of [[textQuality]]'s soft score: token-count
    * bounds, mean-token-length band, minimum stop-word fraction, and
    * a long-token-share cap, each emitted as its own flag plus the
    * conjunction (`keep`), so a pipeline can audit WHICH rule dropped
    * a document. Single-pass per-row HOFs, shuffle-free; every ratio
    * is exact-int division in double, so flags are oracle-exact.
    */
  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    val stopList = Stopwords.map(w => s"'$w'").mkString(", ")
    val n = size(split(col("text"), " "))
    val nStop = expr(s"size(filter(split(text, ' '), t -> t IN ($stopList)))")
    val nLong = expr("size(filter(split(text, ' '), t -> length(t) >= 8))")
    val meanLen = (col("n_chars") - (n - 1)).cast("double") / n
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        (n >= 30 && n <= 5000).as("ok_tokens"),
        (meanLen >= lit(4.0) && meanLen <= lit(5.0)).as("ok_word_len"),
        (nStop.cast("double") / n >= lit(0.03)).as("ok_stopwords"),
        (nLong.cast("double") / n <= lit(0.2)).as("ok_long_tokens"))
      .withColumn("keep",
        col("ok_tokens") && col("ok_word_len")
          && col("ok_stopwords") && col("ok_long_tokens"))
  }

  private val gopherRulesSql = {
    val stopList = Stopwords.map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id,
       |  len(string_split(text, ' ')) BETWEEN 30 AND 5000 AS ok_tokens,
       |  CAST(n_chars - (len(string_split(text, ' ')) - 1) AS DOUBLE)
       |    / len(string_split(text, ' ')) BETWEEN 4.0 AND 5.0 AS ok_word_len,
       |  CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stopList)))
       |    AS DOUBLE) / len(string_split(text, ' ')) >= 0.03 AS ok_stopwords,
       |  CAST(len(list_filter(string_split(text, ' '), t -> len(t) >= 8))
       |    AS DOUBLE) / len(string_split(text, ' ')) <= 0.2 AS ok_long_tokens,
       |  (len(string_split(text, ' ')) BETWEEN 30 AND 5000)
       |    AND (CAST(n_chars - (len(string_split(text, ' ')) - 1) AS DOUBLE)
       |      / len(string_split(text, ' ')) BETWEEN 4.0 AND 5.0)
       |    AND (CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stopList)))
       |      AS DOUBLE) / len(string_split(text, ' ')) >= 0.03)
       |    AND (CAST(len(list_filter(string_split(text, ' '), t -> len(t) >= 8))
       |      AS DOUBLE) / len(string_split(text, ' ')) <= 0.2) AS keep
       |FROM documents""".stripMargin
  }

  /** Language-ID via marker-word profile counts (n-gram-heuristic
    * family): per-profile token hits, argmax with deterministic
    * alphabetic tie-break.
    */
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "l_struct" -> Seq("the", "a", "of"),
    "l_query" -> Seq("join", "filter", "window", "query"),
    "l_data" -> Seq("data", "row", "column", "table"),
  )

  /** documents + one count column per language profile + the argmax
    * `pred_lang` — the shared front end of [[langId]] and
    * [[langConfusion]].
    */
  private def langScored(spark: SparkSession, dir: String): DataFrame = {
    val scored = LangMarkers.foldLeft(Tables.documents(spark, dir)) {
      case (df, (lang, markers)) =>
        val list = markers.map(w => s"'$w'").mkString(", ")
        df.withColumn(lang,
          expr(s"size(filter(split(text, ' '), t -> t IN ($list)))"))
    }
    // argmax CASE chain in alphabetical order: branch i fires iff its
    // count is >= every other profile's and > 0 — first branch to fire
    // wins, so ties break to the alphabetically-first profile.
    val langs = LangMarkers.map(_._1).sorted
    val pred = langs.reverse.foldLeft(lit("unknown")) { (acc, l) =>
      val geAll = langs.filter(_ != l)
        .map(o => col(l) >= col(o))
        .foldLeft(col(l) > 0)(_ && _)
      when(geAll, lit(l)).otherwise(acc)
    }
    scored.withColumn("pred_lang", pred)
  }

  def langId(spark: SparkSession, dir: String): DataFrame =
    langScored(spark, dir).select(
      (col("doc_id") +: LangMarkers.map(m => col(m._1))) :+ col("pred_lang"): _*)

  /** The scored-and-predicted relation as SQL (mirrors [[langScored]]):
    * doc_id, lang (the labeled truth), per-profile counts, pred_lang.
    */
  private val langScoredSql = {
    def cnt(markers: Seq[String]) = {
      val list = markers.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(string_split(text, ' '), t -> t IN ($list)))"
    }
    val cols = LangMarkers.map { case (l, m) => s"${cnt(m)} AS $l" }.mkString(",\n  ")
    // same argmax chain, alphabetic-first tie-break
    val sortedLangs = LangMarkers.map(_._1).sorted
    val pred = sortedLangs.reverse.foldLeft("'unknown'") { (acc, l) =>
      val cond = (sortedLangs.filter(_ != l).map(o => s"$l >= $o") :+ s"$l > 0")
        .mkString(" AND ")
      s"CASE WHEN $cond THEN '$l' ELSE $acc END"
    }
    s"""SELECT doc_id, lang, ${LangMarkers.map(_._1).mkString(", ")},
       |  $pred AS pred_lang
       |FROM (SELECT doc_id, lang, text,
       |  $cols
       |FROM documents)""".stripMargin
  }

  private val langIdSql =
    s"""SELECT doc_id, ${LangMarkers.map(_._1).mkString(", ")}, pred_lang
       |FROM ($langScoredSql)""".stripMargin

  /** Language-ID confusion matrix: predicted profile vs the labeled
    * `lang` column, with per-cell counts and the row-normalized rate —
    * the accuracy audit a pipeline runs before trusting a cheap
    * classifier to route 100 TB. Output is |langs|² rows at any corpus
    * size; the count aggregation combines map-side, and the per-label
    * totals it normalizes by are a broadcast-sized second aggregate of
    * the SAME grouped relation (no second corpus pass).
    */
  def langConfusion(spark: SparkSession, dir: String): DataFrame = {
    val cells = langScored(spark, dir)
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(col("lang")).agg(sum(col("n")).as("n_label"))
    cells.join(broadcast(totals), Seq("lang"))
      .select(col("lang"), col("pred_lang"), col("n"),
        round(col("n").cast("double") / col("n_label"), 9).as("rate"))
  }

  private val langConfusionSql =
    s"""WITH scored AS ($langScoredSql),
       |cells AS (
       |  SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
       |  FROM scored GROUP BY 1, 2),
       |totals AS (
       |  SELECT lang, CAST(SUM(n) AS BIGINT) AS n_label FROM cells GROUP BY 1)
       |SELECT lang, pred_lang, n,
       |  round(CAST(n AS DOUBLE) / n_label, 9) AS rate
       |FROM cells JOIN totals USING (lang)""".stripMargin

  /** Winnowing fingerprint (rolling-hash family): word-4-gram hashes,
    * per-window (w=4) minimum over the position-ordered hash sequence,
    * distinct window-minima per doc. The per-doc window is tiny and
    * partitioned by doc_id — parallelism-safe at any corpus size.
    */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(
        when(size(split(col("text"), " ")) >= 4,
          expr("transform(sequence(0, size(split(text, ' ')) - 4), " +
            "i -> concat_ws(' ', slice(split(text, ' '), i + 1, 4)))"))
          .otherwise(array().cast("array<string>"))))
      .select(col("doc_id"), col("pos"),
        CrossHash.hash60(col("col")).as("h"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(0, 3)
    grams.select(col("doc_id"), min(col("h")).over(w).as("fp"))
      .distinct()
  }

  private val docFingerprintSql =
    s"""WITH grams AS (
       |  SELECT doc_id, pos, ${CrossHash.hash60Sql("gram")} AS h
       |  FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(range(0, greatest(len(string_split(text, ' ')) - 3, 0)),
       |        i -> array_to_string((string_split(text, ' '))[i + 1:i + 4], ' '))) AS gram,
       |      unnest(range(0, greatest(len(string_split(text, ' ')) - 3, 0))) AS pos
       |    FROM documents))
       |SELECT DISTINCT doc_id,
       |  min(h) OVER (PARTITION BY doc_id ORDER BY pos
       |               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
       |FROM grams""".stripMargin

  /** Corpus vocabulary induction: top-500 whitespace tokens by corpus
    * frequency with deterministic (count DESC, token ASC) ordering —
    * the first step of any tokenizer-training pipeline. Scale shape:
    * explode → one count exchange (map-side partials collapse the
    * per-partition duplicates) → TakeOrderedAndProject (no global
    * sort).
    */
  def vocabTopTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(500)

  private val vocabTopTokensSql =
    """SELECT token, count(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |WHERE token != ''
      |GROUP BY 1 ORDER BY n DESC, token ASC LIMIT 500""".stripMargin

  /** Dataset profiling: per-source corpus statistics (row count, null
    * rate, distinct langs, length moments) — the health dashboard a
    * 100 TB ingest runs before training. One grouped pass; exact
    * distinct via count(DISTINCT) inside the same aggregation.
    */
  def profileColumns(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("text")).as("n_text"),
        countDistinct(col("lang")).as("n_langs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        sum(col("n_chars")).cast("double").as("sum_chars"))

  private val profileColumnsSql =
    """SELECT source, count(*) AS n_rows, count(text) AS n_text,
      |  count(DISTINCT lang) AS n_langs,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
      |  CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) AS sum_chars
      |FROM documents GROUP BY 1""".stripMargin

  /** Corpus-bigram LM perplexity per document — the model-based
    * quality filter tier above heuristic ratios: estimate
    * P(w2|w1) = c(w1,w2)/c(w1·) from the corpus itself, score each doc
    * by avg log-prob and perplexity. High-ppl docs are the gibberish/
    * boilerplate tail a training pipeline drops.
    *
    * Scale shape: bigrams come from zip-sliced token arrays — pure
    * per-row compute, no positional window, no shuffle to form pairs.
    * Counts aggregate map-side; the conditional denominator is a
    * window sum over the already-aggregated bigram relation (reuses
    * its exchange — the tfidf df pattern); the score join keys on
    * (w1,w2) — vocabulary²-bounded, never doc×doc. Docs with < 2
    * tokens have no bigrams and drop out in both engines. avg_logp
    * rounds at 1e-9 and ppl at 1e-6: double-sum ordering and libm
    * last-ulp differences sit orders of magnitude below both.
    */
  def lmPerplexity(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val bi = t.select(col("doc_id"),
        explode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
    val bg = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      .withColumn("c1", sum(col("c2")).over(Window.partitionBy(col("w1"))))
    // avg_logp is an aggregation-order-dependent double sum → the
    // pagerank discipline (order-free 15-dp decimal terms), and ppl
    // exponentiates the CANONICALIZED 9-dp average so a last-ulp sum
    // or exp() divergence cannot flip the 6-dp output
    bi.join(bg, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum_order_free(log(col("c2").cast("double") / col("c1")))
          / count(lit(1)), 9).as("avg_logp"))
      .select(col("doc_id"), col("n_bigrams"), col("avg_logp"),
        round(exp(-col("avg_logp")), 6).as("ppl"))
  }

  /** Interpolated Kneser–Ney bigram perplexity (Kneser & Ney 1995,
    * Chen & Goodman 1999) — the smoothing the MLE model above cannot
    * provide: P(w₂|w₁) = max(c₁₂−d, 0)/c₁ + (d·N₁₊(w₁·)/c₁)·
    * (N₁₊(·w₂)/B), discount d = 3/4 (exact in binary), continuation
    * probability from distinct-context counts, B = distinct bigram
    * types. The per-document average log-probability is the signal
    * CCNet-style quality bucketing actually wants: unlike raw MLE it
    * doesn't reward memorized high-frequency continuations.
    *
    * Scale shape: all smoothing statistics live on the BIGRAM-TYPE
    * relation (sub-corpus, Heaps' law), windowed by vocabulary keys
    * (w₁ / w₂ — full parallelism); B is a broadcast 1-row scalar; the
    * per-doc average uses the order-free decimal sum over 15-dp terms
    * with the log argument canonicalized at 12 dp (the libm
    * discipline).
    */
  def lmKneserNey(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val bi = t.select(col("doc_id"),
        explode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
    val bg = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val w1w = Window.partitionBy(col("w1"))
    val w2w = Window.partitionBy(col("w2"))
    val bg2 = bg
      .withColumn("c1", sum(col("c2")).over(w1w))
      .withColumn("n1fw", count(lit(1)).over(w1w))
      .withColumn("cont", count(lit(1)).over(w2w))
    val b = bg.agg(count(lit(1)).as("bt"))
    val p = greatest(col("c2") - 0.75, lit(0.0)) / col("c1") +
      lit(0.75) * col("n1fw") / col("c1") *
        (col("cont") / col("bt").cast("double"))
    bi.join(bg2, Seq("w1", "w2")).crossJoin(broadcast(b))
      .select(col("doc_id"), log(round(p, 12)).as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum_order_free(col("lp")) / count(lit(1)), 9).as("avg_logp"))
      .select(col("doc_id"), col("n_bigrams"), col("avg_logp"),
        round(exp(-col("avg_logp")), 6).as("ppl"))
  }

  private val lmKneserNeySql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |bi AS (
      |  SELECT doc_id,
      |    unnest(toks[1:len(toks) - 1]) AS w1,
      |    unnest(toks[2:len(toks)]) AS w2
      |  FROM t),
      |bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bi GROUP BY 1, 2),
      |bg2 AS (
      |  SELECT w1, w2, c2,
      |    CAST(SUM(c2) OVER (PARTITION BY w1) AS BIGINT) AS c1,
      |    CAST(count(*) OVER (PARTITION BY w1) AS BIGINT) AS n1fw,
      |    CAST(count(*) OVER (PARTITION BY w2) AS BIGINT) AS cont
      |  FROM bg),
      |b AS (SELECT CAST(count(*) AS BIGINT) AS bt FROM bg),
      |lp AS (
      |  SELECT doc_id,
      |    ln(round(greatest(c2 - 0.75, 0.0) / c1
      |      + 0.75 * n1fw / c1 * (cont / CAST(bt AS DOUBLE)), 12)) AS lp
      |  FROM bi JOIN bg2 USING (w1, w2) CROSS JOIN b)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |  round(CAST(SUM(CAST(round(lp, 15) AS DECIMAL(28,15))) AS DOUBLE)
      |    / count(*), 9) AS avg_logp,
      |  round(exp(-round(CAST(SUM(CAST(round(lp, 15) AS DECIMAL(28,15)))
      |    AS DOUBLE) / count(*), 9)), 6) AS ppl
      |FROM lp GROUP BY 1""".stripMargin

  // shared with WebCuration.perplexityBuckets (CTE reuse — an edit to
  // the perplexity spec cannot leave the bucket oracle validating a
  // stale model)
  private[operators] val lmPerplexitySql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |bi AS (
      |  SELECT doc_id,
      |    unnest(toks[1:len(toks) - 1]) AS w1,
      |    unnest(toks[2:len(toks)]) AS w2
      |  FROM t),
      |bg AS (
      |  SELECT w1, w2, count(*) AS c2,
      |    SUM(count(*)) OVER (PARTITION BY w1) AS c1
      |  FROM bi GROUP BY 1, 2)
      |SELECT bi.doc_id, count(*) AS n_bigrams,
      |  round(CAST(SUM(CAST(round(ln(CAST(bg.c2 AS DOUBLE) / bg.c1), 15)
      |    AS DECIMAL(28,15))) AS DOUBLE) / count(*), 9) AS avg_logp,
      |  round(exp(-round(CAST(SUM(CAST(round(ln(CAST(bg.c2 AS DOUBLE) / bg.c1), 15)
      |    AS DECIMAL(28,15))) AS DOUBLE) / count(*), 9)), 6) AS ppl
      |FROM bi JOIN bg USING (w1, w2)
      |GROUP BY 1""".stripMargin

  /** Declarative data-quality gate (the Deequ/expectations shape): one
    * row per constraint with the measured metric and a pass verdict —
    * the validation report a pipeline publishes before letting a batch
    * into training. Checks: key uniqueness, completeness (non-null
    * share), domain membership, and a range constraint.
    *
    * Scale shape: every metric folds in ONE pass over the table
    * (conditional aggregation — no per-check scans); the uniqueness
    * check rides the same pass as approx_count_distinct at 100 TB, or
    * the exact two-level count used here while the key fits a shuffle.
    */
  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val metrics = docs.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("doc_id")).as("n_keys"),
      sum(when(col("text").isNotNull, 1L).otherwise(0L)).as("n_text"),
      sum(when(col("lang").isin("en", "de", "fr", "es", "zh"), 1L)
        .otherwise(0L)).as("n_lang_ok"),
      sum(when(col("n_chars") > 0 && col("n_chars") <= 100000, 1L)
        .otherwise(0L)).as("n_len_ok"))
    val m = metrics.select(
      array(
        struct(lit("doc_id_unique").as("check"),
          col("n_keys").cast("double").as("metric"),
          (col("n_keys") === col("n_rows")).as("pass")),
        struct(lit("text_complete").as("check"),
          (col("n_text").cast("double") / col("n_rows")).as("metric"),
          (col("n_text") === col("n_rows")).as("pass")),
        struct(lit("lang_in_domain").as("check"),
          (col("n_lang_ok").cast("double") / col("n_rows")).as("metric"),
          (col("n_lang_ok") === col("n_rows")).as("pass")),
        struct(lit("n_chars_in_range").as("check"),
          (col("n_len_ok").cast("double") / col("n_rows")).as("metric"),
          (col("n_len_ok") === col("n_rows")).as("pass"))).as("checks"))
    m.select(explode(col("checks")).as("c"))
      .select(col("c.check"), round(col("c.metric"), 9).as("metric"), col("c.pass"))
  }

  private val dqChecksSql =
    """WITH m AS (
      |  SELECT count(*) AS n_rows,
      |    count(DISTINCT doc_id) AS n_keys,
      |    CAST(SUM(CASE WHEN text IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_text,
      |    CAST(SUM(CASE WHEN lang IN ('en','de','fr','es','zh') THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_ok,
      |    CAST(SUM(CASE WHEN n_chars > 0 AND n_chars <= 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_len_ok
      |  FROM documents)
      |SELECT 'doc_id_unique' AS "check", round(CAST(n_keys AS DOUBLE), 9) AS metric,
      |  n_keys = n_rows AS pass FROM m
      |UNION ALL
      |SELECT 'text_complete', round(CAST(n_text AS DOUBLE) / n_rows, 9),
      |  n_text = n_rows FROM m
      |UNION ALL
      |SELECT 'lang_in_domain', round(CAST(n_lang_ok AS DOUBLE) / n_rows, 9),
      |  n_lang_ok = n_rows FROM m
      |UNION ALL
      |SELECT 'n_chars_in_range', round(CAST(n_len_ok AS DOUBLE) / n_rows, 9),
      |  n_len_ok = n_rows FROM m""".stripMargin

  /** BM25 relevance of every document against a fixed keyword query —
    * the retrieval scorer a RAG/eval pipeline runs over a curated
    * corpus (Robertson-Spärck Jones idf, k1=1.2 b=0.75). Candidates =
    * docs containing ≥1 query term; no LIMIT, so output is order-free.
    *
    * Scale shape: token explode filters to the query terms BEFORE the
    * (doc,term) aggregation, so the shuffle carries only matching
    * postings; df and the corpus stats are term-/scalar-sized
    * broadcasts. Float parity: per-term scores round at 1e-9 then
    * accumulate as DECIMAL — exact, order-insensitive addition (the
    * Mobility pattern); every double expression is the same SQL text
    * in both engines.
    */
  def bm25Rank(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val stats = docs.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
      .where(col("tok").isin(Bm25Query: _*))
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfRel = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfRel), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", expr("CAST(tot AS DOUBLE) / n_docs"))
      .withColumn("s", expr(s"CAST(round($Bm25TermSql, 9) AS DECIMAL(24,9))"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"), sum(col("s")).as("sc"))
      .select(col("doc_id"), col("n_hits"),
        expr("CAST(sc AS DOUBLE)").as("bm25"))
  }

  private val Bm25Query = Seq("hash", "join", "scan", "vector")

  /** Per-(doc,term) BM25 contribution — identical text runs in Spark
    * and DuckDB so the doubles match bit-for-bit before rounding.
    */
  private val Bm25TermSql =
    "ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))" +
      " * ((CAST(tf AS DOUBLE) * 2.2)" +
      " / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))))"

  private val bm25RankSql = {
    val terms = Bm25Query.map(t => s"'$t'").mkString(", ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |dd AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM d),
       |stats AS (SELECT count(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS tot FROM dd),
       |tf AS (
       |  SELECT doc_id, dl, tok, count(*) AS tf
       |  FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM dd)
       |  WHERE tok IN ($terms)
       |  GROUP BY 1, 2, 3),
       |dfr AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
       |scored AS (
       |  SELECT doc_id,
       |    CAST(round($Bm25TermSql, 9) AS DECIMAL(24,9)) AS s
       |  FROM tf JOIN dfr USING (tok)
       |  CROSS JOIN (SELECT n_docs, tot, CAST(tot AS DOUBLE) / n_docs AS avgdl
       |              FROM stats))
       |SELECT doc_id, count(*) AS n_hits, CAST(SUM(s) AS DOUBLE) AS bm25
       |FROM scored GROUP BY 1""".stripMargin
  }

  /** Per-document token-level Shannon entropy (nats) — the diversity/
    * repetition quality signal next to gopher_rules: low entropy means
    * a repetitive or boilerplate document. H = ln(n) − Σ tf·ln(tf) / n
    * avoids per-term probabilities, so the only floats are ln of small
    * integers.
    *
    * Scale shape: one (doc,token) aggregation with map-side partials,
    * then a per-doc rollup — the token_count family's shape. The
    * Σ tf·ln(tf) accumulates as round-9 DECIMAL (exact, order-free).
    */
  def tokenEntropy(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(expr(
          "CAST(round(CAST(tf AS DOUBLE) * ln(CAST(tf AS DOUBLE)), 9) AS DECIMAL(24,9))"))
          .as("s"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        expr("round(ln(CAST(n_tokens AS DOUBLE)) - CAST(s AS DOUBLE) / n_tokens, 6)")
          .as("entropy_nats"))

  private val tokenEntropySql =
    """WITH tf AS (
      |  SELECT doc_id, tok, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY 1, 2)
      |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
      |  count(*) AS n_distinct,
      |  round(ln(CAST(CAST(SUM(tf) AS BIGINT) AS DOUBLE))
      |    - CAST(SUM(CAST(round(CAST(tf AS DOUBLE) * ln(CAST(tf AS DOUBLE)), 9)
      |                    AS DECIMAL(24,9))) AS DOUBLE)
      |      / CAST(SUM(tf) AS BIGINT), 6) AS entropy_nats
      |FROM tf GROUP BY 1""".stripMargin

  /** Corpus collocations by pointwise mutual information over adjacent
    * token pairs — the statistic a tokenizer/vocab-merge step ranks
    * candidate merges with. pmi = ln(p(ab) / (p(a)·p(b))) on corpus
    * counts; pairs seen < 5 times are noise and drop (so no LIMIT /
    * order dependence in the output).
    *
    * Scale shape: bigrams are zip-sliced per row (lm_perplexity's
    * shape — no positional shuffle); unigram and bigram counts
    * aggregate map-side; the two count joins are vocabulary-sized
    * broadcasts; corpus totals are scalar.
    */
  def pmiBigrams(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val uniToks = t.select(explode(col("toks")).as("tok"))
    val uni = uniToks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val bi = t.select(
        explode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
      .select(col("b.w1"), col("b.w2"))
    // m (total bigram instances) folds from the pre-filter pair counts:
    // the same subtree as `big`, so its exchange is reused — never a
    // second corpus explode.
    val big0 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val big = big0.where(col("c2") >= 5)
    val stats = uni.agg(sum(col("c")).as("nt"))
      .crossJoin(big0.agg(sum(col("c2")).as("m")))
    big
      .join(broadcast(uni.select(col("tok").as("w1"), col("c").as("ca"))), "w1")
      .join(broadcast(uni.select(col("tok").as("w2"), col("c").as("cb"))), "w2")
      .crossJoin(broadcast(stats))
      .select(col("w1"), col("w2"), col("c2"), col("ca"), col("cb"),
        expr(s"round($PmiSql, 9)").as("pmi"))
  }

  /** Identical-text PMI double expression (see [[Bm25TermSql]]). */
  private val PmiSql =
    "ln(CAST(c2 AS DOUBLE) * nt * nt / ((CAST(m AS DOUBLE) * ca) * cb))"

  private val pmiBigramsSql =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |uni AS (
       |  SELECT tok, count(*) AS c
       |  FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY 1),
       |bi AS (
       |  SELECT unnest(toks[1:len(toks) - 1]) AS w1,
       |    unnest(toks[2:len(toks)]) AS w2
       |  FROM t),
       |big0 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2),
       |big AS (SELECT * FROM big0 WHERE c2 >= 5),
       |stats AS (
       |  SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM uni) AS nt,
       |         (SELECT CAST(SUM(c2) AS BIGINT) FROM big0) AS m),
       |j AS (
       |  SELECT w1, w2, c2, ua.c AS ca, ub.c AS cb
       |  FROM big
       |  JOIN uni ua ON big.w1 = ua.tok
       |  JOIN uni ub ON big.w2 = ub.tok)
       |SELECT w1, w2, c2, ca, cb, round($PmiSql, 9) AS pmi
       |FROM j CROSS JOIN stats""".stripMargin

  /** Per-document n-gram novelty — the marginal-contribution signal a
    * curation pipeline ranks sources by: of a document's DISTINCT token
    * 4-grams, how many does it OWN (its doc_id is the minimum over all
    * docs containing that gram)? Processing docs in id order, novelty
    * is the fraction of a doc's grams not seen before it — near-dup
    * tails and boilerplate-heavy sources score low and get downweighted.
    *
    * Scale shape: per-doc distinct gram hashes built row-locally (zero
    * dedup exchange), ONE exchange on the 8-byte hash for the
    * min-owner window, then a per-doc count aggregation. No joins,
    * never doc×doc; same skew bound as [[substringDupSpans]]
    * (count/min windows carry no payload).
    */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftFunctions.gram_hash_set
    // per-doc DISTINCT gram hashes are built row-locally in one
    // codegen'd byte-scan ([[graft.functions.GramHashSetExpr]]) — no
    // corpus-wide distinct exchange at all; hashes are internal group
    // keys only, so the oracle's string grams match without sharing
    // the hash function
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(gram_hash_set(col("text"), lit(4))).as("h"))
    grams
      .withColumn("owner", min(col("doc_id")).over(Window.partitionBy(col("h"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("owner") === col("doc_id"), 1)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_grams")).as("novelty"))
  }

  private val ngramNoveltySql =
    s"""WITH grams AS (
       |  SELECT DISTINCT doc_id, ${CrossHash.hash60Sql("gram")} AS h
       |  FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(range(0, greatest(len(string_split(text, ' ')) - 3, 0)),
       |        i -> array_to_string((string_split(text, ' '))[i + 1:i + 4], ' '))) AS gram
       |    FROM documents)),
       |owned AS (
       |  SELECT doc_id, min(doc_id) OVER (PARTITION BY h) AS owner FROM grams)
       |SELECT doc_id, count(*) AS n_grams,
       |  count(*) FILTER (WHERE owner = doc_id) AS n_novel,
       |  CAST(count(*) FILTER (WHERE owner = doc_id) AS DOUBLE) / count(*) AS novelty
       |FROM owned GROUP BY 1""".stripMargin

  /** Top-20 corpus tokens via the Misra–Gries heavy-hitters sketch
    * ([[graft.functions.MisraGriesAgg]]) — the sketch form of
    * vocab_top_tokens: map-side partials carry ONE ≤capacity-entry
    * summary per partition through the exchange instead of the full
    * token-count relation, the property that matters when the
    * vocabulary (not just the corpus) outgrows memory at 100 TB.
    *
    * Capacity 4096 far exceeds this corpus's vocabulary, so the
    * summary degenerates to the exact count map (order-independent —
    * see the aggregate's determinism note) and the oracle checks it
    * exactly; the sub-capacity approximate regime is bound-checked in
    * R7OpsSpec.
    */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "")
      .agg(call_function("heavy_hitters", col("token"), lit(4096)).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.token").as("token"), col("e.est").as("est"))
      .orderBy(col("est").desc, col("token").asc)
      .limit(20)

  private val heavyHittersSql =
    """SELECT token, count(*) AS est
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |WHERE token != ''
      |GROUP BY 1 ORDER BY est DESC, token ASC LIMIT 20""".stripMargin

  /** The hashing trick (Weinberger et al. 2009): every token maps to
    * one of 64 signed buckets via the portable content hash — the
    * fixed-width, vocabulary-free document feature vector that feeds
    * linear classifiers at corpus scale (no dictionary to build, ship,
    * or grow). The signed second hash makes collisions cancel in
    * expectation instead of biasing upward. Output stays long-form
    * (doc_id, bucket, v) — ≤64 rows per document, zero dense padding.
    *
    * Scale shape: explode → ONE map-side-combined (doc, bucket)
    * aggregation; no joins, no windows, no broadcast.
    */
  def featureHashing(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .where(col("tok") =!= "")
      .select(col("doc_id"),
        (CrossHash.hash60(col("tok")) % 64).as("bucket"),
        when(CrossHash.hash60Seeded(col("tok"), 1) % 2 === 0, lit(1L))
          .otherwise(lit(-1L)).as("sgn"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(sum(col("sgn")).as("v"))

  private val featureHashingSql =
    s"""SELECT doc_id, ${CrossHash.hash60Sql("tok")} % 64 AS bucket,
       |  CAST(SUM(CASE WHEN ${CrossHash.hash60SeededSql("tok", 1)} % 2 = 0
       |    THEN 1 ELSE -1 END) AS BIGINT) AS v
       |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |      FROM documents)
       |WHERE tok != ''
       |GROUP BY 1, 2""".stripMargin

  /** Zipf's-law fit of the corpus rank-frequency curve: OLS of
    * ln(freq) on ln(rank) over the top-500 vocabulary (the
    * [[vocabTopTokens]] relation), emitting slope (the Zipf exponent,
    * ≈ −1 for natural language), intercept, and R² — the one-row
    * corpus-health diagnostic that flags template-dominated or
    * synthetic text before training.
    *
    * Scale shape: the corpus contributes exactly one token-count
    * exchange with map-side partials, collapsed to 500 rows by
    * TakeOrderedAndProject; the rank window and the OLS moment
    * aggregation run over that BOUNDED 500-row set (documented
    * bounded-domain window, never corpus-sized). Cross-engine
    * determinism: ln outputs canonicalize at 12 dp before the moment
    * sums (libm last-ulp discipline), the five sums are order-free
    * DECIMAL accumulations, and the closed-form slope/intercept/R² are
    * then exact functions of identical inputs.
    */
  def zipfFit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = vocabTopTokens(spark, dir)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("token").asc)))
    val xy = ranked.select(
      round(log(col("rank").cast("double")), 12).as("x"),
      round(log(col("n").cast("double")), 12).as("y"))
    val m = xy.agg(
      count(lit(1)).as("k"),
      sum_order_free(col("x")).as("sx"),
      sum_order_free(col("y")).as("sy"),
      sum_order_free(col("x") * col("x")).as("sxx"),
      sum_order_free(col("y") * col("y")).as("syy"),
      sum_order_free(col("x") * col("y")).as("sxy"))
    val kd = col("k").cast("double")
    val cov = kd * col("sxy") - col("sx") * col("sy")
    val varx = kd * col("sxx") - col("sx") * col("sx")
    val vary = kd * col("syy") - col("sy") * col("sy")
    m.select(col("k").as("n_tokens"),
      round(cov / varx, 9).as("slope"),
      round((col("sy") - (cov / varx) * col("sx")) / kd, 9).as("intercept"),
      round(cov * cov / (varx * vary), 9).as("r2"))
  }

  private val zipfFitSql =
    s"""WITH tf AS ($vocabTopTokensSql),
       |r AS (
       |  SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS rank
       |  FROM tf),
       |xy AS (
       |  SELECT round(ln(CAST(rank AS DOUBLE)), 12) AS x,
       |    round(ln(CAST(n AS DOUBLE)), 12) AS y
       |  FROM r),
       |m AS (
       |  SELECT CAST(count(*) AS BIGINT) AS k,
       |    CAST(SUM(CAST(round(x, 15) AS DECIMAL(28,15))) AS DOUBLE) AS sx,
       |    CAST(SUM(CAST(round(y, 15) AS DECIMAL(28,15))) AS DOUBLE) AS sy,
       |    CAST(SUM(CAST(round(x * x, 15) AS DECIMAL(28,15))) AS DOUBLE) AS sxx,
       |    CAST(SUM(CAST(round(y * y, 15) AS DECIMAL(28,15))) AS DOUBLE) AS syy,
       |    CAST(SUM(CAST(round(x * y, 15) AS DECIMAL(28,15))) AS DOUBLE) AS sxy
       |  FROM xy)
       |SELECT k AS n_tokens,
       |  round((k * sxy - sx * sy) / (k * sxx - sx * sx), 9) AS slope,
       |  round((sy - ((k * sxy - sx * sy) / (k * sxx - sx * sx)) * sx) / k, 9)
       |    AS intercept,
       |  round((k * sxy - sx * sy) * (k * sxy - sx * sy)
       |    / ((k * sxx - sx * sx) * (k * syy - sy * sy)), 9) AS r2
       |FROM m""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("token_count", tokenCount, Some(tokenCountSql)),
    Op("feature_hashing", featureHashing, Some(featureHashingSql)),
    Op("zipf_fit", zipfFit, Some(zipfFitSql)),
    Op("heavy_hitters", heavyHitters, Some(heavyHittersSql)),
    Op("ngram_novelty", ngramNovelty, Some(ngramNoveltySql), bench = true),
    Op("lm_perplexity", lmPerplexity, Some(lmPerplexitySql)),
    Op("lm_kneser_ney", lmKneserNey, Some(lmKneserNeySql)),
    Op("text_quality", textQuality, Some(textQualitySql), bench = true),
    Op("gopher_rules", gopherRules, Some(gopherRulesSql)),
    Op("inverted_index", invertedIndex, Some(invertedIndexSql), bench = true),
    Op("inverted_index_capped", invertedIndexCapped,
      Some(invertedIndexCappedSql)),
    Op("ngram_explode", ngramExplode, Some(ngramExplodeSql)),
    Op("lang_id", langId, Some(langIdSql)),
    Op("lang_confusion", langConfusion, Some(langConfusionSql)),
    Op("doc_fingerprint", docFingerprint, Some(docFingerprintSql)),
    Op("vocab_top_tokens", vocabTopTokens, Some(vocabTopTokensSql)),
    Op("profile_columns", profileColumns, Some(profileColumnsSql)),
    Op("dq_checks", dqChecks, Some(dqChecksSql)),
    Op("bm25_rank", bm25Rank, Some(bm25RankSql)),
    Op("token_entropy", tokenEntropy, Some(tokenEntropySql)),
    Op("pmi_bigrams", pmiBigrams, Some(pmiBigramsSql)),
    Op("sparse_cosine_pairs", sparseCosinePairs, Some(sparseCosinePairsSql),
      bench = true),
  )
}
