package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Op, Tables}
import graft.functions.GraftFunctions.sum_order_free

/** Model-based quality filtering — the fasttext-style classifier gate
  * most public LLM corpora (CCNet, RefinedWeb, FineWeb) run after the
  * rule-based gates (`gopher_rules`): score every document with a
  * linear model over cheap text features, keep above a threshold.
  * Both the APPLICATION (`quality_classifier`) and the TRAINING
  * (`logreg_train` — distributed batch gradient descent) live
  * in-engine, so the whole loop runs where the data is.
  *
  * Cross-engine determinism: the sigmoid's argument is rounded to 9 dp
  * before `exp` and the score to 6 dp after (a last-ulp `exp`/`ln`
  * divergence between libm implementations cannot flip a 9/6-dp
  * boundary except within ~1e-8 of it); every gradient/loss SUM uses
  * the order-free round-15 → DECIMAL discipline (`sum_order_free` —
  * the pagerank lesson), and weights re-canonicalize at 12 dp between
  * rounds exactly like pagerank's rank vector.
  */
object Classifier {

  private def toks: Column = split(col("text"), " ")

  /** The four features (all ratios of exact integers — deterministic):
    * length in kchars, tokens in hectotokens, stopword ratio, distinct
    * ratio. Spelled IDENTICALLY in [[featSql]].
    */
  private def features(df: DataFrame, extra: Column*): DataFrame =
    df.select((col("doc_id") +: extra) ++ Seq(
      (col("n_chars").cast("double") / 1000).as("x1"),
      (size(toks).cast("double") / 100).as("x2"),
      (size(filter(toks, t => t.isin("the", "a", "of", "and"))).cast("double")
        / size(toks)).as("x3"),
      (size(array_distinct(toks)).cast("double") / size(toks)).as("x4")): _*)

  private val featColsSql =
    """CAST(n_chars AS DOUBLE)/1000 AS x1,
      |  CAST(len(string_split(text, ' ')) AS DOUBLE)/100 AS x2,
      |  CAST(len(list_filter(string_split(text, ' '),
      |    t -> t IN ('the', 'a', 'of', 'and'))) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS x3,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS x4""".stripMargin

  private val featSql =
    s"""SELECT doc_id,
       |  $featColsSql
       |FROM documents""".stripMargin

  /** Fixed published-style weights (a stand-in for a trained model's
    * coefficients; `logreg_train` below is how they'd be fit).
    */
  private def zCol: Column =
    lit(-1.0) + lit(2.4) * col("x1") + lit(0.8) * col("x2") +
      lit(6.0) * col("x3") - lit(1.5) * col("x4")

  private val zSql = "-1.0 + 2.4*x1 + 0.8*x2 + 6.0*x3 - 1.5*x4"

  /** The ONE 6-dp score expression every operator in this file gates,
    * bins, ranks, and evaluates — spelled once (Scala + SQL pair) so a
    * discipline change cannot leave e.g. [[calibrationBins]] auditing
    * a different score than [[qualityClassifier]] applies.
    */
  private def scoreCol: Column =
    round(lit(1.0) / (lit(1.0) + exp(-round(zCol, 9))), 6)

  private val scoreSql = s"round(1.0/(1.0 + exp(-round($zSql, 9))), 6)"

  /** Apply the quality model: score = σ(w·x) per document, keep above
    * 0.5. Pure row-local arithmetic fused into the scan — the filter
    * a 100 TB curation pass runs at full scan bandwidth.
    */
  def qualityClassifier(spark: SparkSession, dir: String): DataFrame =
    features(Tables.documents(spark, dir))
      .withColumn("score", scoreCol)
      .select(col("doc_id"), col("score"), (col("score") > 0.5).as("keep"))

  private val qualityClassifierSql =
    s"""WITH feat AS ($featSql)
       |SELECT doc_id,
       |  $scoreSql AS score,
       |  $scoreSql > 0.5 AS keep
       |FROM feat""".stripMargin

  // ------------------------------------------------------------ training

  private val Rounds = 3

  /** σ(wx + b) with the 9-dp ARGUMENT canonicalization (the same
    * discipline as [[scoreCol]] — review r14 caught the argument going
    * into exp unrounded here, contradicting the header contract), then
    * clamped to [1e-9, 1−1e-9] so a saturated sigmoid cannot feed
    * log(0) into the loss: Spark's log(0) = NULL would silently DROP
    * the row's loss term while DuckDB's ln(0) = -inf errors in the
    * DECIMAL cast — both engines now see the same finite value. The
    * clamp only binds at |wx+b| ≳ 21, far outside the fixture's range,
    * so fixture results are unchanged.
    */
  private def sigma(w: Column, b: Column, x: Column): Column =
    least(greatest(
      round(lit(1.0) / (lit(1.0) + exp(-round(w * x + b, 9))), 9),
      lit(1e-9)), lit(0.999999999))

  /** Distributed batch-gradient-descent training of a one-feature
    * logistic model (label: lang = 'en', feature: length in kchars) —
    * the `kmeansIterate`/`pagerank` shape applied to supervised
    * training. Each round is ONE aggregation over the corpus (gradient
    * sums combine map-side; `sum_order_free` keeps them
    * aggregation-order-free) and the 1-row weight state broadcasts
    * back — no driver loop state, the whole training unrolls into one
    * lazy plan. Emits (round, w, b, loss): loss is the log-loss at the
    * round's STARTING weights (the same σ pass the gradient uses), so
    * its strict descent across rows is the convergence audit.
    *
    * At 100 TB this is exactly mini-batch GD with batch = corpus:
    * the per-round cost is a scan + one scalar aggregate; a real run
    * adds features, not structure.
    */
  def logregTrain(spark: SparkSession, dir: String): DataFrame = {
    val feat = Tables.documents(spark, dir)
      .select((col("n_chars").cast("double") / 1000).as("x"),
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
    var state = spark.range(1)
      .select(lit(0.0).as("w"), lit(0.0).as("b"))
    val rows = (1 to Rounds).map { r =>
      val s = sigma(col("w"), col("b"), col("x"))
      val g = feat.crossJoin(broadcast(state))
        .groupBy(col("w"), col("b"))
        .agg(
          (sum_order_free((s - col("y")) * col("x")) / count(lit(1))).as("gw"),
          (sum_order_free(s - col("y")) / count(lit(1))).as("gb"),
          round(sum_order_free(-(col("y") * log(s)
            + (lit(1.0) - col("y")) * log(lit(1.0) - s)))
            / count(lit(1)), 9).as("loss"))
        .select(round(col("w") - col("gw"), 12).as("w"),
          round(col("b") - col("gb"), 12).as("b"), col("loss"))
      state = g.select(col("w"), col("b"))
      g.select(lit(r).as("round"), col("w"), col("b"), col("loss"))
    }
    rows.reduce(_ unionAll _)
  }

  private def trainRoundSql(i: Int): String = {
    val sig = "least(greatest(round(1.0/(1.0+exp(-round(w*x + b, 9))), 9), 1e-9), 0.999999999)"
    s"""g$i AS (
       |  SELECT round(w - CAST(SUM(CAST(round(($sig - y)*x, 15)
       |      AS DECIMAL(28,15))) AS DOUBLE)/count(*), 12) AS w,
       |    round(b - CAST(SUM(CAST(round($sig - y, 15)
       |      AS DECIMAL(28,15))) AS DOUBLE)/count(*), 12) AS b,
       |    round(CAST(SUM(CAST(round(-(y*ln($sig) + (1.0-y)*ln(1.0-$sig)), 15)
       |      AS DECIMAL(28,15))) AS DOUBLE)/count(*), 9) AS loss
       |  FROM feat CROSS JOIN it${i - 1} GROUP BY w, b),
       |it$i AS (SELECT w, b FROM g$i)""".stripMargin
  }

  private val logregTrainSql =
    s"""WITH feat AS (
       |  SELECT CAST(n_chars AS DOUBLE)/1000 AS x,
       |    CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE)
       |         ELSE CAST(0.0 AS DOUBLE) END AS y
       |  FROM documents),
       |it0 AS (SELECT CAST(0.0 AS DOUBLE) AS w, CAST(0.0 AS DOUBLE) AS b),
       |${(1 to Rounds).map(trainRoundSql).mkString(",\n")}
       |${(1 to Rounds).map(i => s"SELECT $i AS round, w, b, loss FROM g$i")
          .mkString("\nUNION ALL\n")}""".stripMargin

  /** Reliability diagram for the quality model: scores bucketed into
    * fixed-width 0.1 bins, each bin reporting its document count, mean
    * predicted score, and empirical positive rate (label: lang = 'en',
    * the [[logregTrain]] target) — the calibration audit run before a
    * classifier's threshold is trusted to gate a corpus.
    *
    * Scale shape: the bin key is a stateless row-local expression (no
    * ranking, no quantiles), so the whole diagram is ONE map-side-
    * combined aggregation to ≤10 rows. Mean scores use the order-free
    * decimal sum; the positive rate is a ratio of exact integers.
    */
  def calibrationBins(spark: SparkSession, dir: String): DataFrame =
    features(Tables.documents(spark, dir),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      .withColumn("score",
        scoreCol)
      .groupBy(floor(col("score") * 10).cast("int").as("bin"))
      .agg(count(lit(1)).as("n"),
        round(sum_order_free(col("score")) / count(lit(1)), 9).as("mean_score"),
        round(sum(col("y")).cast("double") / count(lit(1)), 9).as("pos_rate"))

  private val calibrationBinsSql =
    s"""WITH feat AS (
       |  SELECT doc_id,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
       |    CAST(n_chars AS DOUBLE)/1000 AS x1,
       |    CAST(len(string_split(text, ' ')) AS DOUBLE)/100 AS x2,
       |    CAST(len(list_filter(string_split(text, ' '),
       |      t -> t IN ('the', 'a', 'of', 'and'))) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS x3,
       |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS x4
       |  FROM documents),
       |scored AS (
       |  SELECT y, $scoreSql AS score
       |  FROM feat)
       |SELECT CAST(floor(score * 10) AS INTEGER) AS bin,
       |  CAST(count(*) AS BIGINT) AS n,
       |  round(CAST(SUM(CAST(round(score, 15) AS DECIMAL(28,15))) AS DOUBLE)
       |    / count(*), 9) AS mean_score,
       |  round(CAST(SUM(y) AS DOUBLE) / count(*), 9) AS pos_rate
       |FROM scored GROUP BY 1""".stripMargin

  /** Preference-pair construction (the DPO/RLHF data shape): within
    * each source, pair the 3 highest-scoring documents against the 3
    * lowest-scoring ones as (chosen, rejected) with the score margin —
    * the mechanical step that turns a scored corpus into preference
    * training data when no human labels exist (model-ranked pairs).
    *
    * Scale shape: both extremes come from ONE aggregation using the
    * bounded-heap `topk_pairs` (bottom-k = top-k of the negated
    * score) — no window, no per-source sort, state 2×3 pairs per
    * source; the 3×3 pair expansion is a row-local nested explode of
    * that |sources|-row relation.
    */
  def preferencePairs(spark: SparkSession, dir: String): DataFrame = {
    val scored = features(Tables.documents(spark, dir), col("source"))
      .select(col("source"), col("doc_id"),
        scoreCol.as("score"))
    scored.groupBy(col("source"))
      .agg(
        call_function("topk_pairs", col("score"), col("doc_id"), lit(3))
          .as("top"),
        call_function("topk_pairs", -col("score"), col("doc_id"), lit(3))
          .as("bot"))
      .select(col("source"), explode(col("top")).as("c"), col("bot"))
      .select(col("source"), col("c"), explode(col("bot")).as("r"))
      .select(col("source"),
        col("c.id").as("chosen_doc"), col("r.id").as("rejected_doc"),
        col("c.score").as("chosen_score"), (-col("r.score")).as("rejected_score"),
        round(col("c.score") + col("r.score"), 6).as("margin"))
      .where(col("chosen_doc") =!= col("rejected_doc") && col("margin") > 0)
  }

  private val preferencePairsSql =
    s"""WITH scored AS (
       |  SELECT source, doc_id,
       |    $scoreSql AS score
       |  FROM (SELECT doc_id, source, $featColsSql FROM documents)),
       |ranked AS (
       |  SELECT source, doc_id, score,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY score DESC, doc_id ASC) AS rt,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY score ASC, doc_id ASC) AS rb
       |  FROM scored)
       |SELECT t.source, t.doc_id AS chosen_doc, b.doc_id AS rejected_doc,
       |  t.score AS chosen_score, b.score AS rejected_score,
       |  round(t.score - b.score, 6) AS margin
       |FROM ranked t JOIN ranked b
       |  ON t.source = b.source AND t.rt <= 3 AND b.rb <= 3
       |WHERE t.doc_id != b.doc_id AND round(t.score - b.score, 6) > 0""".stripMargin

  /** Exact tie-aware ROC AUC of the quality score against the lang =
    * 'en' label — the rank-sum (Mann–Whitney) identity AUC =
    * (R₁ − n₁(n₁+1)/2)/(n₁n₀) with MIDRANKS for tied scores, computed
    * entirely in integer arithmetic: per distinct score, 2·midrank =
    * 2·(count below) + n + 1 is an exact long, so the one rounding
    * step is the final division. The eval metric that belongs next to
    * [[calibrationBins]] before a gate threshold is chosen.
    *
    * Scale shape: scores collapse to the distinct-score relation in
    * one map-side-combined exchange; the "count below" prefix runs the
    * cusum/shard_pack DISTRIBUTED prefix shape (sampled score-range
    * buckets → in-bucket exclusive window + bounded per-bucket offsets
    * broadcast) — never a global single-partition window, no matter
    * how many distinct scores the corpus has. Cut sampling steers
    * BALANCE only: ties stay in one group, so any cut set yields the
    * same AUC.
    */
  def aucScore(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = features(Tables.documents(spark, dir),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      .select(col("y"),
        scoreCol.as("score"))
    val g = scored.groupBy(col("score"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("npos"))
    val cuts = RangeRank.sampleCutsMemo(s"auc.score:$dir",
      scored.select(col("score")), "score")
    val wIn = Window.partitionBy(col("b")).orderBy(col("score").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wOff = Window.orderBy(col("b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val keyed = g.withColumn("b", RangeRank.bucketAsc("score", cuts))
      .withColumn("cum_in", coalesce(sum(col("n")).over(wIn), lit(0L)))
    val offs = keyed.groupBy(col("b")).agg(sum(col("n")).as("bt"))
      .withColumn("off", coalesce(sum(col("bt")).over(wOff), lit(0L)))
      .select(col("b"), col("off"))
    // review r14: contrib ≈ 2·npos·N and r1x2 ≈ 2·n1·N overflow BIGINT
    // once n1·N > ~4.6e18 (the multi-billion-row regime the docstring
    // promises) — ride DECIMAL(38,0), which is exact and order-free;
    // a single-label corpus (n0 = 0 or n1 = 0) yields NULL on both
    // engines (nullif), not Infinity-vs-NULL divergence
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    keyed.join(broadcast(offs), Seq("b"))
      .select(col("n"), col("npos"),
        (col("npos").cast(d38)
          * (lit(2) * (col("off") + col("cum_in")) + col("n") + 1))
          .as("contrib"))
      .agg(sum(col("npos")).as("n1"), sum(col("n") - col("npos")).as("n0"),
        sum(col("contrib")).as("r1x2"))
      .select(col("n1").as("n_pos"), col("n0").as("n_neg"),
        round((col("r1x2") - col("n1").cast(d38) * (col("n1") + 1)).cast("double")
          / nullif(lit(2.0) * col("n1") * col("n0"), lit(0.0)), 9).as("auc"))
  }

  private val aucScoreSql =
    s"""WITH feat AS (
       |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y, $featColsSql
       |  FROM documents),
       |scored AS (
       |  SELECT y, $scoreSql AS score
       |  FROM feat),
       |g AS (
       |  SELECT score, CAST(count(*) AS BIGINT) AS n,
       |    CAST(SUM(y) AS BIGINT) AS npos
       |  FROM scored GROUP BY 1),
       |c AS (
       |  SELECT n, npos,
       |    CAST(COALESCE(SUM(n) OVER (ORDER BY score ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS cum
       |  FROM g)
       |SELECT CAST(SUM(npos) AS BIGINT) AS n_pos,
       |  CAST(SUM(n - npos) AS BIGINT) AS n_neg,
       |  round(CAST(SUM(CAST(npos AS DECIMAL(38,0)) * (2 * cum + n + 1))
       |      - CAST(CAST(SUM(npos) AS BIGINT) AS DECIMAL(38,0))
       |        * (CAST(SUM(npos) AS BIGINT) + 1)
       |      AS DOUBLE)
       |    / nullif(2.0 * CAST(SUM(npos) AS BIGINT)
       |        * CAST(SUM(n - npos) AS BIGINT), 0.0),
       |    9) AS auc
       |FROM c""".stripMargin

  /** Brier score of the quality model against the lang = 'en' label,
    * with the climatology reference (base·(1−base)) and the skill
    * score 1 − brier/ref — the mean-squared counterpart of
    * [[aucScore]]: AUC measures ranking, Brier measures probability
    * accuracy, and only the pair tells you whether a model is
    * mis-ranked, mis-calibrated, or both. One map-side-combined
    * scalar aggregation; squared errors ride the order-free decimal
    * sum; base-rate terms are exact integer ratios.
    */
  def brierScore(spark: SparkSession, dir: String): DataFrame =
    features(Tables.documents(spark, dir),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      .select(col("y"), scoreCol.as("score"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        round(sum_order_free((col("score") - col("y"))
          * (col("score") - col("y"))) / count(lit(1)), 9).as("brier"))
      .select(col("n"), col("n_pos"), col("brier"),
        round((col("n_pos").cast("double") / col("n"))
          * (lit(1.0) - col("n_pos").cast("double") / col("n")), 9).as("brier_ref"))
      .withColumn("skill",
        round(lit(1.0) - col("brier")
          / nullif(col("brier_ref"), lit(0.0)), 9))

  private val brierScoreSql =
    s"""WITH feat AS (
       |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y, $featColsSql
       |  FROM documents),
       |scored AS (SELECT y, $scoreSql AS score FROM feat),
       |m AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS n_pos,
       |    round(CAST(SUM(CAST(round((score - y) * (score - y), 15)
       |      AS DECIMAL(28,15))) AS DOUBLE) / count(*), 9) AS brier
       |  FROM scored)
       |SELECT n, n_pos, brier,
       |  round((CAST(n_pos AS DOUBLE) / n)
       |    * (1.0 - CAST(n_pos AS DOUBLE) / n), 9) AS brier_ref,
       |  round(1.0 - brier / nullif(round((CAST(n_pos AS DOUBLE) / n)
       |    * (1.0 - CAST(n_pos AS DOUBLE) / n), 9), 0.0), 9) AS skill
       |FROM m""".stripMargin

  /** Leave-one-out target encoding of the `source` category against
    * the lang = 'en' label: enc_i = (Σ_src y − y_i)/(n_src − 1) — the
    * standard leakage-free categorical feature for downstream models
    * (each document's own label is excluded from its encoding).
    *
    * Scale shape: one grouped aggregate collapses to |sources| rows,
    * broadcasts back, and the encoding is a pure row-local expression.
    * A singleton category yields NULL (0/0 guarded by nullif) rather
    * than a fabricated value, on both engines.
    */
  def targetEncoding(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
    val g = d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_src"), sum(col("y")).as("s_src"))
    d.join(broadcast(g), Seq("source"))
      .select(col("doc_id"), col("source"), col("y"),
        round((col("s_src") - col("y")).cast("double")
          / nullif(col("n_src") - 1, lit(0)), 9).as("enc"))
  }

  private val targetEncodingSql =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y
      |  FROM documents),
      |g AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_src,
      |    CAST(SUM(y) AS BIGINT) AS s_src
      |  FROM d GROUP BY 1)
      |SELECT doc_id, d.source, y,
      |  round(CAST(s_src - y AS DOUBLE) / nullif(n_src - 1, 0), 9) AS enc
      |FROM d JOIN g ON d.source = g.source""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("quality_classifier", qualityClassifier, Some(qualityClassifierSql)),
    Op("auc_score", aucScore, Some(aucScoreSql)),
    Op("brier_score", brierScore, Some(brierScoreSql)),
    Op("target_encoding", targetEncoding, Some(targetEncodingSql)),
    Op("logreg_train", logregTrain, Some(logregTrainSql)),
    Op("calibration_bins", calibrationBins, Some(calibrationBinsSql)),
    Op("preference_pairs", preferencePairs, Some(preferencePairsSql)),
  )
}
