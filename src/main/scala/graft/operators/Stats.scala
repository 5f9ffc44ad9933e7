package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Op, Tables}

/** Inferential statistics over the test tables — the experiment-readout
  * family next to ab_test / spearman_corr / ks_test: independence
  * (chi-square), rank-sum location shift (Mann-Whitney), per-group OLS,
  * CUSUM drift detection, and equi-depth histograms.
  *
  * Cross-engine exactness discipline (the corr_covar / spearman_corr
  * playbook): every sum rides an exact DECIMAL accumulator (order-free),
  * counts stay integer, and the handful of final divisions/sqrts are
  * spelled as the IDENTICAL operation tree on both engines, rounded
  * 1e-9. DuckDB bare decimal literals are DECIMAL (exact arithmetic),
  * so oracle SQL only uses integer literals or CAST(... AS DOUBLE) —
  * the Spatial.HexSql lesson.
  */
object Stats {

  /** Largest distinct-value support the rank-test global windows
    * (ks_test, mann_whitney_u) accept before failing loudly: one
    * million support rows is still a comfortably bounded
    * single-partition window; a continuous-valued column blowing past
    * it must pre-bucket instead of silently single-partitioning the
    * corpus (r6 verdict #7).
    */
  val MaxWindowSupport: Long = 1000000L

  // ---------------------------------------------------------------- chi²

  /** Chi-square test of independence between document `lang` and
    * `source` (is the language mix the same across ingest sources? —
    * the mixture-drift gate next to ks_test's length drift).
    *
    * Zero cells matter: the contingency table is the CROSS JOIN of the
    * two margins (|langs| × |sources| — catalog-sized, broadcast), left
    * joined against observed counts, so an absent (lang, source) cell
    * contributes its full expected count. Per-cell terms use the
    * cross-multiplied integer numerator d = O·N − rowtot·coltot (exact
    * BIGINT), one fixed double sequence (d/rt)·(d/ct)/N per cell, then
    * terms are quantized to DECIMAL(32,12) so the cross-cell sum is
    * order-free. One row out: chi2, dof, n.
    */
  def chiSquare(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val rt = docs.groupBy(col("lang")).agg(count(lit(1)).as("rt"))
    val ct = docs.groupBy(col("source")).agg(count(lit(1)).as("ct"))
    val obs = docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("o"))
    val tot = docs.agg(count(lit(1)).as("n"))
    rt.crossJoin(ct)
      .join(obs, Seq("lang", "source"), "left")
      .crossJoin(broadcast(tot))
      .select(col("lang"), col("source"), col("rt"), col("ct"), col("n"),
        (coalesce(col("o"), lit(0L)) * col("n") - col("rt") * col("ct"))
          .as("d"))
      .select(col("lang"), col("source"), col("n"),
        ((col("d").cast("double") / col("rt"))
          * (col("d").cast("double") / col("ct")) / col("n")).as("term"))
      .agg(
        round(sum(round(col("term"), 12).cast(DecimalType(32, 12)))
          .cast("double"), 9).as("chi2"),
        ((countDistinct(col("lang")) - 1)
          * (countDistinct(col("source")) - 1)).as("dof"),
        first(col("n")).as("n"))
  }

  private val chiSquareSql =
    """WITH rt AS (SELECT lang, count(*) AS rt FROM documents GROUP BY 1),
      |ct AS (SELECT source, count(*) AS ct FROM documents GROUP BY 1),
      |obs AS (SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
      |tot AS (SELECT count(*) AS n FROM documents),
      |cells AS (
      |  SELECT rt.lang, ct.source, rt.rt, ct.ct, tot.n,
      |    coalesce(obs.o, 0) * tot.n - rt.rt * ct.ct AS d
      |  FROM rt CROSS JOIN ct CROSS JOIN tot
      |  LEFT JOIN obs ON obs.lang = rt.lang AND obs.source = ct.source),
      |terms AS (
      |  SELECT lang, source, n,
      |    (CAST(d AS DOUBLE) / rt) * (CAST(d AS DOUBLE) / ct) / n AS term
      |  FROM cells)
      |SELECT
      |  round(CAST(SUM(CAST(round(term, 12) AS DECIMAL(32,12))) AS DOUBLE), 9)
      |    AS chi2,
      |  CAST((count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1)
      |    AS BIGINT) AS dof,
      |  any_value(n) AS n
      |FROM terms""".stripMargin

  // ------------------------------------------------------ Mann-Whitney U

  /** Two-sample Mann-Whitney U (Wilcoxon rank-sum) between src0 and
    * src1 document lengths — the location-shift complement to ks_test's
    * whole-distribution D statistic, with tie-corrected normal
    * approximation (no continuity correction; documented).
    *
    * Rank sums never touch a per-row window: lengths collapse to their
    * distinct values first (ks_test's trick), and a value with c
    * occurrences after `cb` earlier rows has 2·avgrank = 2·cb + c + 1 —
    * so 2R₀ = Σ a_v·(2·cb_v + c_v + 1) is EXACT integer arithmetic, as
    * is the tie term T = Σ(c³−c). The cumulative window runs over the
    * |support| relation (value-domain-sized, deliberately
    * single-partition, like ks_test). One division chain at the end on
    * the 1-row result, identical on both engines, rounded 1e-9.
    */
  def mannWhitneyU(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.documents(spark, dir)
      .where(col("source").isin("src0", "src1"))
      .groupBy(col("n_chars").as("v"))
      .agg(count(when(col("source") === "src0", 1)).as("a"),
        count(when(col("source") === "src1", 1)).as("b"))
      .select(col("v"), col("a"), col("b"), (col("a") + col("b")).as("c"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // runtime guard on the bounded-domain assumption (r6 verdict #7),
    // the ks_test twin: the support count rides the same final agg (no
    // extra pass) and trips before the result row is emitted
    g.select(col("v"), col("a"), col("b"), col("c"),
        coalesce(sum(col("c")).over(w), lit(0L)).as("cb"))
      .agg(
        sum(col("a")).cast("long").as("n0"),
        sum(col("b")).cast("long").as("n1"),
        count(lit(1)).as("sup"),
        sum(col("a") * (lit(2) * col("cb") + col("c") + 1)).cast("long")
          .as("r20"),
        sum(col("c") * col("c") * col("c") - col("c")).cast("long").as("t"))
      .where(when(col("sup") <= Stats.MaxWindowSupport, lit(true))
        .otherwise(raise_error(concat(
          lit("mann_whitney_u: support cardinality "), col("sup"),
          lit(" exceeds the bounded-domain contract — a continuous " +
            "column must pre-bucket before this window")))))
      .select(col("n0"), col("n1"),
        (col("r20") - col("n0") * (col("n0") + 1)).as("u2"),
        (col("n0") + col("n1")).as("nn"), col("t"))
      .select(col("n0"), col("n1"),
        round(col("u2").cast("double") / 2, 9).as("u_stat"),
        round((col("u2").cast("double") - (col("n0") * col("n1")).cast("double"))
          / (lit(2) * sqrt((col("n0").cast("double") * col("n1") / 12)
            * ((col("nn") + 1).cast("double")
              - col("t").cast("double")
                / (col("nn").cast("double") * (col("nn") - 1).cast("double"))))),
          9).as("z"))
  }

  private val mannWhitneyUSql =
    """WITH g AS (
      |  SELECT n_chars AS v,
      |    count(*) FILTER (WHERE source = 'src0') AS a,
      |    count(*) FILTER (WHERE source = 'src1') AS b,
      |    count(*) AS c
      |  FROM documents WHERE source IN ('src0', 'src1') GROUP BY 1),
      |cum AS (
      |  SELECT v, a, b, c,
      |    coalesce(SUM(c) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      |  FROM g),
      |s AS (
      |  SELECT CAST(SUM(a) AS BIGINT) AS n0, CAST(SUM(b) AS BIGINT) AS n1,
      |    CAST(SUM(a * (2 * cb + c + 1)) AS BIGINT) AS r20,
      |    CAST(SUM(c * c * c - c) AS BIGINT) AS t
      |  FROM cum),
      |u AS (
      |  SELECT n0, n1, r20 - n0 * (n0 + 1) AS u2, n0 + n1 AS nn, t FROM s)
      |SELECT n0, n1,
      |  round(CAST(u2 AS DOUBLE) / 2, 9) AS u_stat,
      |  round((CAST(u2 AS DOUBLE) - CAST(n0 * n1 AS DOUBLE))
      |    / (2 * sqrt((CAST(n0 AS DOUBLE) * n1 / 12)
      |      * (CAST(nn + 1 AS DOUBLE)
      |        - CAST(t AS DOUBLE)
      |          / (CAST(nn AS DOUBLE) * CAST(nn - 1 AS DOUBLE))))), 9) AS z
      |FROM u""".stripMargin

  // ------------------------------------------------------ per-group OLS

  /** Per-return-flag ordinary least squares of extendedprice on
    * quantity: slope, intercept, R² — the regression readout next to
    * corr_covar's correlation. One exchange on the group key; the five
    * moment sums ride exact DECIMAL accumulators ((18,6)² products are
    * DECIMAL(37,12) — fully representable, the anomaly_zscore
    * quantization contract; the ORACLE spells the same products at
    * width 19 because DuckDB multiplies width-18 decimals in int64
    * storage, which overflows on price² — int128 kicks in at 19, and
    * the VALUES are identical either way), and slope/intercept/R²
    * derive from the exact moments through one shared division
    * (sl = dxy/dxx) spelled identically on both engines, rounded 1e-9.
    */
  def olsRegression(spark: SparkSession, dir: String): DataFrame = {
    val d6 = DecimalType(18, 6)
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        col("l_quantity").cast(d6).as("x"),
        col("l_extendedprice").cast(d6).as("y"))
    li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        sum(col("x") * col("y")).cast("double").as("sxy"),
        sum(col("y") * col("y")).cast("double").as("syy"))
      .select(col("l_returnflag"), col("n"), col("sx"), col("sy"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("dxy"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("dxx"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("dyy"))
      .select(col("l_returnflag"), col("n"), col("sx"), col("sy"),
        (col("dxy") / col("dxx")).as("sl"), col("dxy"), col("dyy"))
      .select(col("l_returnflag"), col("n"),
        round(col("sl"), 9).as("slope"),
        round((col("sy") - col("sl") * col("sx")) / col("n"), 9)
          .as("intercept"),
        round(col("sl") * (col("dxy") / col("dyy")), 9).as("r2"))
  }

  private val olsRegressionSql =
    """WITH m AS (
      |  SELECT l_returnflag, count(*) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))
      |      * CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))
      |      * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6))
      |      * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS syy
      |  FROM lineitem GROUP BY 1),
      |d AS (
      |  SELECT l_returnflag, n, sx, sy,
      |    n * sxy - sx * sy AS dxy,
      |    n * sxx - sx * sx AS dxx,
      |    n * syy - sy * sy AS dyy
      |  FROM m),
      |sl AS (
      |  SELECT l_returnflag, n, sx, sy, dxy / dxx AS sl, dxy, dyy FROM d)
      |SELECT l_returnflag, n,
      |  round(sl, 9) AS slope,
      |  round((sy - sl * sx) / n, 9) AS intercept,
      |  round(sl * (dxy / dyy), 9) AS r2
      |FROM sl""".stripMargin

  // ------------------------------------------------------------- CUSUM

  /** One-sided CUSUM drift detector per event type: flag events where
    * the cumulative positive deviation from the type mean exceeds
    * 20·stddev. The textbook recursion S_i = max(0, S_{i-1} + d_i) is
    * not a window aggregate — but its closed form IS: S_i = P_i −
    * min_{j≤i} P_j over the deviation prefix sum P, which makes CUSUM
    * two frame-bounded windows on one event_type exchange.
    *
    * Exactness: deviations are quantized to 6-dp LONG MICROS before
    * the cumulative sum (DuckDB's windowed double sum runs on a
    * segment tree whose addition ORDER differs from Spark's sequential
    * frame — integer accumulation is order-free, so the prefix sums
    * match exactly, and integer window sums stay in primitive codegen
    * where the earlier DECIMAL(18,6) form paid per-row object
    * arithmetic); the mean/threshold derive from exact decimal
    * moments, are rounded to 6 dp, and the final comparison is
    * integer-exact on both engines. The micros pass through
    * DECIMAL(18,6)·10⁶ so the long conversion is exact (never a
    * double→long cast — Spark truncates where DuckDB rounds).
    */
  def cusumChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val d6 = DecimalType(18, 6)
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
    val m = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(d6)).cast("double").as("s"),
        sum(col("value").cast(d6) * col("value").cast(d6)).cast("double")
          .as("ss"))
      .select(col("event_type"),
        round(col("s") / col("n"), 6).as("m6"),
        (round(lit(20) * sqrt((col("ss") - col("s") * col("s") / col("n"))
          / (col("n") - 1)), 6).cast(d6) * 1000000).cast("long").as("h"))
    // Distributed prefix shape (r7, the equi_depth/gini class):
    // |event_type| = 5 would bound the naive per-type running windows
    // at 5 tasks over the whole events relation. Instead rows bucket
    // by sampled ts range cuts (balance only — ties stay together, so
    // any cut set yields the same answer); ONE (type, bucket) exchange
    // carries the in-bucket running sum s and running min-of-s mn;
    // per-bucket totals/minima re-aggregate on the SAME partitioning
    // (no second corpus exchange), cumulate over the bounded
    // |types| × buckets relation, and broadcast back:
    //   P_i  = off_b + s_i
    //   min_{j≤i} P_j = least(minP_{<b}, off_b + mn_i)
    // — integer-exact longs throughout, so bucketing cannot change a
    // single output value.
    val cuts = RangeRank.sampleCutsMemo(s"cusum.events.ts:$dir",
      ev.select(col("ts")), "ts")
    val keyed = ev.join(broadcast(m), Seq("event_type"))
      .select(col("event_type"), col("event_id"), col("ts"), col("h"),
        (round(col("value") - col("m6"), 6).cast(d6) * 1000000).cast("long")
          .as("d"))
      .withColumn("b", RangeRank.bucketAsc("ts", cuts))
    val wIn = Window.partitionBy(col("event_type"), col("b"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val windowed = keyed
      .withColumn("s", sum(col("d")).over(wIn))
      .withColumn("mn", min(col("s")).over(wIn))
    val wOff = Window.partitionBy(col("event_type")).orderBy(col("b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = windowed.groupBy(col("event_type"), col("b"))
      .agg(sum(col("d")).as("bt"), min(col("s")).as("bmin"))
      .withColumn("off", coalesce(sum(col("bt")).over(wOff), lit(0L)))
      // min over earlier buckets of (that bucket's offset + its min
      // prefix): cumulate (off_k + bmin_k) exclusively
      .withColumn("minP", min(col("off") + col("bmin")).over(wOff))
      .select(col("event_type"), col("b"), col("off"), col("minP"))
    windowed.join(broadcast(offs), Seq("event_type", "b"))
      .withColumn("p", col("off") + col("s"))
      .withColumn("cus",
        col("p") - least(col("minP"), col("off") + col("mn")))
      .where(col("cus") > col("h"))
      .select(col("event_type"), col("event_id"),
        round(col("cus").cast("double") / 1000000, 6).as("cusum"))
  }

  private val cusumChangepointSql =
    """WITH m AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6))
      |      * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS ss
      |  FROM events GROUP BY 1),
      |th AS (
      |  SELECT event_type, round(s / n, 6) AS m6,
      |    CAST(CAST(round(20 * sqrt((ss - s * s / n) / (n - 1)), 6)
      |      AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS h
      |  FROM m),
      |d AS (
      |  SELECT e.event_type, e.event_id, e.ts, th.h,
      |    CAST(CAST(round(e.value - th.m6, 6) AS DECIMAL(18,6))
      |      * 1000000 AS BIGINT) AS d
      |  FROM events e JOIN th ON e.event_type = th.event_type),
      |pre AS (
      |  SELECT event_type, event_id, ts, h,
      |    SUM(d) OVER (PARTITION BY event_type ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
      |  FROM d),
      |c AS (
      |  SELECT event_type, event_id, h,
      |    p - MIN(p) OVER (PARTITION BY event_type ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cus
      |  FROM pre)
      |SELECT event_type, event_id,
      |  round(CAST(cus AS DOUBLE) / 1000000, 6) AS cusum
      |FROM c WHERE cus > h""".stripMargin

  // ------------------------------------------------- equi-depth buckets

  /** Equi-depth decile histogram of extendedprice per return flag —
    * the frequency-balanced complement to histogram_bins' equi-width
    * buckets (what an optimizer's depth histogram or a feature
    * quantizer computes). The decile over a FULLY deterministic order
    * (price, orderkey, linenumber breaks ties identically on both
    * engines) is NOT a per-flag ntile window — |returnflag| = 3 would
    * bound the sort parallelism at 3 tasks over the whole fact table
    * (r6 verdict #3). It's the grouped distributed rank
    * ([[RangeRank.withRankAscGrouped]]: globally sampled price
    * buckets × flags, per-(flag, bucket) windows) fed through the
    * closed-form ntile — same hash as the oracle's ntile(10), fact
    * table never sorts on |groups| tasks. Bucket stats are integer
    * counts, exact min/max, and a DECIMAL-summed mean.
    */
  def equiDepthHistogram(spark: SparkSession, dir: String): DataFrame = {
    val slim = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").as("p"))
    RangeRank.withRankAscGrouped(slim, Seq("l_returnflag"), "p",
        Seq(col("l_orderkey").asc, col("l_linenumber").asc), "rnk",
        totalOut = Some("ntot"))
      .withColumn("bucket",
        RangeRank.ntileFromRank(col("rnk"), col("ntot"), 10).cast("long"))
      .groupBy(col("l_returnflag"), col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("p")).as("lo"), max(col("p")).as("hi"),
        round(sum(col("p").cast(DecimalType(18, 2))).cast("double")
          / count(lit(1)), 9).as("avg_price"))
  }

  private val equiDepthHistogramSql =
    """SELECT l_returnflag, bucket, count(*) AS n_rows,
      |  min(p) AS lo, max(p) AS hi,
      |  round(CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) / count(*), 9)
      |    AS avg_price
      |FROM (
      |  SELECT l_returnflag, l_extendedprice AS p,
      |    CAST(ntile(10) OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS BIGINT)
      |      AS bucket
      |  FROM lineitem)
      |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------------- Gini

  /** Gini coefficient of customer lifetime spend per market segment —
    * the inequality readout next to pareto_contribution's ABC shares.
    * Uses the rank identity G = (2·Σ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) over
    * ascending per-segment ranks (ties broken by custkey — determinism
    * only; any tie order yields the same G for equal values). The rank
    * is NOT a per-segment row_number window — |segments| = 5 would
    * bound the sort parallelism at 5 tasks (r6 verdict #3); it's the
    * grouped distributed rank ([[RangeRank.withRankAscGrouped]]),
    * identical values by construction. Spend and the rank-weighted sum
    * ride exact DECIMAL accumulators; the final expression is one
    * fixed double sequence, rounded 1e-9.
    */
  def giniIndex(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("sp0"))
      .select(col("o_custkey"), col("sp0").cast(DecimalType(18, 2)).as("sp"))
    val joined = Tables.customer(spark, dir)
      .join(spend, col("c_custkey") === col("o_custkey"))
      .select(col("c_mktsegment"), col("c_custkey"), col("sp"))
    // cuts sampled from the pre-join spend relation: same key values,
    // and the eager approxQuantile action never executes the join
    // (cutoffs steer balance only, never the answer)
    val cuts = RangeRank.sampleCuts(spend.select(col("sp")), Seq("sp"))("sp")
    RangeRank.withRankAscGrouped(joined, Seq("c_mktsegment"), "sp",
        Seq(col("c_custkey").asc), "rnk", cuts = Some(cuts))
      .withColumn("i", col("rnk").cast(DecimalType(10, 0)))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("sp")).cast("double").as("ssp"),
        sum(col("i") * col("sp")).cast("double").as("six"))
      .select(col("c_mktsegment"), col("n"),
        round(col("ssp"), 2).as("total_spend"),
        round((lit(2) * col("six") - (col("n") + 1) * col("ssp"))
          / (col("n") * col("ssp")), 9).as("gini"))
  }

  private val giniIndexSql =
    """WITH spend AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
      |      AS sp
      |  FROM orders GROUP BY 1),
      |r AS (
      |  SELECT c_mktsegment, sp,
      |    CAST(row_number() OVER (PARTITION BY c_mktsegment
      |      ORDER BY sp ASC, c_custkey ASC) AS DECIMAL(10,0)) AS i
      |  FROM customer JOIN spend ON c_custkey = o_custkey),
      |m AS (
      |  SELECT c_mktsegment, count(*) AS n,
      |    CAST(SUM(sp) AS DOUBLE) AS ssp,
      |    CAST(SUM(i * sp) AS DOUBLE) AS six
      |  FROM r GROUP BY 1)
      |SELECT c_mktsegment, n, round(ssp, 2) AS total_spend,
      |  round((2 * six - (n + 1) * ssp) / (n * ssp), 9) AS gini
      |FROM m""".stripMargin

  // ---------------------------------------------------------- Benford

  /** Benford first-digit audit of order totals: observed share of each
    * leading significant digit vs the Benford expectation log₁₀(1+1/d)
    * — the classic synthetic-data / fraud smoke test. Digit extraction
    * is pure arithmetic (bucketed single division then floor — NO
    * log₁₀ in the row path, whose libm ulps straddle integer
    * boundaries exactly at powers of ten); expectations are spliced
    * constants from one host computation. Counts are integer; shares
    * one division each, rounded 1e-9.
    */
  def benfordDigits(spark: SparkSession, dir: String): DataFrame = {
    val p = col("o_totalprice")
    val mant = when(p >= 100000, p / 100000).when(p >= 10000, p / 10000)
      .when(p >= 1000, p / 1000).when(p >= 100, p / 100)
      .when(p >= 10, p / 10).otherwise(p)
    val expected = (1 to 9).foldLeft(lit(0.0)) { (acc, d) =>
      when(col("digit") === d, lit(math.log10(1.0 + 1.0 / d))).otherwise(acc)
    }
    val tot = Tables.orders(spark, dir).agg(count(lit(1)).as("total"))
    Tables.orders(spark, dir)
      .select(floor(mant).cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("total"), 9).as("share"),
        round(expected, 9).as("expected"))
      .withColumn("abs_dev", round(abs(col("share") - col("expected")), 9))
  }

  private val benfordDigitsSql = {
    val expected = (1 to 9)
      .map(d => s"WHEN digit = $d THEN CAST(${math.log10(1.0 + 1.0 / d)} AS DOUBLE)")
      .mkString("CASE ", " ", " ELSE CAST(0 AS DOUBLE) END")
    s"""WITH d AS (
       |  SELECT CAST(floor(CASE
       |      WHEN o_totalprice >= 100000 THEN o_totalprice / 100000
       |      WHEN o_totalprice >= 10000 THEN o_totalprice / 10000
       |      WHEN o_totalprice >= 1000 THEN o_totalprice / 1000
       |      WHEN o_totalprice >= 100 THEN o_totalprice / 100
       |      WHEN o_totalprice >= 10 THEN o_totalprice / 10
       |      ELSE o_totalprice END) AS BIGINT) AS digit
       |  FROM orders),
       |g AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
       |tot AS (SELECT count(*) AS total FROM orders),
       |s AS (
       |  SELECT digit, n,
       |    round(CAST(n AS DOUBLE) / total, 9) AS share,
       |    round($expected, 9) AS expected
       |  FROM g CROSS JOIN tot)
       |SELECT digit, n, share, expected,
       |  round(abs(share - expected), 9) AS abs_dev
       |FROM s""".stripMargin
  }

  // ------------------------------------------------- categorical entropy

  /** Shannon entropy of the source mix within each language — the
    * grouped categorical-diversity gauge (is a language fed by many
    * sources or dominated by one?), alongside token_entropy's per-doc
    * lexical version. Same exactness identity: H = ln(n) − Σ c·ln(c)/n
    * with each c·ln(c) term rounded to 9 dp and DECIMAL-summed
    * (order-free), final value rounded 1e-6; evenness normalizes by
    * ln(k) over the observed category count.
    */
  def categoryEntropy(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("c"))
      .groupBy(col("lang"))
      .agg(sum(col("c")).cast("long").as("n_docs"),
        count(lit(1)).as("k"),
        sum(expr(
          "CAST(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)), 9) AS DECIMAL(24,9))"))
          .as("s"))
      .select(col("lang"), col("n_docs"), col("k"),
        expr("round(ln(CAST(n_docs AS DOUBLE)) - CAST(s AS DOUBLE) / n_docs, 6)")
          .as("entropy"),
        when(col("k") < 2, lit(0.0))
          .otherwise(expr("round((ln(CAST(n_docs AS DOUBLE)) - " +
            "CAST(s AS DOUBLE) / n_docs) / ln(CAST(k AS DOUBLE)), 6)"))
          .as("evenness"))
  }

  private val categoryEntropySql =
    """WITH g AS (
      |  SELECT lang, source, count(*) AS c FROM documents GROUP BY 1, 2),
      |m AS (
      |  SELECT lang, CAST(SUM(c) AS BIGINT) AS n_docs, count(*) AS k,
      |    SUM(CAST(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)), 9)
      |      AS DECIMAL(24,9))) AS s
      |  FROM g GROUP BY 1)
      |SELECT lang, n_docs, k,
      |  round(ln(CAST(n_docs AS DOUBLE)) - CAST(s AS DOUBLE) / n_docs, 6)
      |    AS entropy,
      |  CASE WHEN k < 2 THEN CAST(0 AS DOUBLE)
      |    ELSE round((ln(CAST(n_docs AS DOUBLE)) - CAST(s AS DOUBLE) / n_docs)
      |      / ln(CAST(k AS DOUBLE)), 6) END AS evenness
      |FROM m""".stripMargin

  // ----------------------------------------------------- autocorrelation

  /** Autocorrelation of the daily-revenue series at lags 1–7 — the
    * weekly-rhythm detector feeding forecast/backfill decisions. The
    * series first collapses to one row per day (value-domain-sized);
    * deviations from the 6-dp-rounded mean are quantized to
    * DECIMAL(18,6), so every lag product and the denominator are EXACT
    * decimal sums (the cusum discipline — no engine-order or
    * segment-tree effects), with one rounded division per lag. The lag
    * windows run over the day-domain relation, deliberately
    * single-partition like ks_test.
    */
  def acfLags(spark: SparkSession, dir: String): DataFrame = {
    val d6 = DecimalType(18, 6)
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("v"))
    val m = daily.agg(count(lit(1)).as("nd"),
        sum(col("v")).cast("double").as("sv"))
      .select(col("nd"), round(col("sv") / col("nd"), 6).as("m6"))
    val w = Window.orderBy(col("day"))
    val dev = daily.crossJoin(broadcast(m))
      .select(col("day"), col("nd"),
        round(col("v").cast("double") - col("m6"), 6).cast(d6).as("d"))
    val lagged = (1 to 7).foldLeft(dev) { (df, k) =>
      df.withColumn(s"d$k", lag(col("d"), k).over(w))
    }
    val aggs = sum(col("d") * col("d")).cast("double").as("den") +:
      (1 to 7).map(k =>
        sum(col("d") * col(s"d$k")).cast("double").as(s"num$k"))
    lagged.groupBy(col("nd"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("nd").as("n_days")
        +: (1 to 7).map(k =>
          round(col(s"num$k") / col("den"), 9).as(s"acf_$k")): _*)
  }

  private val acfLagsSql = {
    val lagCols = (1 to 7)
      .map(k => s"lag(d, $k) OVER (ORDER BY day) AS d$k").mkString(",\n|    ")
    val nums = (1 to 7)
      .map(k => s"CAST(SUM(d * d$k) AS DOUBLE) AS num$k").mkString(",\n|    ")
    val accs = (1 to 7)
      .map(k => s"round(num$k / den, 9) AS acf_$k").mkString(",\n|  ")
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day,
       |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS v
       |  FROM orders GROUP BY 1),
       |m AS (
       |  SELECT count(*) AS nd,
       |    round(CAST(SUM(v) AS DOUBLE) / count(*), 6) AS m6
       |  FROM daily),
       |dev AS (
       |  SELECT day, nd,
       |    CAST(round(CAST(v AS DOUBLE) - m6, 6) AS DECIMAL(19,6)) AS d
       |  FROM daily CROSS JOIN m),
       |lagged AS (
       |  SELECT day, nd, d,
       |    $lagCols
       |  FROM dev),
       |s AS (
       |  SELECT nd, CAST(SUM(d * d) AS DOUBLE) AS den,
       |    $nums
       |  FROM lagged GROUP BY 1)
       |SELECT nd AS n_days,
       |  $accs
       |FROM s""".stripMargin
  }

  // ------------------------------------------------- weekly seasonality

  /** Day-of-week revenue profile: totals, share, and the seasonality
    * index vs a uniform week (share·7) — the calendar-rhythm readout
    * next to mom_revenue's trend. ISO day numbering on both engines
    * (Spark weekday()+1 = DuckDB isodow, Monday=1); revenue rides
    * exact DECIMAL, shares are one division each, rounded 1e-9.
    */
  def dowSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val byDow = Tables.orders(spark, dir)
      .groupBy((weekday(to_date(col("o_orderdate"))) + 1).cast("long")
        .as("dow"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
    val tot = byDow.agg(sum(col("rev")).as("trev"))
    byDow.crossJoin(broadcast(tot))
      .select(col("dow"), col("n_orders"),
        col("rev").cast("double").as("revenue"),
        round(col("rev").cast("double") / col("trev").cast("double"), 9)
          .as("share"),
        round(col("rev").cast("double") * 7 / col("trev").cast("double"), 9)
          .as("idx"))
  }

  private val dowSeasonalitySql =
    """WITH g AS (
      |  SELECT CAST(isodow(CAST(o_orderdate AS DATE)) AS BIGINT) AS dow,
      |    count(*) AS n_orders,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT SUM(rev) AS trev FROM g)
      |SELECT dow, n_orders, CAST(rev AS DOUBLE) AS revenue,
      |  round(CAST(rev AS DOUBLE) / CAST(trev AS DOUBLE), 9) AS share,
      |  round(CAST(rev AS DOUBLE) * 7 / CAST(trev AS DOUBLE), 9) AS idx
      |FROM g CROSS JOIN tot""".stripMargin

  /** Quantile normalization across features (the bioinformatics /
    * feature-preprocessing move: give several columns the SAME
    * distribution by mapping each value to the cross-feature mean of
    * the values sharing its rank). Three lineitem measures on wildly
    * different scales (quantity, price, discount) are unpivoted to
    * (feature, value) rows, ranked WITHIN each feature by the grouped
    * distributed rank (RangeRank — never a 3-partition window sort
    * over the fact table), and the reference distribution at each rank
    * is the DECIMAL-exact sum of the three same-rank values divided
    * once — aggregation-order-free (money-in-DECIMAL discipline).
    *
    * Scale shape: one unpivot projection (row-local ×3), the grouped
    * RangeRank exchanges, one rank-keyed rollup, and a rank-keyed
    * shuffle-hash join back (both sides corpus-sized — never
    * broadcast). Ties are totaled by the unique row id, so ranks — and
    * therefore the output — are deterministic across engines.
    */
  def quantileNormalize(spark: SparkSession, dir: String): DataFrame = {
    val long = Tables.lineitem(spark, dir)
      .where(col("l_quantity").isNotNull && col("l_extendedprice").isNotNull
        && col("l_discount").isNotNull)
      .select((col("l_orderkey") * 10 + col("l_linenumber")).as("rid"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .selectExpr("rid",
        "stack(3, 'qty', l_quantity, 'price', l_extendedprice, " +
          "'disc', l_discount) AS (feature, value)")
    // The reference distribution as a WINDOW over rn, not a groupBy +
    // join-back (r10 opt, guide §2.4): spelled as rollup + self-join,
    // each consumer planned its own Exchange(rn) over its own copy of
    // the ranked subtree — column pruning narrows the aggregate side,
    // the subtrees stop canonicalizing equal, ReusedExchange cannot
    // fire, and the 1.8M-row sort + row_number window ran TWICE (plan
    // dump: 2× Window(…rid ASC…); an explicit shared repartition(rn)
    // was measured and did NOT restore reuse — 4.4 s vs 2.9 baseline).
    // sum OVER (PARTITION BY rn) computes the identical DECIMAL-exact
    // per-rank sum in ONE pass: one ranked subtree, one rn exchange,
    // no join build. Per-rank groups have ≤ |features| = 3 rows at any
    // scale, so the window partitioning is high-cardinality,
    // skew-free, and never corpus-sized per group.
    val ranked = RangeRank.withRankAscGrouped(long, Seq("feature"), "value",
      Seq(col("rid").asc), "rn")
    ranked
      .withColumn("normalized",
        sum(col("value").cast(DecimalType(18, 2)))
          .over(Window.partitionBy(col("rn"))).cast("double") / 3)
      .select(col("feature"), col("rid"), col("value"),
        col("rn").cast("long").as("rn"), col("normalized"))
  }

  private val quantileNormalizeSql =
    """WITH long AS (
      |  SELECT l_orderkey * 10 + l_linenumber AS rid, 'qty' AS feature,
      |    l_quantity AS value FROM lineitem
      |    WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
      |      AND l_discount IS NOT NULL
      |  UNION ALL
      |  SELECT l_orderkey * 10 + l_linenumber, 'price', l_extendedprice
      |    FROM lineitem
      |    WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
      |      AND l_discount IS NOT NULL
      |  UNION ALL
      |  SELECT l_orderkey * 10 + l_linenumber, 'disc', l_discount
      |    FROM lineitem
      |    WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
      |      AND l_discount IS NOT NULL),
      |r AS (
      |  SELECT rid, feature, value,
      |    row_number() OVER (PARTITION BY feature ORDER BY value, rid) AS rn
      |  FROM long),
      |d AS (
      |  SELECT rn,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / 3 AS normalized
      |  FROM r GROUP BY rn)
      |SELECT feature, rid, value, CAST(rn AS BIGINT) AS rn, normalized
      |FROM r JOIN d USING (rn)""".stripMargin

  /** Distributed Poisson bootstrap (Chamandy et al., "Estimating
    * uncertainty for massive data streams", Google 2012 — published
    * method): classical resampling needs n draws WITH replacement —
    * inherently sequential — but each row's multiplicity in a
    * replicate is ≈ Poisson(1), independent per row, so B replicate
    * estimates come from ONE scan with per-(row, replicate) weights.
    * The weight is the Poisson(1) inverse CDF over the portable-hash
    * coin (integer cutoffs = ⌊CDF·10⁶⌋, spelled as literals — exact in
    * both engines, the importance_sample discipline); the replicate
    * mean is a DECIMAL-exact weighted sum with one final division.
    * The CI is the empirical quantile band of the 32 replicate means —
    * left to the consumer (32 rows), as a mixed-grain output would be.
    *
    * Scale shape: one projection ×32 replicates (row-local explode),
    * one exchange into 32 groups with map-side partials. No sort, no
    * join, no per-replicate pass.
    */
  def poissonBootstrap(spark: SparkSession, dir: String): DataFrame = {
    val reps = Tables.lineitem(spark, dir)
      .where(col("l_extendedprice").isNotNull)
      .select((col("l_orderkey") * 10 + col("l_linenumber")).as("rid"),
        col("l_extendedprice").cast(DecimalType(18, 2)).as("x"))
      .select(col("rid"), col("x"), explode(expr("sequence(0, 31)")).as("b"))
      // seeding per replicate varies the HASH INPUT — hash(rid_b) —
      // so replicate coins are independent draws, not 32 deterministic
      // XOR transforms of one 60-bit value (ADVICE r7: the xor scheme
      // made every replicate's multiplicity a function of the same
      // hash, which biases the CI the bootstrap exists to estimate).
      // Same (j, i) pair-hash idiom as random_projection's sign matrix;
      // spelled identically in the oracle SQL.
      .withColumn("u", graft.functions.CrossHash.hash60Seeded(
        concat(col("rid").cast("string"), lit("_"), col("b").cast("string")),
        20260815).cast("long"))
    val weighted = reps
      .withColumn("u6", pmod(col("u"), lit(1000000L)))
      .withColumn("w", when(col("u6") < 367879, 0)
        .when(col("u6") < 735758, 1)
        .when(col("u6") < 919698, 2)
        .when(col("u6") < 981011, 3)
        .when(col("u6") < 996340, 4)
        .otherwise(5))
    weighted.groupBy(col("b"))
      .agg(sum(col("w")).cast("long").as("n_eff"),
        (sum(col("w") * col("x")).cast("double") /
          sum(col("w")).cast("double")).as("mean_b"))
      .select(col("b").cast("int").as("b"), col("n_eff"), col("mean_b"))
  }

  private val poissonBootstrapSql = {
    val h = graft.functions.CrossHash.hash60SeededSql(
      "CAST(rid AS VARCHAR) || '_' || CAST(b AS VARCHAR)", 20260815)
    s"""WITH base AS (
       |  SELECT l_orderkey * 10 + l_linenumber AS rid,
       |    CAST(l_extendedprice AS DECIMAL(18,2)) AS x
       |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
       |reps AS (
       |  SELECT rid, x, unnest(range(32)) AS b FROM base),
       |u AS (
       |  SELECT rid, x, b,
       |    ($h % 1000000 + 1000000) % 1000000 AS u6
       |  FROM reps),
       |w AS (
       |  SELECT b, x,
       |    CASE WHEN u6 < 367879 THEN 0 WHEN u6 < 735758 THEN 1
       |         WHEN u6 < 919698 THEN 2 WHEN u6 < 981011 THEN 3
       |         WHEN u6 < 996340 THEN 4 ELSE 5 END AS w
       |  FROM u)
       |SELECT CAST(b AS INTEGER) AS b, CAST(SUM(w) AS BIGINT) AS n_eff,
       |  CAST(SUM(w * x) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS mean_b
       |FROM w GROUP BY b""".stripMargin
  }

  val ops: Seq[Op] = Seq(
    Op("poisson_bootstrap", poissonBootstrap, Some(poissonBootstrapSql)),
    Op("quantile_normalize", quantileNormalize, Some(quantileNormalizeSql),
      bench = true),
    Op("gini_index", giniIndex, Some(giniIndexSql)),
    Op("benford_digits", benfordDigits, Some(benfordDigitsSql)),
    Op("category_entropy", categoryEntropy, Some(categoryEntropySql)),
    Op("acf_lags", acfLags, Some(acfLagsSql)),
    Op("dow_seasonality", dowSeasonality, Some(dowSeasonalitySql)),
    Op("chi_square", chiSquare, Some(chiSquareSql)),
    Op("mann_whitney_u", mannWhitneyU, Some(mannWhitneyUSql)),
    Op("ols_regression", olsRegression, Some(olsRegressionSql)),
    Op("cusum_changepoint", cusumChangepoint, Some(cusumChangepointSql), bench = true),
    Op("equi_depth_histogram", equiDepthHistogram, Some(equiDepthHistogramSql)),
  )
}
