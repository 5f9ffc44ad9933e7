package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Op, Tables}

/** Extraction-stage projections, filters and scalar functions
  * (SURVEY §2.2, §2.8; /root/reference/src/queries/extractqueries.py).
  *
  * Scale notes: every filter/projection here is a plain Column
  * expression, so Catalyst pushes predicates and pruned schemas into
  * the parquet scan (verified via explain: PushedFilters/ReadSchema).
  */
object Extraction {

  /** P1+P4+P5+F1+F2: project/alias, accuracy-style range filter, local
    * date-equality filter, UTC→America/Mexico_City conversion
    * (extractqueries.py:6-23). `value` plays horizontal_accuracy.
    */
  def extractProjectFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id").as("ping_id"),
        col("user_id").as("caid"),
        col("ts").as("utc_ts"),
        from_utc_timestamp(col("ts"), "America/Mexico_City").as("cdmx_datetime"),
        date_format(from_utc_timestamp(col("ts"), "America/Mexico_City"),
          "yyyy-MM-dd").as("cdmx_date"),
        col("value").as("accuracy"),
      )
      .where(col("value") >= 100
        && to_date(col("ts")) === lit("2024-01-05").cast("date"))

  private val extractProjectFilterSql =
    """SELECT event_id AS ping_id, user_id AS caid, ts AS utc_ts,
      |  CAST(timezone('America/Mexico_City', timezone('UTC', ts)) AS TIMESTAMP) AS cdmx_datetime,
      |  strftime(CAST(timezone('America/Mexico_City', timezone('UTC', ts)) AS TIMESTAMP), '%Y-%m-%d') AS cdmx_date,
      |  value AS accuracy
      |FROM events
      |WHERE value >= 100 AND CAST(ts AS DATE) = DATE '2024-01-05'""".stripMargin

  /** P6+F3: night-hours disjunction (hour >= 22 OR hour < 6)
    * (/root/reference/src/queries/ntl_queries.py:109).
    */
  def nightHours(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .where(hour(col("ts")) >= 22 || hour(col("ts")) < 6)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))

  private val nightHoursSql =
    """SELECT event_id, user_id, ts, event_type FROM events
      |WHERE hour(ts) >= 22 OR hour(ts) < 6""".stripMargin

  /** P8+P9: string-prefix membership + sentinel inequality
    * (/root/reference/src/queries/interaction_queries.py:38-39).
    */
  def prefixFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .where(substring(col("c_mktsegment"), 1, 2).isin("HO", "MA")
        && col("c_name") =!= lit("Customer#000000000"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  private val prefixFilterSql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE substring(c_mktsegment, 1, 2) IN ('HO', 'MA')
      |  AND c_name != 'Customer#000000000'""".stripMargin

  /** P2: SELECT * EXCLUDE(cols) — as df.drop
    * (/root/reference/src/imputers/home_ageb_imputers.py:102).
    */
  def dropColumns(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .drop("l_extendedprice", "l_discount", "l_tax")

  private val dropColumnsSql =
    """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
      |  l_returnflag, l_linestatus, l_shipdate
      |FROM lineitem""".stripMargin

  /** P11: bernoulli sampling
    * (/root/reference/scripts/HomeAgebGenerator.py:82). The sampled
    * rows themselves are engine-specific (seeded XORShift per
    * partition), so no row oracle exists; the query OUTPUTS the
    * binomial confidence-interval verdict instead (r6 verdict #4): the
    * sampled count k ~ Binomial(n, 0.005) must land within ±6σ of
    * n·p (false-fail odds ≈ 1e-9 even at sf0.001's k ≈ 30). The exact
    * total anchors the oracle comparison; the sample itself still
    * executes — the aggregation sits ON the sampled relation.
    */
  def sampleBernoulli(spark: SparkSession, dir: String): DataFrame = {
    val p = 0.005
    val sampled = Tables.lineitem(spark, dir)
      .sample(withReplacement = false, p, seed = 42L)
      .agg(count(lit(1)).as("k"))
    Tables.lineitem(spark, dir).agg(count(lit(1)).as("n_total"))
      .crossJoin(broadcast(sampled))
      .select(col("n_total"),
        (abs(col("k") - col("n_total") * p)
          <= lit(6.0) * sqrt(col("n_total") * p * (1 - p))).as("within_ci"))
  }

  private val sampleBernoulliSql =
    """SELECT count(*) AS n_total, true AS within_ci FROM lineitem""".stripMargin

  /** U1+U2: union of per-day slices, schema-aligned
    * (/root/reference/src/transforms/NTLTransforms.py:54-80 — replaced
    * by a single multi-predicate scan + unionByName; at scale this is
    * one parquet scan per branch with partition pruning, not a loop).
    */
  def unionDays(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val d1 = ev.where(to_date(col("ts")) === lit("2024-01-03").cast("date"))
    val d2 = ev.where(to_date(col("ts")) === lit("2024-01-07").cast("date"))
    d1.unionByName(d2).select(col("event_id"), col("ts"), col("user_id"))
  }

  private val unionDaysSql =
    """SELECT event_id, ts, user_id FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-03'
      |UNION ALL
      |SELECT event_id, ts, user_id FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-07'""".stripMargin

  /** F1-F6: datetime scalar family — epoch seconds, strftime, hour,
    * zero-padded year/month/day partition keys, to_date
    * (/root/reference/scripts/IndexingHomeAgebs.py:124-126).
    */
  def scalarDatetime(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        unix_timestamp(col("ts")).as("epoch_secs"),
        date_format(col("ts"), "yyyy-MM-dd").as("day_str"),
        hour(col("ts")).as("hh"),
        year(col("ts")).cast("string").as("year"),
        lpad(month(col("ts")).cast("string"), 2, "0").as("month"),
        lpad(dayofmonth(col("ts")).cast("string"), 2, "0").as("day"),
        to_date(col("ts")).as("d"),
      )

  private val scalarDatetimeSql =
    """SELECT event_id,
      |  CAST(floor(epoch_us(ts) / 1000000.0) AS BIGINT) AS epoch_secs,
      |  strftime(ts, '%Y-%m-%d') AS day_str,
      |  hour(ts) AS hh,
      |  CAST(year(ts) AS VARCHAR) AS year,
      |  lpad(CAST(month(ts) AS VARCHAR), 2, '0') AS month,
      |  lpad(CAST(day(ts) AS VARCHAR), 2, '0') AS day,
      |  CAST(ts AS DATE) AS d
      |FROM events""".stripMargin

  /** F7-F10: string scalar family — concat_ws edge keys, LEAST/GREATEST
    * undirected-edge canonicalization, slicing, length, CASE WHEN
    * (/root/reference/scripts/NetworkBuilder.py:182,
    * /root/reference/scripts/MakeEmpiricNetworks.py:85-86).
    */
  def scalarString(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("edge_key"),
        least(col("o_orderkey"), col("o_custkey")).as("lo"),
        greatest(col("o_orderkey"), col("o_custkey")).as("hi"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        length(col("o_orderpriority")).as("prio_len"),
        when(col("o_orderstatus") === "F", lit("final"))
          .when(col("o_orderstatus") === "O", lit("open"))
          .otherwise(lit("other")).as("status_name"),
      )

  private val scalarStringSql =
    """SELECT o_orderkey,
      |  concat_ws('-', o_orderstatus, o_orderpriority) AS edge_key,
      |  least(o_orderkey, o_custkey) AS lo,
      |  greatest(o_orderkey, o_custkey) AS hi,
      |  substring(o_orderpriority, 1, 1) AS prio_code,
      |  length(o_orderpriority) AS prio_len,
      |  CASE WHEN o_orderstatus = 'F' THEN 'final'
      |       WHEN o_orderstatus = 'O' THEN 'open'
      |       ELSE 'other' END AS status_name
      |FROM orders""".stripMargin

  /** F11: math scalar family. ROUND only on irrational inputs (sqrt) —
    * Spark's HALF_UP and DuckDB's round only diverge exactly on .5
    * boundaries, which sqrt of non-squares never hits.
    */
  def scalarMath(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        ceil(col("p_retailprice")).as("price_ceil"),
        floor(col("p_retailprice")).as("price_floor"),
        round(sqrt(col("p_size").cast("double")), 4).as("size_sqrt"),
        pow(col("p_size").cast("double"), 2.0).as("size_sq"),
        abs(col("p_size") - 25).as("size_center"),
        (col("p_partkey") % 7).cast("int").as("bucket7"),
        floor(col("p_partkey") / 100).cast("long").as("group100"),
      )

  private val scalarMathSql =
    """SELECT p_partkey,
      |  CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
      |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
      |  round(sqrt(CAST(p_size AS DOUBLE)), 4) AS size_sqrt,
      |  pow(CAST(p_size AS DOUBLE), 2.0) AS size_sq,
      |  abs(p_size - 25) AS size_center,
      |  CAST(p_partkey % 7 AS INTEGER) AS bucket7,
      |  CAST(floor(p_partkey / 100.0) AS BIGINT) AS group100
      |FROM part""".stripMargin

  /** F14: array literal + explode + array_contains
    * (/root/reference/src/imputers/home_ageb_imputers.py:43,141,164).
    */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        array(least(col("l_partkey"), col("l_suppkey")),
          greatest(col("l_partkey"), col("l_suppkey"))).as("edge"))
      .select(col("l_orderkey"), col("l_linenumber"),
        explode(col("edge")).as("member"),
        array_contains(col("edge"), col("l_orderkey")).as("self_loop"))

  private val arrayFuncsSql =
    """SELECT l_orderkey, l_linenumber,
      |  unnest([least(l_partkey, l_suppkey), greatest(l_partkey, l_suppkey)]) AS member,
      |  list_contains([least(l_partkey, l_suppkey), greatest(l_partkey, l_suppkey)], l_orderkey) AS self_loop
      |FROM lineitem""".stripMargin

  /** F5+W5: origin-anchored TIME_BUCKET where the origin is the global
    * MIN(ts) — computed as a scalar aggregate cross-joined broadcast,
    * never a single-partition window
    * (/root/reference/src/queries/interaction_queries.py:9-19; SURVEY W5).
    */
  def timeBucketOrigin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val origin = ev.agg(min(col("ts")).as("origin"))
    ev.crossJoin(broadcast(origin))
      .select(
        col("event_id"),
        col("origin"),
        timestamp_micros(
          unix_micros(col("origin"))
            + expr("(unix_micros(ts) - unix_micros(origin)) div 600000000")
              * lit(600000000L)).as("tw"),
      )
  }

  private val timeBucketOriginSql =
    """SELECT event_id, origin,
      |  make_timestamp(epoch_us(origin)
      |    + (epoch_us(ts) - epoch_us(origin)) // 600000000 * 600000000) AS tw
      |FROM events CROSS JOIN (SELECT MIN(ts) AS origin FROM events)""".stripMargin

  /** S6: JSON column harvest — the reference builds catalogs from
    * JSON documents (notebooks/GeneratesMunicipioDB.ipynb cells 1-5);
    * here the events.props JSON column is parsed and aggregated.
    */
  def jsonProps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))

  private val jsonPropsSql =
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
      |  count(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events GROUP BY 1""".stripMargin

  /** `explode_outer` semantics: unnesting a possibly-empty array must
    * KEEP the parent row (null element) — the left-join flavor of
    * flattening, where plain explode silently drops parents and skews
    * downstream counts. Documents with no ≥9-char token survive with
    * a null `long_tok`. The oracle spells the outer behavior
    * explicitly (empty list → [NULL]) since unnest alone drops rows.
    */
  def explodeOuterTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode_outer(expr(
          "filter(split(text, ' '), t -> length(t) >= 9)")).as("long_tok"))

  private val explodeOuterTokensSql =
    """SELECT doc_id,
      |  unnest(CASE WHEN len(l) = 0 THEN [CAST(NULL AS VARCHAR)]
      |              ELSE l END) AS long_tok
      |FROM (SELECT doc_id,
      |        list_filter(string_split(text, ' '), t -> len(t) >= 9) AS l
      |      FROM documents)""".stripMargin

  /** Hash-keyed Bernoulli sampling — the cluster-stable complement to
    * [[sampleBernoulli]]: `df.sample` draws per-partition, so its
    * output changes whenever the partitioning does (repartition, AQE,
    * a 100-TB relayout); keying the keep decision on a portable hash
    * of the ROW KEY makes the sample a pure row property —
    * reproducible across engines, cluster sizes, and reruns, and
    * stable under late-arriving data (the same row always lands the
    * same way). 0.5% of lineitem by (orderkey, linenumber).
    */
  def sampleHash(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(graft.functions.CrossHash.hash60(
        concat(col("l_orderkey").cast("string"), lit(":"),
          col("l_linenumber").cast("string"))) % 200 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"))

  private val sampleHashSql = {
    val h = graft.functions.CrossHash.hash60Sql(
      "CONCAT(CAST(l_orderkey AS VARCHAR), ':', CAST(l_linenumber AS VARCHAR))")
    s"""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
       |FROM lineitem WHERE $h % 200 = 0""".stripMargin
  }

  val ops: Seq[Op] = Seq(
    Op("extract_project_filter", extractProjectFilter, Some(extractProjectFilterSql), bench = true),
    Op("sample_hash", sampleHash, Some(sampleHashSql)),
    Op("explode_outer_tokens", explodeOuterTokens, Some(explodeOuterTokensSql)),
    Op("json_props", jsonProps, Some(jsonPropsSql)),
    Op("night_hours", nightHours, Some(nightHoursSql)),
    Op("prefix_filter", prefixFilter, Some(prefixFilterSql)),
    Op("drop_columns", dropColumns, Some(dropColumnsSql)),
    Op("sample_bernoulli", sampleBernoulli, Some(sampleBernoulliSql)),
    Op("union_days", unionDays, Some(unionDaysSql)),
    Op("scalar_datetime", scalarDatetime, Some(scalarDatetimeSql)),
    Op("scalar_string", scalarString, Some(scalarStringSql)),
    Op("scalar_math", scalarMath, Some(scalarMathSql)),
    Op("array_funcs", arrayFuncs, Some(arrayFuncsSql)),
    Op("time_bucket_origin", timeBucketOrigin, Some(timeBucketOriginSql)),
  )
}
