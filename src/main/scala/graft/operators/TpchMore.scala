package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Op, Tables}

/** The remaining classic TPC-H query shapes, adapted to the driver's
  * reduced star schema (TESTDATA.md has no partsupp relation and no
  * commit/receipt dates, phone, or comment columns — each adaptation
  * keeps the query's DEFINING plan shape and swaps only the missing
  * column for an available stand-in, noted per query).
  *
  * Together with q1/q3/q4/q5/q7/q9/q12/q14/q18 (Aggregations.scala,
  * Joins.scala) this closes the full adaptable TPC-H surface: the
  * reference's analytics users lean on these shapes daily (e.g.
  * `NetworkBuilder.py:214-360`'s join/agg pyramids are q5/q9-shaped),
  * so the engine should demonstrate every canonical decorrelation —
  * scalar subqueries, correlated EXISTS/NOT EXISTS, NOT IN, HAVING
  * over a scalar aggregate, disjunctive predicate pushdown, and
  * top-k-over-aggregate — in their scale-correct Spark spellings.
  *
  * Decimal/round discipline per the house rules (TODO.md): money math
  * in DECIMAL(18,2)→DECIMAL(38,4), one double division at the end,
  * round(…, 9) on both engines; integer SUM/COUNT cast to BIGINT in
  * the oracle (DuckDB SUM(int) is HUGEINT).
  */
object TpchMore {

  private val dec = DecimalType(18, 2)
  private val dec384 = DecimalType(38, 4)

  private def rev = (col("l_extendedprice").cast(dec)
    * (lit(1.0).cast(dec) - col("l_discount").cast(dec))).cast(dec384)

  // ---------------------------------------------------------------- q6

  /** TPC-H Q6 (forecast revenue change): the pure-scan aggregate — no
    * join at all. Every predicate (date window, discount band,
    * quantity cap) must reach the parquet scan as a pushed filter so
    * the fact never leaves the scan stage unfiltered; at 100 TB this
    * query is the canonical "scan-bound, row-group-pruned" probe and
    * any exchange in its plan is a bug. Plan: Scan(PushedFilters) →
    * partial agg → single-row final agg.
    */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1998-01-01").cast("timestamp")
        && col("l_discount").between(0.05, 0.07)
        && col("l_quantity") < 24)
      .agg(
        sum((col("l_extendedprice").cast(dec) * col("l_discount").cast(dec)))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))

  private val q6Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- q2

  /** TPC-H Q2 shape (minimum-cost supplier): for each part in a
    * size/type family, the EUROPE supplier(s) achieving the minimum
    * unit cost — the correlated-MIN subquery. No partsupp relation in
    * this schema, so the observed price list is derived from lineitem
    * (min unit price ever shipped per (part, supplier) — rounded
    * before any comparison so both engines compare identical doubles).
    *
    * Scale shape: the correlated `ps_supplycost = (SELECT min …)`
    * decorrelates into a per-part MIN aggregate joined back on the
    * partkey shuffle — one exchange for the price list, one for the
    * per-part min, both on the same key so AQE reuses the
    * partitioning. The part filter prunes BEFORE the join-back;
    * supplier/nation/region are catalog-sized broadcasts. Never a
    * per-row subquery execution.
    */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val price = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(round(col("l_extendedprice").cast("double")
        / col("l_quantity").cast("double"), 9)).as("unit_cost"))
    val best = price.groupBy(col("l_partkey").as("b_partkey"))
      .agg(min(col("unit_cost")).as("min_cost"))
    val suppGeo = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "EUROPE")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    price
      .join(best, col("l_partkey") === col("b_partkey")
        && col("unit_cost") === col("min_cost"))
      .join(Tables.part(spark, dir)
        .where(col("p_size").between(10, 20) && col("p_type") === "LARGE")
        .select(col("p_partkey"), col("p_name")).hint("shuffle_hash"),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppGeo), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("min_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  private val q2Sql =
    """WITH price AS (
      |  SELECT l_partkey, l_suppkey,
      |    min(round(CAST(l_extendedprice AS DOUBLE)
      |      / CAST(l_quantity AS DOUBLE), 9)) AS unit_cost
      |  FROM lineitem GROUP BY 1, 2),
      |best AS (SELECT l_partkey, min(unit_cost) AS min_cost
      |         FROM price GROUP BY 1)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, min_cost
      |FROM price JOIN best ON price.l_partkey = best.l_partkey
      |  AND unit_cost = min_cost
      |JOIN part ON p_partkey = price.l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
      |  AND r_name = 'EUROPE'
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q8

  /** TPC-H Q8 (national market share): one nation's share of a
    * region's revenue by order year — the two-role nation join (the
    * same dimension joined twice under different roles) plus a
    * conditional-over-total share. Customer reaches the fact on the
    * custkey shuffle (big dimension, never broadcast — the locked q5
    * lesson); supplier→nation is a broadcast map; the share is one
    * grouped conditional sum, never a self-join of per-year totals.
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val custRegion = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "AMERICA")
      .select(col("c_custkey"))
    val suppNation = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(custRegion.hint("shuffle_hash"), col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"), col("o_orderdate"))
      .join(Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey"), rev.as("rev")),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        round(
          sum(when(col("supp_nation") === "NATION_3", col("rev"))
            .otherwise(lit(0).cast(dec384))).cast("double")
            / sum(col("rev")).cast("double"), 9).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  private val q8Sql =
    """SELECT o_year,
      |  round(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN rev
      |      ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE)
      |    / CAST(SUM(rev) AS DOUBLE), 9) AS mkt_share
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (CAST(1.0 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |      AS DECIMAL(38,4)) AS rev,
      |    n2.n_name AS nation
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE r_name = 'AMERICA'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o_orderdate < TIMESTAMP '1998-01-01')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- q10

  /** TPC-H Q10 (returned-item reporting): top-20 customers by revenue
    * lost to returns in a quarter. Shape: date-pruned orders ⋈
    * returnflag-pruned lineitem on the orderkey shuffle FIRST (both
    * filters reach their scans), then the customer enrichment on the
    * custkey shuffle, then TakeOrderedAndProject — the top-k never
    * materializes a global sort. c_custkey tiebreak keeps the limit
    * deterministic.
    */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir).where(col("l_returnflag") === "R")
        .select(col("l_orderkey"), rev.as("rev")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("rev")).cast("double"), 9).as("revenue"))
      .join(Tables.customer(spark, dir).hint("shuffle_hash"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  private val q10Sql =
    """SELECT c_custkey, c_name,
      |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (CAST(1.0 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      |    AS DOUBLE), 9) AS revenue,
      |  c_acctbal, n_name
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-04-01' AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  // --------------------------------------------------------------- q11

  /** TPC-H Q11 shape (important stock): parts whose value (from one
    * nation's suppliers) clears a FRACTION OF THE GLOBAL TOTAL — the
    * scalar-subquery-in-HAVING. The per-part aggregate is computed
    * once; the global threshold is a one-row aggregate OF THAT SAME
    * relation broadcast back as a cross join (Spark's scalar-subquery
    * plan), so the base relation is scanned once per side but never
    * per-group. partsupp value stands in as sum of shipped
    * extendedprice.
    */
  def q11PartValue(spark: SparkSession, dir: String): DataFrame = {
    val nationSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .where(col("n_name") === "NATION_7")
      .select(col("s_suppkey"))
    val pv = Tables.lineitem(spark, dir)
      .join(broadcast(nationSupp), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast(dec)).cast(DecimalType(38, 2))
        .as("value"))
    // 0.0002, not the spec's 0.0001/SF: constant across the test scales
    // yet selective at both (sf0.01: 1453 of ~2000 parts would clear
    // 0.0001 — no longer "important stock"; 0.001 clears nobody at
    // sf0.1). The LIMIT keeps the result top-k-bounded regardless.
    val threshold = pv.agg((sum(col("value")) * lit(0.0002))
      .cast(DecimalType(38, 6)).as("thr"))
    pv.crossJoin(broadcast(threshold))
      .where(col("value") > col("thr"))
      .select(col("l_partkey"), col("value").cast("double").as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
      .limit(100)
  }

  private val q11Sql =
    """WITH pv AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
      |      AS value
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_7' GROUP BY 1)
      |SELECT l_partkey, CAST(value AS DOUBLE) AS value FROM pv
      |WHERE value > (SELECT CAST(SUM(value) * 0.0002 AS DECIMAL(38,6)) FROM pv)
      |ORDER BY value DESC, l_partkey LIMIT 100""".stripMargin

  // --------------------------------------------------------------- q13

  /** TPC-H Q13 (customer order-count distribution): the LEFT join
    * with a predicate ON THE JOIN CONDITION (not a WHERE — customers
    * with zero qualifying orders must survive with count 0), then a
    * histogram of the counts. o_orderpriority <> '1-URGENT' stands in
    * for the comment NOT LIKE filter. Two exchanges total: custkey
    * for the per-customer count (the filter prunes map-side), then
    * the tiny count-of-counts.
    */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_custkey"))
      .join(Tables.orders(spark, dir)
        .where(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  private val q13Sql =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |    AND o_orderpriority <> '1-URGENT'
      |  GROUP BY 1)
      |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin

  // --------------------------------------------------------------- q15

  /** TPC-H Q15 (top supplier): the view-then-max shape — a quarter's
    * per-supplier revenue, returning the supplier(s) at the maximum.
    * The revenue view is computed ONCE and reused for both the rows
    * and the scalar max (exchange reuse on the suppkey aggregation);
    * the max broadcasts back. Equality on a rounded double is
    * engine-stable because both engines derive it from the same
    * decimal sum.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val revenue = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(rev).cast("double").as("total_revenue"))
    val mx = revenue.agg(max(col("total_revenue")).as("mx"))
    Tables.supplier(spark, dir)
      .join(revenue.hint("shuffle_hash"), col("s_suppkey") === col("supplier_no"))
      .crossJoin(broadcast(mx))
      .where(col("total_revenue") === col("mx"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("total_revenue"), 9).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  private val q15Sql =
    """WITH rev AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (CAST(1.0 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |      AS DECIMAL(38,4))) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-04-01' GROUP BY 1)
      |SELECT s_suppkey, s_name, round(total_revenue, 9) AS total_revenue
      |FROM supplier JOIN rev ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  // --------------------------------------------------------------- q16

  /** TPC-H Q16 shape (parts/supplier relationship): distinct-supplier
    * counts per part family, EXCLUDING suppliers from a blocklist —
    * the NOT IN anti-join. The blocklist (negative balance stands in
    * for the complaints comment scan) is catalog-sized: broadcast
    * anti-join, never a shuffle. The distinct count shuffles once on
    * the (brand, type, size) grouping after the partkey join prunes
    * map-side. NOT IN's null semantics don't bite (s_suppkey is a
    * key, never null) — spelled left_anti which is the sane
    * scale-spelling either way.
    */
  def q16SupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    val blocked = Tables.supplier(spark, dir)
      .where(col("s_acctbal") < 0).select(col("s_suppkey"))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(blocked), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(Tables.part(spark, dir)
        .where(col("p_brand") =!= "Brand#5"
          && !col("p_type").isin("PROMO", "ECONOMY")
          && col("p_size").isin(1, 14, 23, 45, 19, 3, 36, 9))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
        .hint("shuffle_hash"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
      .limit(100)
  }

  private val q16Sql =
    """SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#5' AND p_type NOT IN ('PROMO', 'ECONOMY')
      |  AND p_size IN (1, 14, 23, 45, 19, 3, 36, 9)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
      |                        WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 100""".stripMargin

  // --------------------------------------------------------------- q17

  /** TPC-H Q17 (small-quantity-order revenue): lines below 20% of
    * their part's average quantity — the correlated-AVG subquery.
    * Decorrelates to a per-part AVG joined back on the partkey
    * shuffle; the brand filter applies on the OUTER side only (the
    * average is over ALL lines of the part, per spec), so the
    * aggregate runs over the full fact but reduces to one row per
    * part before the join-back. Never a per-row subquery.
    */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val perPartAvg = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey").as("a_partkey"))
      .agg((lit(0.5) * avg(col("l_quantity").cast("double")))
        .as("half_avg_qty"))
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).where(col("p_brand") === "Brand#23")
        .select(col("p_partkey")).hint("shuffle_hash"),
        col("l_partkey") === col("p_partkey"))
      .join(perPartAvg, col("l_partkey") === col("a_partkey"))
      .where(col("l_quantity").cast("double") < col("half_avg_qty"))
      .agg(
        round(sum(col("l_extendedprice").cast(dec)).cast("double") / 7.0, 9)
          .as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  private val q17Sql =
    """WITH pa AS (
      |  SELECT l_partkey AS a_partkey,
      |    0.5 * avg(CAST(l_quantity AS DOUBLE)) AS half_avg_qty
      |  FROM lineitem GROUP BY 1)
      |SELECT
      |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |    / 7.0, 9) AS avg_yearly,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |JOIN pa ON l_partkey = a_partkey
      |WHERE p_brand = 'Brand#23'
      |  AND CAST(l_quantity AS DOUBLE) < half_avg_qty""".stripMargin

  // --------------------------------------------------------------- q19

  /** TPC-H Q19 (discounted revenue): the disjunction-of-conjunctions
    * predicate. The partkey equi-join carries all three brand/size ×
    * quantity bands as ONE residual OR — Catalyst keeps the equi-key
    * join (never a cartesian fallback), and the per-side halves of
    * the disjunction (brand/size on part, quantity on lineitem) are
    * pushed as partial filters to both scans.
    */
  def q19DisjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val bands =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5)
        && col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)
        && col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 15)
        && col("l_quantity").between(20, 30))
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).hint("shuffle_hash"),
        col("p_partkey") === col("l_partkey"))
      .where(bands)
      .agg(sum(rev).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  private val q19Sql =
    """SELECT
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (CAST(1.0 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |    AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // --------------------------------------------------------------- q20

  /** TPC-H Q20 shape (part promotion): suppliers of one nation who
    * shipped a meaningful volume of a name-filtered part family in a
    * year — the nested IN-subquery pyramid. Decorrelation: the inner
    * part-name IN becomes a partkey semi-join INTO the fact, the
    * HAVING-gated per-supplier aggregate reduces the fact to
    * qualifying suppkeys, and the outer IN becomes a semi-join from
    * the catalog-sized supplier relation — every IN is a semi, no
    * distinct-then-inner-join, nothing fact-sized broadcast.
    */
  def q20PartPromotion(spark: SparkSession, dir: String): DataFrame = {
    val redParts = Tables.part(spark, dir)
      .where(col("p_name").startsWith("red")).select(col("p_partkey"))
    val bigShippers = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(redParts.hint("shuffle_hash"),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity").cast(dec)).cast("double").as("qty"))
      .where(col("qty") > 100.0)
      .select(col("l_suppkey"))
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .where(col("n_name") === "NATION_4")
      .join(bigShippers, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .orderBy(col("s_suppkey"))
  }

  private val q20Sql =
    """SELECT s_suppkey, s_name, s_acctbal FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_4' AND s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part
      |                      WHERE p_name LIKE 'red%')
      |    AND l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01'
      |  GROUP BY 1
      |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 100.0)
      |ORDER BY s_suppkey""".stripMargin

  // --------------------------------------------------------------- q21

  /** TPC-H Q21 shape (suppliers who kept orders waiting): late lines
    * on finished multi-supplier orders where the supplier was the
    * ONLY late one — correlated EXISTS + NOT EXISTS on the same fact.
    * No receipt/commit dates in this schema: "late" is shipping more
    * than 90 days after the order date.
    *
    * Scale spelling: both correlated quantifiers decorrelate into
    * per-order supplier-distinct counts computed from ONE date-joined
    * late-lines relation — EXISTS(other supplier) ≡ the order has >1
    * distinct suppliers (computed on the full fact), NOT EXISTS(other
    * LATE supplier) ≡ the order has exactly 1 distinct LATE supplier.
    * Three orderkey-keyed aggregates sharing one exchange layout, two
    * semi-style joins — never a per-row subquery, never a fact
    * broadcast, and the nation filter trims the supplier broadcast
    * before the final count.
    */
  def q21WaitingOrders(spark: SparkSession, dir: String): DataFrame = {
    val fOrders = Tables.orders(spark, dir)
      .where(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val lines = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(fOrders, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
    val perOrder = lines.groupBy(col("l_orderkey").as("g_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"))
      .where(col("n_supp") > 1 && col("n_late_supp") === 1)
      .select(col("g_orderkey"))
    val natSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .where(col("n_name") === "NATION_2")
      .select(col("s_suppkey"), col("s_name"))
    lines.where(col("late"))
      .join(perOrder, col("l_orderkey") === col("g_orderkey"), "left_semi")
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  private val q21Sql =
    """SELECT s_name, count(*) AS numwait FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE o_orderstatus = 'F' AND n_name = 'NATION_2'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
      |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  // --------------------------------------------------------------- q22

  /** TPC-H Q22 shape (global sales opportunity): above-average-balance
    * customers with no recent orders — scalar subquery (the global
    * positive-balance average, broadcast back) + NOT EXISTS (a
    * custkey anti-join against the date-pruned orders). c_nationkey
    * stands in for the phone country code. The anti-join's build side
    * is the pruned orders keyset on the custkey shuffle — at 100 TB
    * the anti side is the big one, so this is shuffle-anti, not
    * broadcast.
    */
  def q22SalesOpportunity(spark: SparkSession, dir: String): DataFrame = {
    // the threshold is a MEMBERSHIP boundary: an order-dependent double
    // avg could flip a customer sitting within an ulp of it, changing
    // the row set (worse than a value drift). Exact DECIMAL sum, one
    // double division — deterministic on both engines.
    val avgBal = Tables.customer(spark, dir)
      .where(col("c_acctbal") > 0.0)
      .agg((sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double")
        / count(lit(1))).as("ab"))
    val recent = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    Tables.customer(spark, dir)
      .crossJoin(broadcast(avgBal))
      .where(col("c_acctbal").cast("double") > col("ab"))
      .join(recent.hint("shuffle_hash"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntry"))
      .agg(count(lit(1)).as("numcust"),
        // DECIMAL accumulator, double at the end: a raw double SUM is
        // aggregation-order dependent and can flip the 9-dp round when
        // a total lands within an ulp of a boundary (the pagerank
        // sf0.001 lesson) — money rides DECIMAL, per the module doc
        sum(col("c_acctbal").cast(DecimalType(18, 2)))
          .cast("double").as("totacctbal"))
      .orderBy(col("cntry"))
  }

  private val q22Sql =
    """WITH avg_bal AS (
      |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |    / count(*) AS ab
      |  FROM customer WHERE c_acctbal > 0.0)
      |SELECT c_nationkey AS cntry, count(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer, avg_bal
      |WHERE CAST(c_acctbal AS DOUBLE) > ab
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '1999-01-01')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("q2_min_cost_supplier", q2MinCostSupplier, Some(q2Sql)),
    Op("q6_forecast_revenue", q6ForecastRevenue, Some(q6Sql)),
    Op("q8_market_share", q8MarketShare, Some(q8Sql)),
    Op("q10_returned_items", q10ReturnedItems, Some(q10Sql)),
    Op("q11_part_value", q11PartValue, Some(q11Sql)),
    Op("q13_cust_dist", q13CustDist, Some(q13Sql)),
    Op("q15_top_supplier", q15TopSupplier, Some(q15Sql)),
    Op("q16_supplier_cnt", q16SupplierCnt, Some(q16Sql)),
    Op("q17_small_qty_revenue", q17SmallQtyRevenue, Some(q17Sql)),
    Op("q19_disjunctive_revenue", q19DisjunctiveRevenue, Some(q19Sql)),
    Op("q20_part_promotion", q20PartPromotion, Some(q20Sql)),
    Op("q21_waiting_orders", q21WaitingOrders, Some(q21Sql)),
    Op("q22_sales_opportunity", q22SalesOpportunity, Some(q22Sql)),
  )
}
