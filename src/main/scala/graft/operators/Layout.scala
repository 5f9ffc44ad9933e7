package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Op, Tables}
import graft.functions.{BloomExpressions, GraftFunctions, ZOrder}

/** Physical-layout and runtime-pruning operators — the two levers that
  * decide how much of 100 TB a query actually reads: multi-dimensional
  * clustering (z-order) so file min/max statistics prune on every
  * clustered column, and bloom runtime filters so a selective dim join
  * ships only candidate fact rows into the shuffle.
  */
object Layout {

  private val dec = DecimalType(18, 2)

  /** Z-order clustering key over (l_partkey, l_suppkey): the write-side
    * layout step — `df.repartitionByRange(col("z")).sortWithinPartitions
    * (col("z"))` before the sink yields files whose min/max bound BOTH
    * keys (see `LayoutSpec` for the measured pruning win).
    *
    * Keys are first min/max-normalized onto the shared 16-bit grid —
    * raw-key interleave is worthless when domains are unequal (200
    * part keys vs 10 supp keys leave the supplier bits dead, so the
    * curve degenerates to a partkey sort); this is why production
    * z-ordering interleaves per-column range ranks, not raw values.
    * The min/max scalars are one partial-merged aggregate, broadcast
    * back — no window, no second scan of a cached corpus. Everything
    * (floor-scaled double math + bit spreading) is built-in, fully
    * codegen'd, and bit-identical in the oracle's identical formula.
    */
  def zorderKey(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val mm = li.agg(
      min(col("l_partkey")).as("amin"), max(col("l_partkey")).as("amax"),
      min(col("l_suppkey")).as("bmin"), max(col("l_suppkey")).as("bmax"))
    def norm(x: String, lo: String, hi: String) =
      floor((col(x) - col(lo)) * lit(65535.0)
        / greatest(col(hi) - col(lo), lit(1L)))
    li.crossJoin(broadcast(mm))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        ZOrder.zValue(norm("l_partkey", "amin", "amax"),
          norm("l_suppkey", "bmin", "bmax")).as("z"))
  }

  private val zorderKeySql = {
    // CAST(65535 AS DOUBLE), NOT the literal 65535.0: DuckDB types a
    // decimal-point literal as DECIMAL(25,1), so BIGINT * 65535.0 /
    // BIGINT runs a decimal path that returns 65534.99999999999 where
    // the double path returns exactly 65535.0 — invisible at sf0.1
    // key magnitudes, a floor()-flip at 1e10 (caught by the 10x
    // full-referential sweep, r9).
    def norm(x: String, lo: String, hi: String) =
      s"CAST(floor(($x - $lo) * CAST(65535 AS DOUBLE) / greatest($hi - $lo, 1)) AS BIGINT)"
    s"""WITH mm AS (SELECT min(l_partkey) AS amin, max(l_partkey) AS amax,
       |  min(l_suppkey) AS bmin, max(l_suppkey) AS bmax FROM lineitem)
       |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |  ${ZOrder.zValueSql(norm("l_partkey", "amin", "amax"),
            norm("l_suppkey", "bmin", "bmax"))} AS z
       |FROM lineitem, mm""".stripMargin
  }

  /** Hilbert-curve clustering key over the same normalized 16-bit
    * (l_partkey, l_suppkey) grid as [[zorderKey]] — the layout upgrade:
    * the Hilbert curve has no Z-curve "seams" (adjacent cells are
    * always curve-adjacent), so file min/max ranges cover tighter
    * rectangles and range queries touch fewer files at 100 TB.
    *
    * The standard xy→d walk (the public-domain bit algorithm: per
    * level, quadrant digit + conditional reflect/transpose) is
    * sequential in the bit position, so it unrolls: 16 stacked
    * projections engine-side (each a small Project over the previous
    * step's attributes — Catalyst keeps multi-referenced aliases
    * un-inlined, and codegen fuses the whole stack into the scan span),
    * and the oracle mirrors the identical arithmetic as 16 chained
    * CTEs. Integer-exact in both engines; grid coords ride along so
    * the spec can check the key against an independent reference walk.
    */
  def hilbertKey(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val mm = li.agg(
      min(col("l_partkey")).as("amin"), max(col("l_partkey")).as("amax"),
      min(col("l_suppkey")).as("bmin"), max(col("l_suppkey")).as("bmax"))
    def norm(x: String, lo: String, hi: String) =
      floor((col(x) - col(lo)) * lit(65535.0)
        / greatest(col(hi) - col(lo), lit(1L)))
    // r10 opt (guide §1.2/§4): the walk is ONE codegen'd expression
    // (`hilbert_d`, functions/ZOrder.scala) instead of 16 stacked
    // conditional projections — the unrolled stack planned ~100
    // chained expressions per row and benched 4.1 s at sf0.1 under the
    // compute-everything noop sink; the fused loop is the identical
    // integer arithmetic (R7OpsSpec pins it against an independent
    // reference walk, and the 16-CTE oracle SQL is unchanged).
    li.crossJoin(broadcast(mm))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        norm("l_partkey", "amin", "amax").as("gx"),
        norm("l_suppkey", "bmin", "bmax").as("gy"))
      .withColumn("hkey", call_function("hilbert_d", col("gx"), col("gy")))
  }

  private val hilbertKeySql = {
    // CAST(65535 AS DOUBLE) — the zorderKeySql DECIMAL-literal lesson
    def norm(x: String, lo: String, hi: String) =
      s"CAST(floor(($x - $lo) * CAST(65535 AS DOUBLE) / greatest($hi - $lo, 1)) AS BIGINT)"
    val keys = "l_orderkey, l_linenumber, l_partkey, l_suppkey, gx, gy"
    val stages = (0 until 16).map { i =>
      val s = 32768L >> i
      s"""h${i + 1} AS (SELECT $keys,
         |  d + CAST(${s * s} AS BIGINT) * xor(3 * rx, ry) AS d,
         |  CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN ${s - 1} - y ELSE y END
         |       ELSE x END AS x,
         |  CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN ${s - 1} - x ELSE x END
         |       ELSE y END AS y
         |  FROM (SELECT *,
         |    CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |    CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry FROM h$i))""".stripMargin
    }.mkString(",\n")
    s"""WITH mm AS (SELECT min(l_partkey) AS amin, max(l_partkey) AS amax,
       |  min(l_suppkey) AS bmin, max(l_suppkey) AS bmax FROM lineitem),
       |h0 AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |  ${norm("l_partkey", "amin", "amax")} AS gx,
       |  ${norm("l_suppkey", "bmin", "bmax")} AS gy,
       |  ${norm("l_partkey", "amin", "amax")} AS x,
       |  ${norm("l_suppkey", "bmin", "bmax")} AS y,
       |  CAST(0 AS BIGINT) AS d
       |FROM lineitem, mm),
       |$stages
       |SELECT $keys, d AS hkey FROM h16""".stripMargin
  }

  /** Bloom-pruned selective dim join: a ~16k-key bloom built over the
    * small side (parts with p_size < 15) drops non-candidate lineitem
    * rows inside the scan's WholeStageCodegen — BEFORE the join
    * exchange — then an exact semi-join absorbs the bloom's false
    * positives, so the result is exactly the plain semi-join the
    * oracle runs.
    *
    * Scale shape: the filter is built with one partial-merged aggregate
    * over the dim (a bloom is a mergeable sketch — the exchange carries
    * one filter per partition, not keys), costs ~20 KB serialized, and
    * prunes (1 - selectivity) of the fact side from the shuffle. This
    * is Spark's InjectRuntimeFilter made explicit and deterministic.
    */
  def bloomPrune(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.part(spark, dir)
      .where(col("p_size") < 15).select(col("p_partkey"))
    val bloom = BloomExpressions.build(dim, col("p_partkey"),
      expectedItems = 1 << 14, fpp = 0.03)
    Tables.lineitem(spark, dir)
      .where(GraftFunctions.bloom_might_contain(col("l_partkey"), lit(bloom)))
      // explicit hint: the filtered dim is catalog-sized by selection;
      // auto-broadcast must not depend on ambient session conf
      .join(broadcast(dim), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"))
  }

  private val bloomPruneSql =
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size < 15)
      |GROUP BY 1""".stripMargin

  /** The `ping_gen` DataSource V2 scan ([[graft.sources.PingGen]]):
    * a deterministic synthetic ping table generated distributively at
    * read time. Registered as an oracle query because every field is a
    * pure function of the logical indices through the portable md5
    * hash — DuckDB reproduces the identical relation from
    * generate_series + the same arithmetic, so even the custom
    * connector is held to bit-for-bit parity.
    */
  def pingGenScan(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("ping_gen")
      .option("users", 50).option("days", 3).option("pings", 20)
      .load()

  /** File-provenance audit: rows per physical input file via
    * `input_file_name()` — the ingestion-debugging primitive ("which
    * file contributed these rows") that costs nothing because the
    * scan already knows its file. The oracle pins the expected
    * single-file layout of the test tables; in a multi-file lake the
    * same query audits per-partition row counts.
    */
  def fileProvenance(spark: SparkSession, dir: String): DataFrame = {
    def per(t: DataFrame, name: String) =
      t.groupBy(regexp_extract(input_file_name(), "[^/]+$", 0).as("file"))
        .agg(count(lit(1)).as("n_rows"))
        .select(lit(name).as("table"), col("file"), col("n_rows"))
    per(Tables.lineitem(spark, dir), "lineitem")
      .unionByName(per(Tables.orders(spark, dir), "orders"))
  }

  private val fileProvenanceSql =
    """SELECT 'lineitem' AS "table", 'lineitem.parquet' AS file,
      |  count(*) AS n_rows FROM lineitem
      |UNION ALL
      |SELECT 'orders', 'orders.parquet', count(*) FROM orders""".stripMargin

  /** Geohash-8 proximity keys over the customer-derived point set (the
    * point_in_polygon derivation: 2-decimal coords in [0, 20)²) — the
    * string-prefix layout key next to zorder/hilbert: truncating to 4
    * chars coarsens the cell, so equality on gh4 is a proximity
    * blocking join key and a balanced spatial partition key. One
    * projection, all built-in bit arithmetic ([[graft.functions.GeoHash]]),
    * codegen'd, oracle-identical.
    */
  def geohashEncode(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoHash
    Tables.customer(spark, dir)
      .select(col("c_custkey").as("pt_id"),
        (abs(col("c_acctbal")) % 20.0).as("lon"),
        ((col("c_custkey") % 2000).cast("double") / 100.0).as("lat"))
      .withColumn("n", GeoHash.interleaved(col("lat"), col("lon")))
      .select(col("pt_id"), col("lon"), col("lat"),
        GeoHash.encode8(col("n")).as("gh8"))
      .withColumn("gh4", substring(col("gh8"), 1, 4))
  }

  private val geohashEncodeSql = {
    import graft.functions.GeoHash
    s"""WITH pts AS (
       |  SELECT c_custkey AS pt_id,
       |    abs(c_acctbal) % 20.0 AS lon,
       |    CAST(c_custkey % 2000 AS DOUBLE) / 100.0 AS lat
       |  FROM customer),
       |iv AS (
       |  SELECT pt_id, lon, lat,
       |    ${GeoHash.interleavedSql("lat", "lon")} AS n
       |  FROM pts)
       |SELECT pt_id, lon, lat, ${GeoHash.encode8Sql("n")} AS gh8,
       |  substr(${GeoHash.encode8Sql("n")}, 1, 4) AS gh4
       |FROM iv""".stripMargin
  }

  val ops: Seq[Op] = Seq(
    Op("geohash_encode", geohashEncode, Some(geohashEncodeSql)),
    Op("zorder_key", zorderKey, Some(zorderKeySql)),
    Op("hilbert_key", hilbertKey, Some(hilbertKeySql), bench = true),
    Op("file_provenance", fileProvenance, Some(fileProvenanceSql)),
    Op("bloom_prune", bloomPrune, Some(bloomPruneSql)),
    Op("ping_gen_scan", pingGenScan,
      Some(graft.sources.PingGen.oracleSql(50, 3, 20))),
  )
}
