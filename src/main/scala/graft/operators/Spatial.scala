package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Op, Tables}
import graft.functions.GraftFunctions._

/** Spatial localization (SURVEY J7/F20/F15-F19):
  * point-in-polygon joins against a polygon catalog + hex-grid
  * indexing, mirroring the reference's FactPingsBase flow
  * (/root/reference/scripts/FactPingsBaseGenerator.py:52-138,
  * /root/reference/src/transforms/localization_transforms.py:44-61).
  *
  * Plan shape at scale: the polygon catalog is tiny and broadcast; the
  * fact side is pre-deduplicated on coordinates (J8 pattern) before the
  * nested-loop containment predicate, then joined back. GeoJSON parses
  * once on the catalog side via from_json, never per fact row.
  */
object Spatial {

  /** DuckDB-SQL mirror of the [[graft.functions.HexGrid]] kernels, so
    * the hex family is oracle-checkable: the axial transform, cube
    * rounding, id packing, centroid, and grid distance are all plain
    * floor/integer arithmetic. Every floating-point constant is spliced
    * from the SAME Java double the engine uses and wrapped in
    * CAST(... AS DOUBLE) — a bare decimal literal is DECIMAL in DuckDB
    * and would run exact decimal arithmetic instead of IEEE doubles,
    * breaking bit parity (measured: 1-ulp drift on ~1/3 of centroids).
    * Cube rounding is floor(x + 0.5) on BOTH sides (HexGrid.cubeRound
    * adopts the floor form precisely so this mirror is exact; neither
    * Java's Math.round nor DuckDB's round() could be matched by the
    * other engine on half-adjacent inputs).
    */
  private object HexSql {
    import graft.functions.HexGrid
    private def lit(v: Double): String = s"CAST($v AS DOUBLE)"
    private val cql = lit(math.sqrt(3.0) / 3.0)
    private val c23 = lit(2.0 / 3.0)
    private val sq3 = lit(math.sqrt(3.0))
    private val sq3h = lit(math.sqrt(3.0) / 2.0)

    /** fractional axial coords (qf, rf) of (latE, lonE) at `res`. */
    def qfRf(latE: String, lonE: String, res: Int): (String, String) = {
      val s = lit(HexGrid.edgeLengthDeg(res))
      (s"(($cql * ($lonE) - ($latE) / 3.0) / $s)",
        s"(($c23 * ($latE)) / $s)")
    }

    /** cube-round fractional axial columns (by name) to integer (q, r). */
    def roundQ(qf: String, rf: String): (String, String) = {
      val q0 = s"CAST(floor($qf + 0.5) AS BIGINT)"
      val r0 = s"CAST(floor($rf + 0.5) AS BIGINT)"
      val s0 = s"CAST(floor((- $qf - $rf) + 0.5) AS BIGINT)"
      val dq = s"abs($q0 - $qf)"
      val dr = s"abs($r0 - $rf)"
      val ds = s"abs($s0 - (- $qf - $rf))"
      (s"(CASE WHEN $dq > $dr AND $dq > $ds THEN - $r0 - $s0 ELSE $q0 END)",
        s"(CASE WHEN NOT ($dq > $dr AND $dq > $ds) AND $dr > $ds THEN - $q0 - $s0 ELSE $r0 END)")
    }

    /** packed 60-bit cell value (HexGrid.pack); fixed-width hex of this
      * sorts identically to the packed BIGINT, so ORDER BY/min on the
      * packed value matches the engine's string ordering.
      */
    def pack(q: String, r: String, res: Int): String =
      s"(((($q) + 33554432) * 33554432 + (($r) + 16777216)) * 16 + $res)"

    def hexStr(packed: String): String = s"printf('%015x', $packed)"

    def centerLat(r: String, res: Int): String =
      s"(${lit(HexGrid.edgeLengthDeg(res) * 1.5)} * ($r))"

    def centerLon(q: String, r: String, res: Int): String =
      s"(${lit(HexGrid.edgeLengthDeg(res))} * ($sq3 * ($q) + $sq3h * ($r)))"

    def gridDist(dq: String, dr: String): String =
      s"((abs($dq) + abs($dr) + abs(($dq) + ($dr))) // 2)"
  }

  /** GeoJSON Polygon "coordinates" schema: rings → points → [x, y]. */
  private val ringsType: DataType = ArrayType(ArrayType(ArrayType(DoubleType)))

  /** 4×4 tiling of [0.005, 20.005)²: square polygons as GeoJSON strings
    * (the catalog shape the reference loads —
    * notebooks/GeneratesMunicipioDB.ipynb cell 1). Edges sit on *.005
    * so 2-decimal point coordinates never touch a boundary.
    */
  private def polygonCatalog(spark: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = (for {
      i <- 0 until 4
      j <- 0 until 4
    } yield {
      val (x0, x1) = (5.0 * i + 0.005, 5.0 * i + 5.005)
      val (y0, y1) = (5.0 * j + 0.005, 5.0 * j + 5.005)
      val geo =
        s"""{"type":"Polygon","coordinates":[[[$x0,$y0],[$x1,$y0],[$x1,$y1],[$x0,$y1],[$x0,$y0]]]}"""
      org.apache.spark.sql.Row(f"P_${i}%d_${j}%d", geo)
    }).asJava
    val schema = StructType(Seq(
      StructField("poly_id", StringType, nullable = false),
      StructField("geometry", StringType, nullable = false)))
    spark.createDataFrame(rows, schema)
  }

  /** J7: left point-in-polygon join with sentinel fill. Points derive
    * deterministically from customer (2-decimal coords).
    */
  def pointInPolygon(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.customer(spark, dir)
      .select(col("c_custkey").as("pt_id"),
        (abs(col("c_acctbal")) % 20.0).as("x"),
        ((col("c_custkey") % 2000).cast("double") / 100.0).as("y"))
    val polys = polygonCatalog(spark)
      .select(col("poly_id"),
        from_json(get_json_object(col("geometry"), "$.coordinates"), ringsType)
          .as("rings"))
    pts.join(broadcast(polys), st_contains(col("rings"), col("x"), col("y")), "left")
      .select(col("pt_id"), col("x"), col("y"),
        coalesce(col("poly_id"), lit("0000000000000")).as("cve_geo"))
  }

  private val pointInPolygonSql = {
    val tiles = (for { i <- 0 until 4; j <- 0 until 4 } yield
      s"('P_${i}_${j}', ${5.0 * i + 0.005}, ${5.0 * i + 5.005}, ${5.0 * j + 0.005}, ${5.0 * j + 5.005})")
      .mkString(",\n    ")
    s"""WITH polys(poly_id, x0, x1, y0, y1) AS (VALUES
       |    $tiles),
       |pts AS (
       |  SELECT c_custkey AS pt_id,
       |    abs(c_acctbal) % 20.0 AS x,
       |    CAST(c_custkey % 2000 AS DOUBLE) / 100.0 AS y
       |  FROM customer)
       |SELECT pt_id, x, y,
       |  COALESCE(poly_id, '0000000000000') AS cve_geo
       |FROM pts LEFT JOIN polys
       |  ON x > x0 AND x < x1 AND y > y0 AND y < y1""".stripMargin
  }

  /** F15/F16/F19: hex-grid indexing of synthetic coordinates at res
    * 12/15 + parent + centroid columns (geo_to_h3 / h3_to_geo /
    * h3_to_parent analogs). Codegen'd Catalyst expressions;
    * oracle-checked bit-exactly via the [[HexSql]] SQL mirror.
    */
  def hexCells(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.events(spark, dir)
      .select(col("event_id"),
        ((col("value") % 120.0) - 60.0).as("lat"),
        (((col("event_id") % 3600).cast("double") / 10.0) - 180.0).as("lon"))
    pts
      .withColumn("cell15", hex_index(col("lat"), col("lon"), lit(15)))
      .withColumn("cell12", hex_index(col("lat"), col("lon"), lit(12)))
      .withColumn("parent12", hex_parent(col("cell15"), lit(12)))
      .withColumn("c_lat", hex_center_lat(col("cell15")))
      .withColumn("c_lon", hex_center_lon(col("cell15")))
  }

  private val hexCellsSql: String = {
    import HexSql._
    val (qf15, rf15) = qfRf("lat", "lon", 15)
    val (qf12, rf12) = qfRf("lat", "lon", 12)
    val (q15, r15) = roundQ("qf15", "rf15")
    val (q12, r12) = roundQ("qf12", "rf12")
    val (pqf, prf) = qfRf("c_lat", "c_lon", 12)
    val (pq, pr) = roundQ("pqf", "prf")
    s"""WITH pts AS (SELECT event_id, (value % 120.0) - 60.0 AS lat,
       |    CAST(event_id % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon FROM events),
       |frac AS (SELECT event_id, lat, lon, $qf15 AS qf15, $rf15 AS rf15,
       |    $qf12 AS qf12, $rf12 AS rf12 FROM pts),
       |ax AS (SELECT event_id, lat, lon, $q15 AS q15, $r15 AS r15,
       |    $q12 AS q12, $r12 AS r12 FROM frac),
       |ctr AS (SELECT *, ${centerLat("r15", 15)} AS c_lat,
       |    ${centerLon("q15", "r15", 15)} AS c_lon FROM ax),
       |pfrac AS (SELECT *, $pqf AS pqf, $prf AS prf FROM ctr)
       |SELECT event_id, lat, lon,
       |  ${hexStr(pack("q15", "r15", 15))} AS cell15,
       |  ${hexStr(pack("q12", "r12", 12))} AS cell12,
       |  ${hexStr(pack(pq, pr, 12))} AS parent12,
       |  c_lat, c_lon
       |FROM pfrac""".stripMargin
  }

  /** True-H3 indexing of the same synthetic coordinates at res 12/15
    * (the reference's exact NTLTransforms.py:71-73 column set:
    * h3index_12, h3index_15, parent): bit-compatible H3 ids via
    * [[graft.functions.H3Core]], so data indexed here joins against
    * existing H3-keyed datasets. Not SQL-expressible → rows-only in
    * the oracle; correctness is pinned by H3Spec's published golden
    * vectors and the hierarchy/validity property tests.
    */
  def h3Cells(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.events(spark, dir)
      .select(col("event_id"),
        ((col("value") % 120.0) - 60.0).as("lat"),
        (((col("event_id") % 3600).cast("double") / 10.0) - 180.0).as("lon"))
    pts
      .withColumn("h3index_15", h3_index(col("lat"), col("lon"), lit(15)))
      .withColumn("h3index_12", h3_index(col("lat"), col("lon"), lit(12)))
      .withColumn("parent12", h3_parent(col("h3index_15"), lit(12)))
      .withColumn("res", h3_resolution(col("h3index_15")))
      .withColumn("pent", h3_is_pentagon(col("h3index_12")))
      .withColumn("c_lat", h3_center_lat(col("h3index_15")))
      .withColumn("c_lon", h3_center_lon(col("h3index_15")))
  }

  /** Scorecard form of [[h3Cells]] (r8, VERDICT r7 #4): H3 is not
    * SQL-expressible, so the rows-only row is converted to a
    * hash-comparable one — oracle-expressible anchors (event_id, lat,
    * lon) ride next to ENGINE-VERIFIED invariant booleans, and the
    * oracle emits the same anchors with literal TRUEs. Any H3 kernel
    * regression flips a boolean and the row hash goes red in the
    * driver artifact instead of recording "no_oracle". Invariants:
    * resolution encoding; hierarchy (the res-15 cell's parent is the
    * direct res-12 index or its neighbor — exact equality does NOT
    * hold near cell boundaries, the published H3 hierarchy caveat);
    * bit-exact center round-trip (H3Spec pins it per-res globally);
    * center proximity (res-15 cells are ~1 m — 0.001°/0.01° bounds
    * are ~100×). A golden block (event_id −9) pins the H3 docs' SF
    * worked example — cell id, parent id, decoded center, 1-ring —
    * so published-vector bit-compatibility itself is in the scorecard.
    */
  def h3CellsVerdict(spark: SparkSession, dir: String): DataFrame = {
    val base = h3Cells(spark, dir)
    val corpus = base.select(
      col("event_id"), col("lat"), col("lon"),
      (h3_resolution(col("h3index_15")) === 15 &&
        h3_resolution(col("h3index_12")) === 12 &&
        h3_resolution(col("parent12")) === 12).as("res_ok"),
      // grid_distance returns a negative sentinel for un-rankable
      // cross-fold pairs (the documented h3lib error surface, see
      // h3Rg's r >= 0 filter) — treat "un-rankable" as pass so an
      // icosahedron-fold-straddling fixture point can't red-flag the
      // scorecard as a kernel regression (r8 advice).
      (h3_grid_distance(col("h3index_12"), col("parent12")) < 0 ||
        h3_grid_distance(col("h3index_12"), col("parent12"))
          .between(0, 1)).as("hier_ok"),
      (h3_index(col("c_lat"), col("c_lon"), lit(15)) === col("h3index_15"))
        .as("roundtrip_ok"),
      (abs(col("c_lat") - col("lat")) <= 0.001 &&
        least(abs(col("c_lon") - col("lon")),
          lit(360.0) - abs(col("c_lon") - col("lon"))) <= 0.01).as("center_ok"),
      lit(true).as("golden_ok"))
    val sfCell = "8928308280fffff"
    val ring = Seq("8928308280fffff", "8928308280bffff", "89283082873ffff",
      "89283082877ffff", "8928308283bffff", "89283082807ffff",
      "89283082803ffff")
    val golden = spark.range(1).select(
      lit(-9L).as("event_id"), lit(GoldenSfLat).as("lat"),
      lit(GoldenSfLon).as("lon"),
      lit(true).as("res_ok"), lit(true).as("hier_ok"),
      lit(true).as("roundtrip_ok"), lit(true).as("center_ok"),
      (h3_index(lit(GoldenSfLat), lit(GoldenSfLon), lit(9)) === sfCell &&
        h3_parent(lit(sfCell), lit(8)) === "8828308281fffff" &&
        abs(h3_center_lat(lit(sfCell)) - 37.77670234943567) < 1e-9 &&
        abs(h3_center_lon(lit(sfCell)) - (-122.41845932318311)) < 1e-9 &&
        (array_sort(h3_kring(lit(sfCell), lit(1))) ===
          array_sort(array(ring.map(lit(_)): _*)))).as("golden_ok"))
    corpus.unionByName(golden)
  }

  /** The H3 docs' worked example point (latLngToCell → 8928308280fffff). */
  private val GoldenSfLat = 37.7752702151959257
  private val GoldenSfLon = -122.418307270836565

  private val h3CellsVerdictSql =
    s"""SELECT event_id, (value % 120.0) - 60.0 AS lat,
       |  CAST(event_id % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon,
       |  true AS res_ok, true AS hier_ok, true AS roundtrip_ok,
       |  true AS center_ok, true AS golden_ok
       |FROM events
       |UNION ALL
       |SELECT CAST(-9 AS BIGINT), CAST('$GoldenSfLat' AS DOUBLE),
       |  CAST('$GoldenSfLon' AS DOUBLE), true, true, true, true, true""".stripMargin

  /** Radius of gyration on TRUE H3 grid distances + k-ring
    * neighborhood occupancy of each home cell — the reference's
    * RadiusOfGyrationHandler.py:139-140 h3_distance and
    * home_ageb_imputers.py:36-39 k_ring shapes on bit-compatible H3
    * ids. Coarse res 7 keeps the per-row distance/k-ring kernels
    * (center-decode + common-frame projection) cheap. Rows-only;
    * the kernels are golden/property-verified in H3Spec.
    */
  def h3Rg(spark: SparkSession, dir: String): DataFrame = {
    val visits = Tables.events(spark, dir)
      .select(col("user_id").as("caid"),
        h3_index((col("value") % 120.0) - 60.0,
          ((col("event_id") % 3600).cast("double") / 10.0) - 180.0, lit(7))
          .as("cell"))
      .distinct()
    val homes = visits.groupBy(col("caid")).agg(min(col("cell")).as("home_cell"))
    val rg = visits.join(homes.hint("shuffle_hash"), Seq("caid"))
      .select(col("caid"), col("home_cell"),
        h3_grid_distance(col("cell"), col("home_cell")).as("r_i"))
      .where(col("r_i") >= 0) // cross-fold pairs are un-rankable (H3 error surface)
      .groupBy(col("caid"), col("home_cell"))
      .agg(count(lit(1)).as("n"), sum(col("r_i") * col("r_i")).as("sum_r2"))
      .select(col("caid"), col("home_cell"), col("n"),
        sqrt(col("sum_r2").cast("double") / col("n")).as("rg"))
    rg.withColumn("ring1_size", size(h3_kring(col("home_cell"), lit(1))))
  }

  /** Scorecard form of [[h3Rg]] (r8, VERDICT r7 #4): per-device
    * anchor (caid, distinct point count — both oracle-expressible)
    * plus engine-verified invariants — visited-cell count bounded by
    * the point count (a cell is a function of its point), rg finite
    * and non-negative, home 1-ring arity 6/7 (pentagon/hexagon). The
    * exact rg VALUES are pinned by H3Spec's independent reference
    * model; this row makes their structural sanity hash-comparable
    * in the driver artifact.
    */
  def h3RgVerdict(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.events(spark, dir)
      .select(col("user_id").as("caid"),
        ((col("value") % 120.0) - 60.0).as("lat"),
        (((col("event_id") % 3600).cast("double") / 10.0) - 180.0).as("lon"))
    val nPts = pts.distinct()
      .groupBy(col("caid")).agg(count(lit(1)).as("n_points"))
    // both sides are device-cardinality (10⁷–10⁸ in production):
    // pin shuffle-hash so fixture-scale AQE can't bake in a broadcast
    h3Rg(spark, dir).join(nPts.hint("shuffle_hash"), Seq("caid"))
      .select(col("caid"), col("n_points"),
        (col("n") >= 1 && col("n") <= col("n_points")).as("n_ok"),
        (col("rg").isNotNull && col("rg") >= 0.0 &&
          !isnan(col("rg"))).as("rg_ok"),
        col("ring1_size").isin(6, 7).as("ring_ok"))
  }

  private val h3RgVerdictSql =
    """WITH pts AS (
      |  SELECT DISTINCT user_id AS caid, (value % 120.0) - 60.0 AS lat,
      |    CAST(event_id % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon
      |  FROM events)
      |SELECT caid, CAST(count(*) AS BIGINT) AS n_points,
      |  true AS n_ok, true AS rg_ok, true AS ring_ok
      |FROM pts GROUP BY 1""".stripMargin

  /** F18: k-ring neighborhood explode (spatial imputer shape,
    * home_ageb_imputers.py:36-51): each cell expands to its 3k(k+1)+1
    * ring cells, joined back to find occupied neighbors.
    */
  def hexKringNeighbors(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(spark, dir)
      .select(col("user_id"),
        hex_index((col("value") % 120.0) - 60.0,
          ((col("event_id") % 3600).cast("double") / 10.0) - 180.0, lit(12))
          .as("cell12"))
      .distinct()
    val occupied = cells.groupBy(col("cell12"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    cells
      .select(col("user_id"), col("cell12"),
        explode(hex_kring(col("cell12"), lit(1))).as("neighbor"))
      .join(occupied.withColumnRenamed("cell12", "neighbor"), Seq("neighbor"))
      .groupBy(col("user_id"), col("cell12"))
      .agg(sum(col("n_users")).as("neighborhood_users"))
  }

  private val hexKringNeighborsSql: String = {
    import HexSql._
    val (qf12, rf12) = qfRf("lat", "lon", 12)
    val (q, r) = roundQ("qf", "rf")
    s"""WITH pts AS (SELECT user_id, (value % 120.0) - 60.0 AS lat,
       |    CAST(event_id % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon FROM events),
       |frac AS (SELECT user_id, $qf12 AS qf, $rf12 AS rf FROM pts),
       |cells AS (SELECT DISTINCT user_id, $q AS q, $r AS r FROM frac),
       |occupied AS (SELECT q, r, count(DISTINCT user_id) AS n_users
       |  FROM cells GROUP BY 1, 2),
       |offs(dq, dr) AS (VALUES (-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0)),
       |nb AS (SELECT c.user_id, c.q, c.r, c.q + o.dq AS nq, c.r + o.dr AS nr
       |  FROM cells c CROSS JOIN offs o)
       |SELECT nb.user_id, ${hexStr(pack("nb.q", "nb.r", 12))} AS cell12,
       |  CAST(sum(occ.n_users) AS BIGINT) AS neighborhood_users
       |FROM nb JOIN occupied occ ON occ.q = nb.nq AND occ.r = nb.nr
       |GROUP BY 1, 2""".stripMargin
  }

  /** F17: radius of gyration on true hex grid distances
    * (RadiusOfGyrationHandler.py:139-140 analog).
    */
  def hexRg(spark: SparkSession, dir: String): DataFrame = {
    val visits = Tables.events(spark, dir)
      .select(col("user_id").as("caid"),
        hex_index((col("value") % 120.0) - 60.0,
          ((col("event_id") % 3600).cast("double") / 10.0) - 180.0, lit(12))
          .as("cell"))
      .distinct()
    val homes = visits.groupBy(col("caid"))
      .agg(min(col("cell")).as("home_cell"))
    visits.join(homes, Seq("caid"))
      .select(col("caid"), hex_grid_distance(col("cell"), col("home_cell")).as("r_i"))
      .groupBy(col("caid"))
      .agg(count(lit(1)).as("n"), sum(col("r_i") * col("r_i")).as("sum_r2"))
      .select(col("caid"), col("n"),
        sqrt(col("sum_r2").cast("double") / col("n")).as("rg"))
  }

  private val hexRgSql: String = {
    import HexSql._
    val (qf12, rf12) = qfRf("lat", "lon", 12)
    val (q, r) = roundQ("qf", "rf")
    s"""WITH pts AS (SELECT user_id AS caid, (value % 120.0) - 60.0 AS lat,
       |    CAST(event_id % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon FROM events),
       |frac AS (SELECT caid, $qf12 AS qf, $rf12 AS rf FROM pts),
       |cells AS (SELECT DISTINCT caid, $q AS q, $r AS r FROM frac),
       |packed AS (SELECT caid, q, r, ${pack("q", "r", 12)} AS cell FROM cells),
       |homes AS (SELECT caid, min(cell) AS home_cell FROM packed GROUP BY 1),
       |dists AS (SELECT p.caid, ${gridDist("p.q - hq.q", "p.r - hq.r")} AS r_i
       |  FROM packed p JOIN homes h ON p.caid = h.caid
       |  JOIN packed hq ON hq.caid = p.caid AND hq.cell = h.home_cell)
       |SELECT caid, count(*) AS n,
       |  sqrt(CAST(sum(r_i * r_i) AS DOUBLE) / count(*)) AS rg
       |FROM dists GROUP BY 1""".stripMargin
  }

  /** Spatial fixpoint imputer (NullLocationImputer,
    * /root/reference/src/imputers/home_ageb_imputers.py:20-96): devices
    * whose point landed in no polygon get an expanding k-ring search —
    * ring k's cell centroids are point-in-polygon tested against the
    * broadcast catalog, the winner picked by ROW_NUMBER ... ORDER BY
    * cve NULLS LAST, and only still-unmatched devices proceed to ring
    * k+1 (early-exit when none remain). Driver-side loop of lazy Spark
    * stages, exactly the reference's `for i in range(5)` + break.
    */
  def imputeByKRing(spark: SparkSession, dir: String, maxK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = Tables.customer(spark, dir)
      .select(col("c_custkey").as("pt_id"),
        (abs(col("c_acctbal")) % 20.0).as("x"),
        ((col("c_custkey") % 2000).cast("double") / 100.0).as("y"))
    val polys = polygonCatalog(spark)
      .select(col("poly_id"),
        from_json(get_json_object(col("geometry"), "$.coordinates"), ringsType)
          .as("rings"))
    val located = pts
      .join(broadcast(polys), st_contains(col("rings"), col("x"), col("y")), "left")
      .select(col("pt_id"), col("x"), col("y"), col("poly_id"))
    // r2 cache discipline (VERDICT r1 #7): the accumulated result is
    // materialized eagerly each round, so every per-round intermediate
    // (ranked) can be unpersisted inside the loop — nothing survives
    // the loop except `unlocated` (freed before return) and the single
    // cached result handle the caller materializes from. `remains` is
    // re-derived flat (unlocated ∖ imputed) instead of a nested
    // anti-join chain, so its lineage stays depth-1 at every k.
    val unlocated = located.where(col("poly_id").isNull)
      .select(col("pt_id"),
        hex_index(col("y"), col("x"), lit(6)).as("cell"))
      .cache()
    var imputed = located.where(col("poly_id").isNotNull)
      .select(col("pt_id"), col("poly_id"), lit(0).as("k"))
      .cache()
    imputed.count()
    var remains = unlocated
    var k = 1
    while (k <= maxK && !remains.isEmpty) {
      // ring-k ANNULUS, not the full k-disk: every interior cell was
      // already tested (and matchless — else the point would have left
      // `remains`) in an earlier round. Disk candidates are 3k(k+1)+1
      // per point vs 6k for the annulus — O(k²) vs O(k) per round.
      // k=1 keeps the full disk so the point's own cell centroid is
      // tested exactly once.
      val ring =
        if (k == 1) hex_kring(col("cell"), lit(1))
        else array_except(hex_kring(col("cell"), lit(k)),
          hex_kring(col("cell"), lit(k - 1)))
      val candidates = remains
        .select(col("pt_id"), explode(ring).as("nb"))
        .select(col("pt_id"), col("nb"),
          hex_center_lat(col("nb")).as("ny"), hex_center_lon(col("nb")).as("nx"))
        .join(broadcast(polys), st_contains(col("rings"), col("nx"), col("ny")), "left")
      val w = Window.partitionBy(col("pt_id"))
        .orderBy(col("poly_id").asc_nulls_last, col("nb").asc)
      val ranked = candidates
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") === 1)
        .cache()
      val nextImputed = imputed.unionByName(
        ranked.where(col("poly_id").isNotNull)
          .select(col("pt_id"), col("poly_id"), lit(k).as("k")))
        .cache()
      nextImputed.count()
      ranked.unpersist()
      imputed.unpersist()
      imputed = nextImputed
      remains = unlocated.join(imputed.select(col("pt_id")), Seq("pt_id"), "left_anti")
      k += 1
    }
    unlocated.unpersist()
    imputed
  }

  /** SQL mirror of [[imputeByKRing]]'s expanding-ring loop, unrolled:
    * the k-round loop over ring annuli is equivalent to scoring every
    * disk cell (grid distance ≤ maxK) once with its ring number rk
    * (distance-0 cells are tested in round 1), then taking the row
    * minimal in (rk, poly_id, packed-cell) per point — smallest ring
    * with a polygon match, the reference's NULLS-LAST row_number pick
    * within it. Packed-BIGINT cell ordering equals the engine's
    * fixed-width hex string ordering.
    */
  private val imputeByKRingSql: String = {
    import HexSql._
    val tiles = (for { i <- 0 until 4; j <- 0 until 4 } yield
      s"('P_${i}_${j}', ${5.0 * i + 0.005}, ${5.0 * i + 5.005}, ${5.0 * j + 0.005}, ${5.0 * j + 5.005})")
      .mkString(",\n    ")
    val (qf6, rf6) = qfRf("y", "x", 6)
    val (q, r) = roundQ("qf", "rf")
    val d = "((abs(dq) + abs(dr) + abs(dq + dr)) // 2)"
    s"""WITH polys(poly_id, x0, x1, y0, y1) AS (VALUES
       |    $tiles),
       |pts AS (SELECT c_custkey AS pt_id, abs(c_acctbal) % 20.0 AS x,
       |    CAST(c_custkey % 2000 AS DOUBLE) / 100.0 AS y FROM customer),
       |located AS (
       |  SELECT pt_id, x, y, poly_id FROM pts LEFT JOIN polys
       |    ON x > x0 AND x < x1 AND y > y0 AND y < y1),
       |frac AS (SELECT pt_id, $qf6 AS qf, $rf6 AS rf
       |  FROM located WHERE poly_id IS NULL),
       |cells AS (SELECT pt_id, $q AS q, $r AS r FROM frac),
       |offs AS (SELECT dq, dr,
       |    CASE WHEN $d = 0 THEN 1 ELSE $d END AS rk
       |  FROM (SELECT a.x AS dq, b.x AS dr FROM range(-5, 6) a(x), range(-5, 6) b(x))
       |  WHERE $d <= 5),
       |cand AS (SELECT c.pt_id, o.rk, c.q + o.dq AS nq, c.r + o.dr AS nr
       |  FROM cells c CROSS JOIN offs o),
       |cent AS (SELECT pt_id, rk, ${pack("nq", "nr", 6)} AS nb,
       |    ${centerLat("nr", 6)} AS ny, ${centerLon("nq", "nr", 6)} AS nx FROM cand),
       |matched AS (SELECT cent.pt_id, cent.rk, cent.nb, p.poly_id
       |  FROM cent JOIN polys p
       |    ON nx > p.x0 AND nx < p.x1 AND ny > p.y0 AND ny < p.y1),
       |winner AS (SELECT pt_id, poly_id, rk AS k FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY pt_id
       |      ORDER BY rk ASC, poly_id ASC, nb ASC) AS rnk FROM matched)
       |  WHERE rnk = 1)
       |SELECT pt_id, poly_id, CAST(0 AS INTEGER) AS k
       |FROM located WHERE poly_id IS NOT NULL
       |UNION ALL
       |SELECT pt_id, poly_id, CAST(k AS INTEGER) AS k FROM winner""".stripMargin
  }

  /** F20: CRS re-projection stage — the reference's
    * `to_crs("EPSG:4326")` catalog step (RadiusOfGyrationHandler.py:
    * 73-85) as a ONE-pass projected→geographic→hex-index pipeline over
    * synthetic EPSG:6365 coordinates derived from customer. Runs on the
    * catalog side before any broadcast join — never per ping.
    *
    * Oracle-checkable: lon/lat round to 6 dp (0.1 m — beyond the
    * sub-meter ITRF2008≈WGS84 agreement this stage models) so libm
    * ulp drift between JVM and DuckDB can't surface, and the hex cell
    * is indexed from the ROUNDED coordinates so cell parity follows
    * from coordinate parity. The SQL mirror replays the exact Snyder
    * inverse with the engine's own constants ([[CrsHelpers.SqlConsts]])
    * and the same fixed 8-round t⁻¹ iteration. Round-trip and
    * invariants additionally spec-verified (R2Spec).
    */
  def crsReproject(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        (lit(2300000.0) + (col("c_custkey") % 4000).cast("double") * 100.0).as("easting"),
        (lit(800000.0) + (abs(col("c_acctbal")) % 9000.0) * 100.0).as("northing"))
      .withColumn("lon", round(lcc_lon(col("easting"), col("northing")), 6))
      .withColumn("lat", round(lcc_lat(col("easting"), col("northing")), 6))
      .withColumn("cell", hex_index(col("lat"), col("lon"), lit(9)))

  private val crsReprojectSql: String = {
    import HexSql._
    import graft.functions.CrsHelpers.{SqlConsts => C}
    def lit(v: Double): String = s"CAST($v AS DOUBLE)"
    // One fixed-point round: phi <- pi/2 - 2*atan(t * ((1-e*sin phi)/(1+e*sin phi))^(e/2))
    def step(phi: String): String =
      s"${lit(C.halfPi)} - 2 * atan(t * pow((1 - ${lit(C.e)} * sin($phi)) / " +
        s"(1 + ${lit(C.e)} * sin($phi)), ${lit(C.eHalf)}))"
    val iters = (1 to 8).map(i =>
      s"it$i AS (SELECT * REPLACE ((${step("phi")}) AS phi) FROM it${i - 1})")
      .mkString(",\n")
    val (qf, rf) = qfRf("lat", "lon", 9)
    val (q9, r9) = roundQ("qf", "rf")
    s"""WITH pts AS (SELECT c_custkey,
       |    CAST(2300000.0 AS DOUBLE) + CAST(c_custkey % 4000 AS DOUBLE) * 100.0 AS easting,
       |    CAST(800000.0 AS DOUBLE) + (abs(c_acctbal) % 9000.0) * 100.0 AS northing
       |  FROM customer),
       |xy AS (SELECT *, easting - ${lit(C.falseE)} AS x,
       |    ${lit(C.rho0C)} - (northing - ${lit(C.falseN)}) AS y FROM pts),
       |it0 AS (SELECT *,
       |    pow(sqrt(x * x + y * y) / ${lit(C.aBigF)}, ${lit(C.invN)}) AS t,
       |    ${lit(C.halfPi)} - 2 * atan(pow(sqrt(x * x + y * y) / ${lit(C.aBigF)}, ${lit(C.invN)})) AS phi
       |  FROM xy),
       |$iters,
       |geo AS (SELECT c_custkey, easting, northing,
       |    round((atan2(x, y) / ${lit(C.nConst)} + ${lit(C.lon0)}) * 180.0 / ${lit(C.pi)}, 6) AS lon,
       |    round(phi * 180.0 / ${lit(C.pi)}, 6) AS lat FROM it8),
       |frac AS (SELECT *, $qf AS qf, $rf AS rf FROM geo)
       |SELECT c_custkey, easting, northing, lon, lat,
       |  ${hexStr(pack(q9, r9, 9))} AS cell
       |FROM frac""".stripMargin
  }

  /** F20 generalized (r6 verdict missing #2): the CRS family past the
    * single EPSG:6365 LCC pair — WGS84 UTM (Transverse Mercator,
    * Snyder pp. 60-64, zone 14N covering the reference's Mexico
    * geography) forward + inverse round-trip, and Web Mercator
    * (EPSG:3857) forward, over synthetic lon/lat derived from
    * customer. Same catalog-side discipline as [[crsReproject]]:
    * projection runs once per catalog row, never per ping.
    *
    * Oracle-checkable: every formula is a FIXED double-op sequence
    * (explicit x·x·x powers, no libm pow) the SQL mirror replays
    * term-for-term with the engine's own derived constants spliced as
    * literals ([[graft.functions.TmHelpers.SqlConsts]]); meters round
    * to 3 dp (mm), degrees to 6 dp (0.1 m), and the inverse consumes
    * the ROUNDED forward columns so its parity follows from theirs.
    */
  def crsUtmWebmerc(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        (lit(-102.0) + (col("c_custkey") % 600).cast("double") / 100.0).as("lon"),
        (lit(14.0) + (abs(col("c_acctbal")) % 1500.0) / 100.0).as("lat"))
      .withColumn("utm_e", round(call_function("utm_easting",
        col("lon"), col("lat"), lit(14)), 3))
      .withColumn("utm_n", round(call_function("utm_northing",
        col("lon"), col("lat"), lit(14)), 3))
      .withColumn("lon2", round(call_function("utm_lon",
        col("utm_e"), col("utm_n"), lit(14)), 6))
      .withColumn("lat2", round(call_function("utm_lat",
        col("utm_e"), col("utm_n"), lit(14)), 6))
      .withColumn("wm_x", round(call_function("webmerc_x", col("lon")), 3))
      .withColumn("wm_y", round(call_function("webmerc_y", col("lat")), 3))

  private val crsUtmWebmercSql: String = {
    import graft.functions.TmHelpers.{SqlConsts => T}
    def L(v: Double): String = s"CAST($v AS DOUBLE)"
    val a = L(T.a); val e2 = L(T.e2); val ep2 = L(T.ep2); val k0 = L(T.k0)
    val fe = L(T.falseE); val pi = L(T.pi); val qpi = L(T.quarterPi)
    val lon0 = L(T.lon0Rad(14))
    s"""WITH pts AS (SELECT c_custkey,
       |    -102.0 + CAST(c_custkey % 600 AS DOUBLE) / 100.0 AS lon,
       |    14.0 + (abs(c_acctbal) % 1500.0) / 100.0 AS lat FROM customer),
       |f0 AS (SELECT *, lat / 180.0 * $pi AS phi, lon / 180.0 * $pi AS lam FROM pts),
       |f1 AS (SELECT *, sin(phi) AS sp, cos(phi) AS cp, tan(phi) AS tp FROM f0),
       |f2 AS (SELECT *,
       |    $a / sqrt(1 - $e2 * sp * sp) AS nv,
       |    tp * tp AS t,
       |    $ep2 * cp * cp AS c,
       |    (lam - $lon0) * cp AS aa,
       |    $a * (${L(T.m0c)} * phi - ${L(T.m2c)} * sin(2 * phi)
       |      + ${L(T.m4c)} * sin(4 * phi) - ${L(T.m6c)} * sin(6 * phi)) AS m
       |  FROM f1),
       |fwd AS (SELECT c_custkey, lon, lat,
       |    round($fe + $k0 * nv * (aa + (1 - t + c) * (aa * aa * aa) / 6
       |      + (5 - 18 * t + t * t + 72 * c - 58 * $ep2)
       |        * (aa * aa * aa * aa * aa) / 120), 3) AS utm_e,
       |    round($k0 * (m + nv * tp * ((aa * aa) / 2
       |      + (5 - t + 9 * c + 4 * c * c) * (aa * aa * aa * aa) / 24
       |      + (61 - 58 * t + t * t + 600 * c - 330 * $ep2)
       |        * (aa * aa * aa * aa * aa * aa) / 720)), 3) AS utm_n
       |  FROM f2),
       |i0 AS (SELECT *, (utm_n / $k0) / ($a * ${L(T.m0c)}) AS mu FROM fwd),
       |i1 AS (SELECT *, mu + ${L(T.f2c)} * sin(2 * mu) + ${L(T.f4c)} * sin(4 * mu)
       |    + ${L(T.f6c)} * sin(6 * mu) + ${L(T.f8c)} * sin(8 * mu) AS phi1 FROM i0),
       |i2 AS (SELECT *, sin(phi1) AS sp1, cos(phi1) AS cp1, tan(phi1) AS tp1 FROM i1),
       |i3 AS (SELECT *, $ep2 * cp1 * cp1 AS c1, tp1 * tp1 AS t1,
       |    1 - $e2 * sp1 * sp1 AS om FROM i2),
       |i4 AS (SELECT *, $a / sqrt(om) AS n1,
       |    $a * (1 - $e2) / (om * sqrt(om)) AS r1 FROM i3),
       |i5 AS (SELECT *, (utm_e - $fe) / (n1 * $k0) AS d FROM i4),
       |inv AS (SELECT c_custkey, lon, lat, utm_e, utm_n,
       |    round(($lon0 + (d - (1 + 2 * t1 + c1) * (d * d * d) / 6
       |      + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * $ep2 + 24 * t1 * t1)
       |        * (d * d * d * d * d) / 120) / cp1) * 180.0 / $pi, 6) AS lon2,
       |    round((phi1 - (n1 * tp1 / r1) * ((d * d) / 2
       |      - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * $ep2)
       |        * (d * d * d * d) / 24
       |      + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * $ep2 - 3 * c1 * c1)
       |        * (d * d * d * d * d * d) / 720)) * 180.0 / $pi, 6) AS lat2
       |  FROM i5)
       |SELECT c_custkey, lon, lat, utm_e, utm_n, lon2, lat2,
       |  round($a * (lon / 180.0 * $pi), 3) AS wm_x,
       |  round($a * ln(tan($qpi + (lat / 180.0 * $pi) / 2)), 3) AS wm_y
       |FROM inv""".stripMargin
  }

  /** F20 parameterized (r7): the LCC family is no longer one
    * hardwired CRS — [[graft.functions.Lcc2sp]] takes arbitrary
    * published 2SP parameters, and this query exercises a SECOND
    * registered instance (EPSG:3347, NAD83 / Statistics Canada
    * Lambert) forward AND inverse over synthetic Canadian lon/lat
    * derived from part. The SQL mirror is built by
    * [[lccRoundTripSql]], a parameter-driven template that splices
    * any instance's derived constants — adding a CRS adds no new
    * oracle code. Meters round 3 dp, degrees 6 dp, inverse consumes
    * the ROUNDED forward columns (the crs_utm_webmerc discipline).
    */
  def crsLccParam(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"),
        (lit(-120.0) + (col("p_partkey") % 4000).cast("double") / 100.0).as("lon"),
        (lit(46.0) + (col("p_partkey") % 2800).cast("double") / 100.0).as("lat"))
      .withColumn("e", round(call_function("lcc_crs_easting",
        lit("EPSG:3347"), col("lon"), col("lat")), 3))
      .withColumn("n", round(call_function("lcc_crs_northing",
        lit("EPSG:3347"), col("lon"), col("lat")), 3))
      .withColumn("lon2", round(call_function("lcc_crs_lon",
        lit("EPSG:3347"), col("e"), col("n")), 6))
      .withColumn("lat2", round(call_function("lcc_crs_lat",
        lit("EPSG:3347"), col("e"), col("n")), 6))

  /** Parameter-driven Snyder LCC forward+inverse SQL template: emits
    * the same fixed op sequences as [[graft.functions.Lcc2sp]] with
    * the instance's derived constants spliced as literals (the
    * crsReprojectSql discipline, generalized to any instance).
    * `ptsSql` must provide (keyCol, lon, lat).
    */
  private def lccRoundTripSql(proj: graft.functions.Lcc2sp,
      ptsSql: String, keyCol: String): String = {
    val C = proj.SqlC
    def lit(v: Double): String = s"CAST($v AS DOUBLE)"
    def step(phi: String): String =
      s"${lit(C.halfPi)} - 2 * atan(t * pow((1 - ${lit(C.e)} * sin($phi)) / " +
        s"(1 + ${lit(C.e)} * sin($phi)), ${lit(C.eHalf)}))"
    val iters = (1 to 8).map(i =>
      s"it$i AS (SELECT * REPLACE ((${step("phi")}) AS phi) FROM it${i - 1})")
      .mkString(",\n")
    s"""WITH pts AS ($ptsSql),
       |tv AS (SELECT *,
       |    tan(${lit(C.quarterPi)} - (lat / 180.0 * ${lit(C.pi)}) / 2)
       |      / pow((1 - ${lit(C.e)} * sin(lat / 180.0 * ${lit(C.pi)}))
       |        / (1 + ${lit(C.e)} * sin(lat / 180.0 * ${lit(C.pi)})),
       |        ${lit(C.eHalf)}) AS tf
       |  FROM pts),
       |rho AS (SELECT *, ${lit(C.aBigF)} * pow(tf, ${lit(C.nConst)}) AS r,
       |    ${lit(C.nConst)} * (lon / 180.0 * ${lit(C.pi)} - ${lit(C.lon0)}) AS th
       |  FROM tv),
       |fwd AS (SELECT $keyCol, lon, lat,
       |    round(${lit(C.falseE)} + r * sin(th), 3) AS e,
       |    round(${lit(C.falseN)} + ${lit(C.rho0C)} - r * cos(th), 3) AS n
       |  FROM rho),
       |xy AS (SELECT *, e - ${lit(C.falseE)} AS x,
       |    ${lit(C.rho0C)} - (n - ${lit(C.falseN)}) AS y FROM fwd),
       |it0 AS (SELECT *,
       |    pow(sqrt(x * x + y * y) / ${lit(C.aBigF)}, ${lit(C.invN)}) AS t,
       |    ${lit(C.halfPi)} - 2 * atan(pow(sqrt(x * x + y * y) / ${lit(C.aBigF)}, ${lit(C.invN)})) AS phi
       |  FROM xy),
       |$iters
       |SELECT $keyCol, lon, lat, e, n,
       |  round((atan2(x, y) / ${lit(C.nConst)} + ${lit(C.lon0)}) * 180.0 / ${lit(C.pi)}, 6) AS lon2,
       |  round(phi * 180.0 / ${lit(C.pi)}, 6) AS lat2
       |FROM it8""".stripMargin
  }

  private val crsLccParamSql: String = lccRoundTripSql(
    graft.functions.CrsRegistry.Epsg3347,
    """SELECT p_partkey,
      |    -120.0 + CAST(p_partkey % 4000 AS DOUBLE) / 100.0 AS lon,
      |    46.0 + CAST(p_partkey % 2800 AS DOUBLE) / 100.0 AS lat
      |  FROM part""".stripMargin,
    "p_partkey")

  /** F20 polar family (r8): Polar Stereographic north aspect
    * (EPSG:3413, NSIDC Sea Ice North — the CRS polar sea-ice/DEM/
    * climate catalogs ship in), forward AND inverse over synthetic
    * arctic lon/lat derived from customer. With LCC (conic) and
    * UTM/WebMercator (cylindrical) this covers the third and last
    * projection class real catalogs arrive in. Same discipline:
    * meters round 3 dp, degrees 6 dp, inverse consumes the ROUNDED
    * forward columns, and the SQL mirror splices the instance's
    * derived constants through a parameter-driven template.
    */
  def crsPolarStereo(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        (lit(-180.0) + (col("c_custkey") % 7200).cast("double") / 20.0).as("lon"),
        (lit(60.0) + (col("c_custkey") % 2600).cast("double") / 100.0).as("lat"))
      // + 0.0 normalizes IEEE −0.0: at lon = CM±90° the northing is
      // −ρ·cos(π/2) ≈ −1e-10, which rounds to −0.0 in DuckDB but +0.0
      // through Spark's BigDecimal round — the embedding_whiten r8
      // lesson, applied on BOTH engines
      .withColumn("e", round(call_function("ps_crs_easting",
        lit("EPSG:3413"), col("lon"), col("lat")), 3) + lit(0.0))
      .withColumn("n", round(call_function("ps_crs_northing",
        lit("EPSG:3413"), col("lon"), col("lat")), 3) + lit(0.0))
      .withColumn("lon2", round(call_function("ps_crs_lon",
        lit("EPSG:3413"), col("e"), col("n")), 6) + lit(0.0))
      .withColumn("lat2", round(call_function("ps_crs_lat",
        lit("EPSG:3413"), col("e"), col("n")), 6) + lit(0.0))

  /** Parameter-driven Snyder polar-stereographic forward+inverse SQL
    * template (the [[lccRoundTripSql]] discipline for the polar
    * family). `ptsSql` must provide (keyCol, lon, lat).
    */
  private def psRoundTripSql(proj: graft.functions.PolarStereoNorth,
      ptsSql: String, keyCol: String): String = {
    val C = proj.SqlC
    def lit(v: Double): String = s"CAST($v AS DOUBLE)"
    def step(phi: String): String =
      s"${lit(C.halfPi)} - 2 * atan(t * pow((1 - ${lit(C.e)} * sin($phi)) / " +
        s"(1 + ${lit(C.e)} * sin($phi)), ${lit(C.eHalf)}))"
    val iters = (1 to 8).map(i =>
      s"it$i AS (SELECT * REPLACE ((${step("phi")}) AS phi) FROM it${i - 1})")
      .mkString(",\n")
    s"""WITH pts AS ($ptsSql),
       |tv AS (SELECT *,
       |    tan(${lit(C.quarterPi)} - (lat / 180.0 * ${lit(C.pi)}) / 2)
       |      / pow((1 - ${lit(C.e)} * sin(lat / 180.0 * ${lit(C.pi)}))
       |        / (1 + ${lit(C.e)} * sin(lat / 180.0 * ${lit(C.pi)})),
       |        ${lit(C.eHalf)}) AS tf
       |  FROM pts),
       |fwd AS (SELECT $keyCol, lon, lat,
       |    round(${lit(C.falseE)} + ${lit(C.aMcTc)} * tf
       |      * sin(lon / 180.0 * ${lit(C.pi)} - ${lit(C.lon0)}), 3) + 0.0 AS e,
       |    round(${lit(C.falseN)} - ${lit(C.aMcTc)} * tf
       |      * cos(lon / 180.0 * ${lit(C.pi)} - ${lit(C.lon0)}), 3) + 0.0 AS n
       |  FROM tv),
       |xy AS (SELECT *, e - ${lit(C.falseE)} AS x,
       |    ${lit(C.falseN)} - n AS y FROM fwd),
       |it0 AS (SELECT *,
       |    sqrt(x * x + y * y) / ${lit(C.aMcTc)} AS t,
       |    ${lit(C.halfPi)} - 2 * atan(sqrt(x * x + y * y) / ${lit(C.aMcTc)}) AS phi
       |  FROM xy),
       |$iters
       |SELECT $keyCol, lon, lat, e, n,
       |  round((${lit(C.lon0)} + atan2(x, y)) * 180.0 / ${lit(C.pi)}, 6) + 0.0 AS lon2,
       |  round(phi * 180.0 / ${lit(C.pi)}, 6) + 0.0 AS lat2
       |FROM it8""".stripMargin
  }

  private val crsPolarStereoSql: String = psRoundTripSql(
    graft.functions.PolarStereoRegistry.Epsg3413,
    """SELECT c_custkey,
      |    -180.0 + CAST(c_custkey % 7200 AS DOUBLE) / 20.0 AS lon,
      |    60.0 + CAST(c_custkey % 2600 AS DOUBLE) / 100.0 AS lat
      |  FROM customer""".stripMargin,
    "c_custkey")

  /** F20 polar family, SOUTH aspect (r8): EPSG:3976 (NSIDC Sea Ice
    * South — antarctic sea-ice/DEM catalogs) over synthetic antarctic
    * lon/lat, forward and inverse. The engine side is the exact
    * φ→−φ / y→−y mirror of the north kernel
    * ([[graft.functions.PolarStereoSouth]]); the SQL template splices
    * the mirrored op sequence so parity is bit-for-bit.
    */
  def crsPolarStereoSouth(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        (lit(-180.0) + (col("c_custkey") % 7200).cast("double") / 20.0).as("lon"),
        (lit(-60.0) - (col("c_custkey") % 2600).cast("double") / 100.0).as("lat"))
      .withColumn("e", round(call_function("ps_crs_easting",
        lit("EPSG:3976"), col("lon"), col("lat")), 3) + lit(0.0))
      .withColumn("n", round(call_function("ps_crs_northing",
        lit("EPSG:3976"), col("lon"), col("lat")), 3) + lit(0.0))
      .withColumn("lon2", round(call_function("ps_crs_lon",
        lit("EPSG:3976"), col("e"), col("n")), 6) + lit(0.0))
      .withColumn("lat2", round(call_function("ps_crs_lat",
        lit("EPSG:3976"), col("e"), col("n")), 6) + lit(0.0))

  /** South-aspect SQL mirror: the [[psRoundTripSql]] sequence under
    * the mirror — tf at (−lat), n = FN − (0 − ρcosθ), λ from
    * atan2(x, n−FN), φ negated after the iteration. Each mirrored
    * spelling replays the engine's exact nested ops.
    */
  private def psSouthRoundTripSql(proj: graft.functions.PolarStereoSouth,
      ptsSql: String, keyCol: String): String = {
    val C = proj.SqlC
    def lit(v: Double): String = s"CAST($v AS DOUBLE)"
    def step(phi: String): String =
      s"${lit(C.halfPi)} - 2 * atan(t * pow((1 - ${lit(C.e)} * sin($phi)) / " +
        s"(1 + ${lit(C.e)} * sin($phi)), ${lit(C.eHalf)}))"
    val iters = (1 to 8).map(i =>
      s"it$i AS (SELECT * REPLACE ((${step("phi")}) AS phi) FROM it${i - 1})")
      .mkString(",\n")
    s"""WITH pts AS ($ptsSql),
       |tv AS (SELECT *,
       |    tan(${lit(C.quarterPi)} - ((- lat) / 180.0 * ${lit(C.pi)}) / 2)
       |      / pow((1 - ${lit(C.e)} * sin((- lat) / 180.0 * ${lit(C.pi)}))
       |        / (1 + ${lit(C.e)} * sin((- lat) / 180.0 * ${lit(C.pi)})),
       |        ${lit(C.eHalf)}) AS tf
       |  FROM pts),
       |fwd AS (SELECT $keyCol, lon, lat,
       |    round(${lit(C.falseE)} + ${lit(C.aMcTc)} * tf
       |      * sin(lon / 180.0 * ${lit(C.pi)} - ${lit(C.lon0)}), 3) + 0.0 AS e,
       |    round(${lit(C.falseN)} - (0.0 - ${lit(C.aMcTc)} * tf
       |      * cos(lon / 180.0 * ${lit(C.pi)} - ${lit(C.lon0)})), 3) + 0.0 AS n
       |  FROM tv),
       |xy AS (SELECT *, e - ${lit(C.falseE)} AS x,
       |    n - ${lit(C.falseN)} AS y FROM fwd),
       |it0 AS (SELECT *,
       |    sqrt(x * x + y * y) / ${lit(C.aMcTc)} AS t,
       |    ${lit(C.halfPi)} - 2 * atan(sqrt(x * x + y * y) / ${lit(C.aMcTc)}) AS phi
       |  FROM xy),
       |$iters
       |SELECT $keyCol, lon, lat, e, n,
       |  round((${lit(C.lon0)} + atan2(x, y)) * 180.0 / ${lit(C.pi)}, 6) + 0.0 AS lon2,
       |  round(- (phi * 180.0 / ${lit(C.pi)}), 6) + 0.0 AS lat2
       |FROM it8""".stripMargin
  }

  private val crsPolarStereoSouthSql: String = psSouthRoundTripSql(
    graft.functions.PolarStereoRegistry.Epsg3976,
    """SELECT c_custkey,
      |    -180.0 + CAST(c_custkey % 7200 AS DOUBLE) / 20.0 AS lon,
      |    -60.0 - CAST(c_custkey % 2600 AS DOUBLE) / 100.0 AS lat
      |  FROM customer""".stripMargin,
    "c_custkey")

  /** F20 closed (r9, VERDICT r8 #5): EPSG-code dispatch over the
    * existing projection kernels — `crs_epsg_*(code, a, b)` resolves
    * the code to its family kernel at PLAN time
    * ([[graft.functions.EpsgRegistry]]), so a user writes one
    * uniform call for any covered code instead of picking the kernel
    * by hand (the last delta vs the reference's geopandas any-CRS
    * `to_crs`, RadiusOfGyrationHandler.py:73-85). One forward+inverse
    * round-trip block per code, one code per covered family member:
    * 6365/3347 (conic LCC), 3413/3976 (polar, both aspects),
    * 32614/32723 (cylindrical UTM, both hemispheres — 23S exercises
    * the 10 000 000 m false-northing convention), 3857 (WebMercator).
    * Each block runs over code-appropriate synthetic geography
    * derived from customer (projections are only defined near their
    * zone/aspect domain). Rounding discipline per family matches the
    * family queries: meters 3 dp, degrees 6 dp, inverse consumes the
    * ROUNDED forward columns; polar blocks add the +0.0 −0.0
    * normalization their templates bake in (CM±90° northing). The
    * 3857 domains are offset by 0.05° so no point hits lon/lat = 0,
    * where JVM tan(π/4) = 1−ulp makes round-3 of ln(tan(π/4)) a
    * −0.0 hazard.
    *
    * Scale shape: 7 catalog-side scans of a dim table, zero joins,
    * zero shuffles — projection is a per-row scalar; the dispatch
    * itself is plan-time.
    */
  def crsEpsgDispatch(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val k = col("c_custkey")
    def pts(lon: Column, lat: Column): DataFrame =
      cust.select(k.as("key"), lon.as("lon"), lat.as("lat"))
    def rt(code: Int, df: DataFrame, normZero: Boolean): DataFrame = {
      def z(c: Column): Column = if (normZero) c + lit(0.0) else c
      df.withColumn("code", lit(code))
        .withColumn("e", z(round(call_function("crs_epsg_easting",
          lit(code), col("lon"), col("lat")), 3)))
        .withColumn("n", z(round(call_function("crs_epsg_northing",
          lit(code), col("lon"), col("lat")), 3)))
        .withColumn("lon2", z(round(call_function("crs_epsg_lon",
          lit(code), col("e"), col("n")), 6)))
        .withColumn("lat2", z(round(call_function("crs_epsg_lat",
          lit(code), col("e"), col("n")), 6)))
        .select(col("key"), col("code"), col("lon"), col("lat"),
          col("e"), col("n"), col("lon2"), col("lat2"))
    }
    rt(6365, pts(lit(-104.0) + (k % 1800).cast("double") / 100.0,
        lit(15.0) + (k % 1700).cast("double") / 100.0), normZero = false)
      .unionByName(rt(3347, pts(lit(-120.0) + (k % 4000).cast("double") / 100.0,
        lit(46.0) + (k % 2800).cast("double") / 100.0), normZero = false))
      .unionByName(rt(3413, pts(lit(-180.0) + (k % 7200).cast("double") / 20.0,
        lit(60.0) + (k % 2600).cast("double") / 100.0), normZero = true))
      .unionByName(rt(3976, pts(lit(-180.0) + (k % 7200).cast("double") / 20.0,
        lit(-60.0) - (k % 2600).cast("double") / 100.0), normZero = true))
      .unionByName(rt(32614, pts(lit(-102.0) + (k % 600).cast("double") / 100.0,
        lit(14.0) + (k % 1500).cast("double") / 100.0), normZero = false))
      .unionByName(rt(32723, pts(lit(-48.0) + (k % 600).cast("double") / 100.0,
        lit(-25.0) + (k % 2000).cast("double") / 100.0), normZero = false))
      .unionByName(rt(3857, pts(lit(-149.95) + (k % 3000).cast("double") / 10.0,
        lit(-69.95) + (k % 1400).cast("double") / 10.0), normZero = false))
  }

  /** Parameter-driven WGS84 UTM forward+inverse SQL template
    * (the [[lccRoundTripSql]] discipline for the cylindrical family,
    * generalized from the inline crs_utm_webmerc mirror): splices the
    * zone's central meridian and the hemisphere's false northing.
    * `ptsSql` must provide (keyCol, lon, lat).
    */
  private def utmRoundTripSql(zone: Int, falseN: Double,
      ptsSql: String, keyCol: String): String = {
    import graft.functions.TmHelpers.{SqlConsts => T}
    def L(v: Double): String = s"CAST($v AS DOUBLE)"
    val a = L(T.a); val e2 = L(T.e2); val ep2 = L(T.ep2); val k0 = L(T.k0)
    val fe = L(T.falseE); val pi = L(T.pi); val fn = L(falseN)
    val lon0 = L(T.lon0Rad(zone))
    s"""WITH pts AS ($ptsSql),
       |f0 AS (SELECT *, lat / 180.0 * $pi AS phi, lon / 180.0 * $pi AS lam FROM pts),
       |f1 AS (SELECT *, sin(phi) AS sp, cos(phi) AS cp, tan(phi) AS tp FROM f0),
       |f2 AS (SELECT *,
       |    $a / sqrt(1 - $e2 * sp * sp) AS nv,
       |    tp * tp AS t,
       |    $ep2 * cp * cp AS c,
       |    (lam - $lon0) * cp AS aa,
       |    $a * (${L(T.m0c)} * phi - ${L(T.m2c)} * sin(2 * phi)
       |      + ${L(T.m4c)} * sin(4 * phi) - ${L(T.m6c)} * sin(6 * phi)) AS m
       |  FROM f1),
       |fwd AS (SELECT $keyCol, lon, lat,
       |    round($fe + $k0 * nv * (aa + (1 - t + c) * (aa * aa * aa) / 6
       |      + (5 - 18 * t + t * t + 72 * c - 58 * $ep2)
       |        * (aa * aa * aa * aa * aa) / 120), 3) AS e,
       |    round($fn + $k0 * (m + nv * tp * ((aa * aa) / 2
       |      + (5 - t + 9 * c + 4 * c * c) * (aa * aa * aa * aa) / 24
       |      + (61 - 58 * t + t * t + 600 * c - 330 * $ep2)
       |        * (aa * aa * aa * aa * aa * aa) / 720)), 3) AS n
       |  FROM f2),
       |i0 AS (SELECT *, ((n - $fn) / $k0) / ($a * ${L(T.m0c)}) AS mu FROM fwd),
       |i1 AS (SELECT *, mu + ${L(T.f2c)} * sin(2 * mu) + ${L(T.f4c)} * sin(4 * mu)
       |    + ${L(T.f6c)} * sin(6 * mu) + ${L(T.f8c)} * sin(8 * mu) AS phi1 FROM i0),
       |i2 AS (SELECT *, sin(phi1) AS sp1, cos(phi1) AS cp1, tan(phi1) AS tp1 FROM i1),
       |i3 AS (SELECT *, $ep2 * cp1 * cp1 AS c1, tp1 * tp1 AS t1,
       |    1 - $e2 * sp1 * sp1 AS om FROM i2),
       |i4 AS (SELECT *, $a / sqrt(om) AS n1,
       |    $a * (1 - $e2) / (om * sqrt(om)) AS r1 FROM i3),
       |i5 AS (SELECT *, (e - $fe) / (n1 * $k0) AS d FROM i4)
       |SELECT $keyCol, lon, lat, e, n,
       |    round(($lon0 + (d - (1 + 2 * t1 + c1) * (d * d * d) / 6
       |      + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * $ep2 + 24 * t1 * t1)
       |        * (d * d * d * d * d) / 120) / cp1) * 180.0 / $pi, 6) AS lon2,
       |    round((phi1 - (n1 * tp1 / r1) * ((d * d) / 2
       |      - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * $ep2)
       |        * (d * d * d * d) / 24
       |      + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * $ep2 - 3 * c1 * c1)
       |        * (d * d * d * d * d * d) / 720)) * 180.0 / $pi, 6) AS lat2
       |  FROM i5""".stripMargin
  }

  /** Web Mercator forward+inverse SQL template. */
  private def webmercRoundTripSql(ptsSql: String, keyCol: String): String = {
    import graft.functions.TmHelpers.{SqlConsts => T}
    def L(v: Double): String = s"CAST($v AS DOUBLE)"
    val a = L(T.a); val pi = L(T.pi)
    s"""WITH pts AS ($ptsSql),
       |fwd AS (SELECT $keyCol, lon, lat,
       |    round($a * (lon / 180.0 * $pi), 3) AS e,
       |    round($a * ln(tan(${L(T.quarterPi)} + (lat / 180.0 * $pi) / 2)), 3) AS n
       |  FROM pts)
       |SELECT $keyCol, lon, lat, e, n,
       |  round((e / $a) * 180.0 / $pi, 6) AS lon2,
       |  round((2 * atan(exp(n / $a)) - ${L(T.halfPi)}) * 180.0 / $pi, 6) AS lat2
       |FROM fwd""".stripMargin
  }

  private val crsEpsgDispatchSql: String = {
    def custPts(lonSql: String, latSql: String): String =
      s"""SELECT c_custkey AS key,
         |    $lonSql AS lon,
         |    $latSql AS lat
         |  FROM customer""".stripMargin
    def wrap(code: Int, inner: String): String =
      s"SELECT key, $code AS code, lon, lat, e, n, lon2, lat2 FROM (\n$inner\n)"
    // templates emit (keyCol, lon, lat, e, n, lon2, lat2); psRoundTripSql
    // names the projected cols e/n already, lcc too
    val b6365 = wrap(6365, lccRoundTripSql(
      graft.functions.CrsRegistry.Epsg6365,
      custPts("-104.0 + CAST(c_custkey % 1800 AS DOUBLE) / 100.0",
        "15.0 + CAST(c_custkey % 1700 AS DOUBLE) / 100.0"), "key"))
    val b3347 = wrap(3347, lccRoundTripSql(
      graft.functions.CrsRegistry.Epsg3347,
      custPts("-120.0 + CAST(c_custkey % 4000 AS DOUBLE) / 100.0",
        "46.0 + CAST(c_custkey % 2800 AS DOUBLE) / 100.0"), "key"))
    val b3413 = wrap(3413, psRoundTripSql(
      graft.functions.PolarStereoRegistry.Epsg3413,
      custPts("-180.0 + CAST(c_custkey % 7200 AS DOUBLE) / 20.0",
        "60.0 + CAST(c_custkey % 2600 AS DOUBLE) / 100.0"), "key"))
    val b3976 = wrap(3976, psSouthRoundTripSql(
      graft.functions.PolarStereoRegistry.Epsg3976,
      custPts("-180.0 + CAST(c_custkey % 7200 AS DOUBLE) / 20.0",
        "-60.0 - CAST(c_custkey % 2600 AS DOUBLE) / 100.0"), "key"))
    val b32614 = wrap(32614, utmRoundTripSql(14, 0.0,
      custPts("-102.0 + CAST(c_custkey % 600 AS DOUBLE) / 100.0",
        "14.0 + CAST(c_custkey % 1500 AS DOUBLE) / 100.0"), "key"))
    val b32723 = wrap(32723, utmRoundTripSql(23, 1.0e7,
      custPts("-48.0 + CAST(c_custkey % 600 AS DOUBLE) / 100.0",
        "-25.0 + CAST(c_custkey % 2000 AS DOUBLE) / 100.0"), "key"))
    val b3857 = wrap(3857, webmercRoundTripSql(
      custPts("-149.95 + CAST(c_custkey % 3000 AS DOUBLE) / 10.0",
        "-69.95 + CAST(c_custkey % 1400 AS DOUBLE) / 10.0"), "key"))
    Seq(b6365, b3347, b3413, b3976, b32614, b32723, b3857)
      .mkString("\nUNION ALL\n")
  }

  /** F20 datum leg (r10, VERDICT r9 "What's missing" #1): 7-parameter
    * Helmert datum shift to WGS84 and back
    * ([[graft.functions.DatumRegistry]] — EPSG method 9606, position-
    * vector convention). The reference's geopandas `to_crs` routes a
    * geographic CRS on a classical datum through exactly this
    * geocentric step (RadiusOfGyrationHandler.py:73-85); this was the
    * last geodesy-generality delta. Two blocks over code-appropriate
    * synthetic geography from customer: OSGB36 (EPSG:4277, the full
    * 7-param matrix incl. rotations + scale) and ED50 (EPSG:4230,
    * translation-only — the degenerate path). Forward to WGS84 then
    * back via the EPSG-standard negated-parameter reversal, the
    * inverse consuming the ROUNDED forward columns (house
    * discipline); degrees round 6 dp with the ±0.0 normalization.
    * NB the 2-D round-trip is exact only to ~1e-6 deg by nature —
    * h=0 is re-asserted on the WGS84 ellipsoid before the reverse
    * leg, the same convention pyproj applies to 2-D geometry — but
    * both engines replay the identical op sequence, so parity is
    * bit-for-bit (correctness vs the published transform is pinned
    * in HelmertSpec's worked-example golden).
    *
    * Scale shape: per-row straight-line scalar resolved at plan time
    * from the foldable code; zero joins, zero shuffles.
    */
  def crsDatumShift(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val k = col("c_custkey")
    def blk(code: Int, lon: Column, lat: Column): DataFrame =
      cust.select(k.as("key"), lon.as("lon"), lat.as("lat"))
        .withColumn("code", lit(code))
        .withColumn("wlon", round(call_function("helmert_lon",
          lit(code), col("lon"), col("lat")), 6) + lit(0.0))
        .withColumn("wlat", round(call_function("helmert_lat",
          lit(code), col("lon"), col("lat")), 6) + lit(0.0))
        .withColumn("lon2", round(call_function("helmert_inv_lon",
          lit(code), col("wlon"), col("wlat")), 6) + lit(0.0))
        .withColumn("lat2", round(call_function("helmert_inv_lat",
          lit(code), col("wlon"), col("wlat")), 6) + lit(0.0))
        .select(col("key"), col("code"), col("lon"), col("lat"),
          col("wlon"), col("wlat"), col("lon2"), col("lat2"))
    blk(4277, lit(-6.0) + (k % 1000).cast("double") / 100.0,
        lit(50.0) + (k % 900).cast("double") / 100.0)
      .unionByName(blk(4230, lit(-9.0) + (k % 4000).cast("double") / 100.0,
        lit(36.0) + (k % 3500).cast("double") / 100.0))
  }

  /** Parameter-driven Helmert SQL template: one geodetic→geocentric→
    * 7-param→geodetic leg per direction, the reverse leg splicing the
    * NEGATED parameter values as literals (so its expression shape
    * matches the kernel's negated-spelling arithmetic exactly). The
    * geocentric→geodetic latitude uses the same fixed-count (8)
    * REPLACE-iteration discipline as [[lccRoundTripSql]].
    */
  private def helmertRoundTripSql(t: graft.functions.HelmertToWgs84,
      code: Int, ptsSql: String): String = {
    val C = t.SqlC
    def L(v: Double): String = s"CAST($v AS DOUBLE)"
    val pi = L(C.pi)
    def leg(sfx: String, lonIn: String, latIn: String,
        aF: String, e2F: String,
        tx: String, ty: String, tz: String,
        rx: String, ry: String, rz: String, s: String,
        aT: String, e2T: String, from: String): (String, String, String) = {
      def step(phi: String): String =
        s"atan2(zb$sfx + $e2T * ($aT / sqrt(1 - $e2T * sin($phi) * sin($phi)))" +
          s" * sin($phi), pp$sfx)"
      val iters = (1 to 8).map(i =>
        s"q$i$sfx AS (SELECT * REPLACE ((${step(s"phi$sfx")}) AS phi$sfx) " +
          s"FROM ${if (i == 1) s"p$sfx" else s"q${i - 1}$sfx"})")
        .mkString(",\n")
      val ctes =
        s"""g$sfx AS (SELECT *, $lonIn / 180.0 * $pi AS lam$sfx,
           |    $latIn / 180.0 * $pi AS ph0$sfx FROM $from),
           |n$sfx AS (SELECT *,
           |    $aF / sqrt(1 - $e2F * sin(ph0$sfx) * sin(ph0$sfx)) AS nu$sfx
           |  FROM g$sfx),
           |c$sfx AS (SELECT *,
           |    nu$sfx * cos(ph0$sfx) * cos(lam$sfx) AS xa$sfx,
           |    nu$sfx * cos(ph0$sfx) * sin(lam$sfx) AS ya$sfx,
           |    nu$sfx * (1 - $e2F) * sin(ph0$sfx) AS za$sfx
           |  FROM n$sfx),
           |h$sfx AS (SELECT *,
           |    $tx + $s * (xa$sfx - $rz * ya$sfx + $ry * za$sfx) AS xb$sfx,
           |    $ty + $s * ($rz * xa$sfx + ya$sfx - $rx * za$sfx) AS yb$sfx,
           |    $tz + $s * (-$ry * xa$sfx + $rx * ya$sfx + za$sfx) AS zb$sfx
           |  FROM c$sfx),
           |p$sfx AS (SELECT *,
           |    sqrt(xb$sfx * xb$sfx + yb$sfx * yb$sfx) AS pp$sfx,
           |    atan2(zb$sfx,
           |      sqrt(xb$sfx * xb$sfx + yb$sfx * yb$sfx) * (1 - $e2T)) AS phi$sfx
           |  FROM h$sfx),
           |$iters""".stripMargin
      (ctes, s"atan2(yb$sfx, xb$sfx) * 180.0 / $pi",
        s"phi$sfx * 180.0 / $pi")
    }
    val (fwdCtes, fLon, fLat) = leg("f", "lon", "lat",
      L(C.aSrc), L(C.e2Src),
      L(C.tx), L(C.ty), L(C.tz), L(C.rxR), L(C.ryR), L(C.rzR), L(C.sc),
      L(C.aW), L(C.e2W), "pts")
    val (revCtes, rLon, rLat) = leg("r", "wlon", "wlat",
      L(C.aW), L(C.e2W),
      L(-C.tx), L(-C.ty), L(-C.tz), L(-C.rxR), L(-C.ryR), L(-C.rzR), L(C.scInv),
      L(C.aSrc), L(C.e2Src), "fwd")
    s"""WITH pts AS ($ptsSql),
       |$fwdCtes,
       |fwd AS (SELECT key, $code AS code, lon, lat,
       |    round($fLon, 6) + 0.0 AS wlon,
       |    round($fLat, 6) + 0.0 AS wlat
       |  FROM q8f),
       |$revCtes
       |SELECT key, code, lon, lat, wlon, wlat,
       |  round($rLon, 6) + 0.0 AS lon2,
       |  round($rLat, 6) + 0.0 AS lat2
       |FROM q8r""".stripMargin
  }

  private val crsDatumShiftSql: String = {
    def custPts(lonSql: String, latSql: String): String =
      s"""SELECT c_custkey AS key,
         |    $lonSql AS lon,
         |    $latSql AS lat
         |  FROM customer""".stripMargin
    val osgb = helmertRoundTripSql(graft.functions.DatumRegistry.Osgb36, 4277,
      custPts("-6.0 + CAST(c_custkey % 1000 AS DOUBLE) / 100.0",
        "50.0 + CAST(c_custkey % 900 AS DOUBLE) / 100.0"))
    val ed50 = helmertRoundTripSql(graft.functions.DatumRegistry.Ed50, 4230,
      custPts("-9.0 + CAST(c_custkey % 4000 AS DOUBLE) / 100.0",
        "36.0 + CAST(c_custkey % 3500 AS DOUBLE) / 100.0"))
    s"SELECT * FROM (\n$osgb\n)\nUNION ALL\nSELECT * FROM (\n$ed50\n)"
  }

  /** Boundary geometry of the distinct H3 cells the events points
    * occupy (h3_to_geo_boundary analog) — the export step that hands
    * cell footprints to GIS/viz. WKT strings, not nested arrays, so
    * the result is canonizer- and sink-friendly.
    *
    * Scale shape: cells dedup BEFORE any decode, so the boundary
    * construction runs once per distinct cell, not per point. Not
    * SQL-expressible (spherical circumcenters) → rows-only; vertex
    * equidistance, ring arity (6/5), and neighbor vertex-sharing are
    * pinned in H3Spec.
    */
  def h3Boundary(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(h3_index((col("value") % 120.0) - 60.0,
        ((col("event_id") % 3600).cast("double") / 10.0) - 180.0, lit(7))
        .as("cell"))
      .where(col("cell").isNotNull)
      .distinct()
      .select(col("cell"),
        h3_boundary_wkt(col("cell")).as("boundary_wkt"),
        h3_is_pentagon(col("cell")).as("is_pentagon"))

  /** Scorecard form of [[h3Boundary]] (r8, VERDICT r7 #4): the output
    * is keyed by cell id — not oracle-expressible — so the registered
    * query collapses to a FIXED five-row check summary (chk, ok), the
    * one shape both engines can hash: ring closure, vertex arity
    * (6/5 + closure by pentagon flag), every vertex within ~10× the
    * res-7 circumradius of the decoded center, the center decoding
    * back into its own cell, and the distinct-cell count bounded by
    * the distinct-point count. All five aggregate corpus-wide with
    * bool_and over row-local HOF parses of the WKT — one distinct
    * exchange, two 1-row aggs, nothing corpus-sized collects.
    */
  def h3BoundaryChecks(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.events(spark, dir)
      .select(((col("value") % 120.0) - 60.0).as("lat"),
        (((col("event_id") % 3600).cast("double") / 10.0) - 180.0).as("lon"))
    val b = pts
      .select(h3_index(col("lat"), col("lon"), lit(7)).as("cell"))
      .where(col("cell").isNotNull)
      .distinct()
      .select(col("cell"),
        h3_boundary_wkt(col("cell")).as("wkt"),
        h3_is_pentagon(col("cell")).as("pent"),
        h3_center_lat(col("cell")).as("clat"),
        h3_center_lon(col("cell")).as("clon"))
      .withColumn("vs",
        split(regexp_extract(col("wkt"), "^POLYGON\\(\\((.*)\\)\\)$", 1), ", "))
      .withColumn("vlat", expr("transform(vs, s -> cast(split(s, ' ')[1] as double))"))
      .withColumn("vlon", expr("transform(vs, s -> cast(split(s, ' ')[0] as double))"))
    val checks = b.agg(
      bool_and(element_at(col("vs"), 1) === element_at(col("vs"), -1))
        .as("ring_closed"),
      bool_and(size(col("vs")) === when(col("pent"), 6).otherwise(7))
        .as("vertex_arity"),
      bool_and(expr("forall(vlat, v -> abs(v - clat) <= 0.15)") &&
        expr("forall(vlon, v -> least(abs(v - clon), 360.0 - abs(v - clon))" +
          " <= 0.30)")).as("verts_near_center"),
      bool_and(h3_index(col("clat"), col("clon"), lit(7)) === col("cell"))
        .as("center_roundtrip"),
      count(lit(1)).as("n_cells"))
    val nPts = pts.distinct().agg(count(lit(1)).as("n_pts"))
    checks.crossJoin(broadcast(nPts))
      .select(explode(array(
        struct(lit("ring_closed").as("chk"), col("ring_closed").as("ok")),
        struct(lit("vertex_arity").as("chk"), col("vertex_arity").as("ok")),
        struct(lit("verts_near_center").as("chk"),
          col("verts_near_center").as("ok")),
        struct(lit("center_roundtrip").as("chk"),
          col("center_roundtrip").as("ok")),
        struct(lit("cell_count_bounded").as("chk"),
          (col("n_cells") >= 1 && col("n_cells") <= col("n_pts")).as("ok"))))
        .as("c"))
      .select(col("c.chk").as("chk"), col("c.ok").as("ok"))
  }

  private val h3BoundaryChecksSql =
    """SELECT chk, ok FROM (VALUES
      |  ('ring_closed', true), ('vertex_arity', true),
      |  ('verts_near_center', true), ('center_roundtrip', true),
      |  ('cell_count_bounded', true)) AS t(chk, ok)""".stripMargin

  /** Scorecard form of the SUBSTRATE-exact boundary (r9 — closes the
    * last "missing" line: h3lib's own construction with Class III
    * distortion vertices at icosahedron-edge crossings, which the
    * dual construction structurally lacks). Same fixed-check shape as
    * [[h3BoundaryChecks]]; arity here is a band (6 substrate vertices
    * + up to 4 inserted edge crossings at Class III res 7; pentagons
    * exactly 10). The sharp substrate properties — derived
    * face-transform certification, distortion vertices ON face edges
    * to 1e-12, cross-face vertex sharing — run in
    * H3SubstrateBoundarySpec, which also guarantees crossings are
    * exercised (random fixture points may or may not hit a fold).
    */
  def h3BoundaryExactChecks(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.events(spark, dir)
      .select(((col("value") % 120.0) - 60.0).as("lat"),
        (((col("event_id") % 3600).cast("double") / 10.0) - 180.0).as("lon"))
    val b = pts
      .select(h3_index(col("lat"), col("lon"), lit(7)).as("cell"))
      .where(col("cell").isNotNull)
      .distinct()
      .select(col("cell"),
        h3_boundary_exact_wkt(col("cell")).as("wkt"),
        h3_is_pentagon(col("cell")).as("pent"),
        h3_center_lat(col("cell")).as("clat"),
        h3_center_lon(col("cell")).as("clon"))
      .withColumn("vs",
        split(regexp_extract(col("wkt"), "^POLYGON\\(\\((.*)\\)\\)$", 1), ", "))
      .withColumn("vlat", expr("transform(vs, s -> cast(split(s, ' ')[1] as double))"))
      .withColumn("vlon", expr("transform(vs, s -> cast(split(s, ' ')[0] as double))"))
    val checks = b.agg(
      bool_and(element_at(col("vs"), 1) === element_at(col("vs"), -1))
        .as("ring_closed"),
      bool_and(when(col("pent"), size(col("vs")) === 11)
        .otherwise(size(col("vs")).between(7, 11))).as("vertex_arity"),
      bool_and(expr("forall(vlat, v -> abs(v - clat) <= 0.15)") &&
        expr("forall(vlon, v -> least(abs(v - clon), 360.0 - abs(v - clon))" +
          " <= 0.30)")).as("verts_near_center"),
      bool_and(h3_index(col("clat"), col("clon"), lit(7)) === col("cell"))
        .as("center_roundtrip"),
      count(lit(1)).as("n_cells"))
    val nPts = pts.distinct().agg(count(lit(1)).as("n_pts"))
    checks.crossJoin(broadcast(nPts))
      .select(explode(array(
        struct(lit("ring_closed").as("chk"), col("ring_closed").as("ok")),
        struct(lit("vertex_arity").as("chk"), col("vertex_arity").as("ok")),
        struct(lit("verts_near_center").as("chk"),
          col("verts_near_center").as("ok")),
        struct(lit("center_roundtrip").as("chk"),
          col("center_roundtrip").as("ok")),
        struct(lit("cell_count_bounded").as("chk"),
          (col("n_cells") >= 1 && col("n_cells") <= col("n_pts")).as("ok"))))
        .as("c"))
      .select(col("c.chk").as("chk"), col("c.ok").as("ok"))
  }

  private val h3BoundaryExactChecksSql =
    """SELECT chk, ok FROM (VALUES
      |  ('ring_closed', true), ('vertex_arity', true),
      |  ('verts_near_center', true), ('center_roundtrip', true),
      |  ('cell_count_bounded', true)) AS t(chk, ok)""".stripMargin

  /** H3 polyfill (polygonToCells, center-containment mode): the cells
    * of the municipio-style catalog polygons at res 4 — the step that
    * turns an admin boundary into a cell allowlist for joins against
    * H3-keyed pings.
    *
    * Scale shape: a sample lattice finer than the res-4 inradius
    * (0.15° vs ≥0.175°) over each polygon's bbox (+ one circumradius
    * margin) guarantees every candidate cell is hit; candidates dedup
    * on (poly, cell) BEFORE the center decode + containment test, so
    * the expensive decode is per-cell. Lattice explode is per-polygon
    * parallel; the catalog is broadcast. Rows-only (no H3 in the
    * oracle engine); coverage/exactness pinned in H3Spec.
    */
  def h3Polyfill(spark: SparkSession, dir: String, res: Int = 4): DataFrame = {
    // (lattice step, bbox margin) per resolution: step stays under the
    // cell inradius (÷√2 coverage bound, with slack for hex distortion),
    // margin covers one circumradius so boundary cells sample fully
    val (step, margin) = res match {
      case 4 => (0.15, 0.45)
      case 5 => (0.055, 0.18)
      case r => throw new IllegalArgumentException(s"unsupported polyfill res $r")
    }
    val polys = polygonCatalog(spark)
      .select(col("poly_id"),
        from_json(get_json_object(col("geometry"), "$.coordinates"), ringsType)
          .as("rings"))
      .withColumn("pts", flatten(col("rings")))
      .withColumn("x0", expr("array_min(transform(pts, p -> p[0]))") - margin)
      .withColumn("x1", expr("array_max(transform(pts, p -> p[0]))") + margin)
      .withColumn("y0", expr("array_min(transform(pts, p -> p[1]))") - margin)
      .withColumn("y1", expr("array_max(transform(pts, p -> p[1]))") + margin)
    val cand = polys
      .withColumn("i", explode(expr(s"sequence(0, CAST(ceil((x1 - x0) / $step) AS INT))")))
      .withColumn("j", explode(expr(s"sequence(0, CAST(ceil((y1 - y0) / $step) AS INT))")))
      .select(col("poly_id"),
        h3_index(col("y0") + col("j") * step, col("x0") + col("i") * step, lit(res))
          .as("cell"))
      .where(col("cell").isNotNull)
      .distinct()
    cand.join(broadcast(polys.select(col("poly_id"), col("rings"))), "poly_id")
      .withColumn("c_lat", h3_center_lat(col("cell")))
      .withColumn("c_lon", h3_center_lon(col("cell")))
      .where(st_contains(col("rings"), col("c_lon"), col("c_lat")))
      .select(col("poly_id"), col("cell"), col("c_lat"), col("c_lon"))
  }

  /** H3 compact: collapse complete sibling sets of the polyfill
    * covering into their parent, repeatedly — the minimal mixed-res
    * covering H3 ships as compactCells (the storage/join form of a
    * polygon allowlist: interior res-2 cells, fine cells only at the
    * boundary).
    *
    * Scale shape: each level is one (poly, parent) count aggregation
    * + a co-keyed anti-join — full sibling sets fold to the parent row,
    * partial sets survive unchanged; never a collect. Pentagon parents
    * fold at 6 children, hexagons at 7 (h3_is_pentagon gates the
    * count). Rows-only; H3Spec pins compact∘uncompact identity.
    *
    * Each round references `cur` three times, so without lineage cuts
    * the plan triples per level and canonicalization OOMs — eager
    * localCheckpoint per round, the Clustering.scala iterative idiom.
    */
  def h3Compact(spark: SparkSession, dir: String): DataFrame =
    h3CompactFrom(h3Polyfill(spark, dir, res = 5)
      .select(col("poly_id"), col("cell"))
      .localCheckpoint(true))

  /** Compaction over an already-materialized (poly_id, cell) covering
    * at res 5 — split out so [[h3CompactChecks]] can verify the
    * compacted set against the SAME base relation without running the
    * polyfill twice.
    */
  private def h3CompactFrom(base: DataFrame): DataFrame = {
    val startRes = 5
    var cur = base
    for (r <- startRes to 1 by -1) {
      val lvl = cur.where(h3_resolution(col("cell")) === r)
        .withColumn("parent", h3_parent(col("cell"), lit(r - 1)))
      val full = lvl.groupBy(col("poly_id"), col("parent"))
        .agg(count(lit(1)).as("n"))
        .where(col("n") === when(h3_is_pentagon(col("parent")), 6).otherwise(7))
        .select(col("poly_id"), col("parent"))
      val folded = lvl.join(full, Seq("poly_id", "parent"), "left_anti")
        .select(col("poly_id"), col("cell"))
      cur = cur.where(h3_resolution(col("cell")) =!= r)
        .unionByName(folded)
        .unionByName(full.select(col("poly_id"), col("parent").as("cell")))
        .localCheckpoint(true)
    }
    cur.select(col("poly_id"), col("cell"),
      h3_resolution(col("cell")).as("res"))
  }

  /** 16-row tile-bounds catalog (poly_id, x0, x1, y0, y1) matching
    * [[polygonCatalog]] — x is lon, y is lat.
    */
  private def tileBounds(spark: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = (for { i <- 0 until 4; j <- 0 until 4 } yield
      org.apache.spark.sql.Row(f"P_${i}%d_${j}%d",
        5.0 * i + 0.005, 5.0 * i + 5.005,
        5.0 * j + 0.005, 5.0 * j + 5.005)).asJava
    spark.createDataFrame(rows, StructType(Seq(
      StructField("poly_id", StringType, nullable = false),
      StructField("x0", DoubleType, nullable = false),
      StructField("x1", DoubleType, nullable = false),
      StructField("y0", DoubleType, nullable = false),
      StructField("y1", DoubleType, nullable = false))))
  }

  private val tileIdsSql: String =
    (for { i <- 0 until 4; j <- 0 until 4 } yield s"('P_${i}_${j}')")
      .mkString(", ")

  /** REGRESSION PINS (r8): the 16-tile catalog is fixed, so the res-4
    * polyfill covering and its compaction are data-independent
    * constants. Pinning the exact per-polygon counts in the oracle is
    * strictly stronger than the geometric band — any drift in
    * latLngToCell, the lattice sampling, containment, or the sibling
    * folding flips the scorecard hash. The values were produced by the
    * current implementation (DevH3Pins) and are trustworthy as pins
    * because the underlying kernels are independently verified against
    * published golden vectors and global properties in H3Spec; note
    * the count decreases with latitude exactly as res-4 hex area
    * grows — the expected geometry.
    */
  private val polyfill4Pins: Seq[(String, Long)] = Seq(
    "P_0_0" -> 224L, "P_0_1" -> 211L, "P_0_2" -> 189L, "P_0_3" -> 171L,
    "P_1_0" -> 205L, "P_1_1" -> 195L, "P_1_2" -> 175L, "P_1_3" -> 160L,
    "P_2_0" -> 184L, "P_2_1" -> 183L, "P_2_2" -> 167L, "P_2_3" -> 153L,
    "P_3_0" -> 174L, "P_3_1" -> 176L, "P_3_2" -> 159L, "P_3_3" -> 150L)

  private val compactPins: Seq[(String, Long)] = Seq(
    "P_0_0" -> 201L, "P_0_1" -> 238L, "P_0_2" -> 209L, "P_0_3" -> 186L,
    "P_1_0" -> 214L, "P_1_1" -> 229L, "P_1_2" -> 200L, "P_1_3" -> 188L,
    "P_2_0" -> 183L, "P_2_1" -> 205L, "P_2_2" -> 174L, "P_2_3" -> 185L,
    "P_3_0" -> 205L, "P_3_1" -> 195L, "P_3_2" -> 190L, "P_3_3" -> 191L)

  private def pinsValuesSql(pins: Seq[(String, Long)]): String =
    pins.map { case (p, n) => s"('$p', CAST($n AS BIGINT))" }.mkString(",\n|  ")

  /** Scorecard form of [[h3Polyfill]] (r8, VERDICT r7 #4): the cell
    * ids are not oracle-expressible, so the registered query emits
    * one row per catalog polygon (poly_id IS oracle-expressible) with
    * engine-verified invariants: COMPLETENESS — every corpus point in
    * the polygon's 1°-shrunk interior (≥ one res-4 circumradius from
    * any edge, so center-containment MUST cover it) indexes to a cell
    * in the covering; the EXACT per-polygon cell count against the
    * [[polyfill4Pins]] regression pins (the fixed catalog makes the
    * covering data-independent, so the oracle can carry the precise
    * constants); uniform resolution. The exactness of individual
    * cells is pinned by H3Spec; this row turns coverage regressions
    * into driver-artifact hash flips.
    */
  def h3PolyfillChecks(spark: SparkSession, dir: String): DataFrame = {
    val pf = h3Polyfill(spark, dir).select(col("poly_id"), col("cell"))
    val interior = Tables.events(spark, dir)
      .select(((col("value") % 120.0) - 60.0).as("lat"),
        (((col("event_id") % 3600).cast("double") / 10.0) - 180.0).as("lon"))
      .crossJoin(broadcast(tileBounds(spark)))
      .where(col("lon") > col("x0") + 1.0 && col("lon") < col("x1") - 1.0 &&
        col("lat") > col("y0") + 1.0 && col("lat") < col("y1") - 1.0)
      .select(col("poly_id"),
        h3_index(col("lat"), col("lon"), lit(4)).as("cell"))
      .distinct()
    val uncovered = interior
      .join(pf, Seq("poly_id", "cell"), "left_anti")
      .groupBy(col("poly_id")).agg(count(lit(1)).as("n_unmatched"))
    val agg = pf.groupBy(col("poly_id")).agg(
      count(lit(1)).as("n_cells"),
      bool_and(h3_resolution(col("cell")) === 4).as("res4"))
    tileBounds(spark).select(col("poly_id"))
      .join(agg, Seq("poly_id"), "left")
      .join(uncovered, Seq("poly_id"), "left")
      .select(col("poly_id"),
        coalesce(col("n_cells"), lit(0L)).as("n_cells"),
        (coalesce(col("n_unmatched"), lit(0L)) === 0).as("covers_ok"),
        coalesce(col("res4"), lit(false)).as("res_ok"))
  }

  private val h3PolyfillChecksSql =
    s"""SELECT poly_id, n_cells, true AS covers_ok, true AS res_ok
       |FROM (VALUES
       |  ${pinsValuesSql(polyfill4Pins)}) AS t(poly_id, n_cells)""".stripMargin

  /** Scorecard form of [[h3Compact]] (r8, VERDICT r7 #4): per-polygon
    * engine-verified invariants over the compacted covering vs the
    * SAME materialized res-5 base — PARTITION (every base cell has
    * exactly one ancestor-or-self in the compacted set: uncompact
    * identity without needing children expansion), MINIMALITY (no
    * complete sibling set survives — 7 children, 6 under a pentagon
    * parent), res ∈ [1,5], and the EXACT per-polygon compacted size
    * against the [[compactPins]] regression pins. Each check is a
    * co-keyed join/agg on (poly_id, cell); nothing collects.
    */
  def h3CompactChecks(spark: SparkSession, dir: String): DataFrame = {
    val base = h3Polyfill(spark, dir, res = 5)
      .select(col("poly_id"), col("cell"))
      .localCheckpoint(true)
    val comp = h3CompactFrom(base).select(
      col("poly_id"), col("cell"), col("res"))
    // ancestor-or-self candidates of each base cell at res 5..1
    val anc = base.select(col("poly_id"), col("cell"),
      explode(array(col("cell") +:
        (1 to 4).map(r => h3_parent(col("cell"), lit(r))): _*)).as("anc"))
    val matches = anc
      .join(comp.select(col("poly_id"), col("cell").as("anc")),
        Seq("poly_id", "anc"))
      .groupBy(col("poly_id"), col("cell")).agg(count(lit(1)).as("m"))
    val cover = base.join(matches, Seq("poly_id", "cell"), "left")
      .groupBy(col("poly_id"))
      .agg(bool_and(coalesce(col("m"), lit(0L)) === 1).as("cover_ok"))
    val minimal = comp.where(h3_resolution(col("cell")) >= 2)
      .select(col("poly_id"),
        h3_parent(col("cell"), h3_resolution(col("cell")) - 1).as("parent"))
      .groupBy(col("poly_id"), col("parent"))
      .agg(count(lit(1)).as("nc"))
      .select(col("poly_id"),
        (col("nc") < when(h3_is_pentagon(col("parent")), 6).otherwise(7))
          .as("ok"))
      .groupBy(col("poly_id")).agg(bool_and(col("ok")).as("minimal_ok"))
    val rr = comp.groupBy(col("poly_id")).agg(
      bool_and(h3_resolution(col("cell")).between(1, 5)).as("res_in_range"),
      count(lit(1)).as("n"))
    tileBounds(spark).select(col("poly_id"))
      .join(cover, Seq("poly_id"), "left")
      .join(minimal, Seq("poly_id"), "left")
      .join(rr, Seq("poly_id"), "left")
      .select(col("poly_id"),
        coalesce(col("n"), lit(0L)).as("n_compact"),
        coalesce(col("cover_ok"), lit(false)).as("cover_ok"),
        // vacuously true: a covering entirely at res 0/1 has no
        // sibling groups to test (cannot happen over these tiles)
        coalesce(col("minimal_ok"), lit(true)).as("minimal_ok"),
        coalesce(col("res_in_range"), lit(false)).as("res_ok"))
  }

  private val h3CompactChecksSql =
    s"""SELECT poly_id, n_compact, true AS cover_ok, true AS minimal_ok,
       |  true AS res_ok
       |FROM (VALUES
       |  ${pinsValuesSql(compactPins)}) AS t(poly_id, n_compact)""".stripMargin

  /** The 16 tile centers of [[polygonCatalog]] as a facility catalog
    * (id, cx, cy) — the nearest-facility dimension for [[geoKnnJoin]].
    */
  private val facilities: Seq[(String, Double, Double)] =
    for { i <- 0 until 4; j <- 0 until 4 }
      yield (f"F_${i}%d_${j}%d", 5.0 * i + 2.505, 5.0 * j + 2.505)

  /** k-nearest-facility join: each customer-derived point matched to
    * its 3 closest tile centers by squared Euclidean distance (planar
    * coords by construction; products only, so distances are
    * deterministic cross-engine with NO trig in the hot path — a
    * haversine variant would rank on libm values that differ by ulps
    * between engines. The ranking runs on the 1e-9-ROUNDED distance:
    * DuckDB contracts the mul-add chain into FMAs, so RAW last-ulp
    * doubles differ from the JVM's unfused sequence — measured here as
    * a rank-2/3 flip on a near-tie; rounding first restores a shared
    * total order, ties then break on fac_id). Broadcast NL against the 16-row catalog + one
    * per-point WindowGroupLimit top-k — the right plan while the
    * catalog is broadcastable; a large facility set would switch to
    * hex/geohash cell blocking with ring expansion (the
    * impute_by_kring machinery).
    */
  def geoKnnJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import scala.jdk.CollectionConverters._
    val fac = spark.createDataFrame(
      facilities.map { case (id, cx, cy) =>
        org.apache.spark.sql.Row(id, cx, cy) }.asJava,
      StructType(Seq(
        StructField("fac_id", StringType, nullable = false),
        StructField("cx", DoubleType, nullable = false),
        StructField("cy", DoubleType, nullable = false))))
    val pts = Tables.customer(spark, dir)
      .select(col("c_custkey").as("pt_id"),
        (abs(col("c_acctbal")) % 20.0).as("x"),
        ((col("c_custkey") % 2000).cast("double") / 100.0).as("y"))
    pts.crossJoin(broadcast(fac))
      .select(col("pt_id"), col("fac_id"),
        round((col("x") - col("cx")) * (col("x") - col("cx"))
          + (col("y") - col("cy")) * (col("y") - col("cy")), 9).as("dist2"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("pt_id"))
          .orderBy(col("dist2").asc, col("fac_id").asc)).cast("long"))
      .where(col("rk") <= 3)
      .select(col("pt_id"), col("fac_id"), col("rk"), col("dist2"))
  }

  private val geoKnnJoinSql = {
    val vals = facilities
      .map { case (id, cx, cy) =>
        s"('$id', CAST($cx AS DOUBLE), CAST($cy AS DOUBLE))" }
      .mkString(",\n|    ")
    s"""WITH fac(fac_id, cx, cy) AS (VALUES
       |    $vals),
       |pts AS (
       |  SELECT c_custkey AS pt_id, abs(c_acctbal) % 20.0 AS x,
       |    CAST(c_custkey % 2000 AS DOUBLE) / 100.0 AS y
       |  FROM customer),
       |d AS (
       |  SELECT pt_id, fac_id,
       |    round((x - cx) * (x - cx) + (y - cy) * (y - cy), 9) AS dist2
       |  FROM pts CROSS JOIN fac),
       |r AS (
       |  SELECT pt_id, fac_id, dist2,
       |    CAST(row_number() OVER (PARTITION BY pt_id
       |      ORDER BY dist2 ASC, fac_id ASC) AS BIGINT) AS rk
       |  FROM d)
       |SELECT pt_id, fac_id, rk, dist2
       |FROM r WHERE rk <= 3""".stripMargin
  }

  val ops: Seq[Op] = Seq(
    Op("geo_knn_join", geoKnnJoin, Some(geoKnnJoinSql)),
    Op("point_in_polygon", pointInPolygon, Some(pointInPolygonSql), bench = true),
    Op("crs_reproject", crsReproject, Some(crsReprojectSql)),
    Op("crs_utm_webmerc", crsUtmWebmerc, Some(crsUtmWebmercSql)),
    Op("crs_lcc_param", crsLccParam, Some(crsLccParamSql)),
    Op("crs_polar_stereo", crsPolarStereo, Some(crsPolarStereoSql)),
    Op("crs_polar_stereo_south", crsPolarStereoSouth,
      Some(crsPolarStereoSouthSql)),
    Op("crs_epsg_dispatch", crsEpsgDispatch, Some(crsEpsgDispatchSql)),
    Op("crs_datum_shift", crsDatumShift, Some(crsDatumShiftSql)),
    Op("impute_by_kring", (s, d) => imputeByKRing(s, d), Some(imputeByKRingSql)),
    Op("hex_cells", hexCells, Some(hexCellsSql)),
    Op("h3_cells", h3CellsVerdict, Some(h3CellsVerdictSql)),
    Op("h3_rg", h3RgVerdict, Some(h3RgVerdictSql)),
    Op("h3_boundary", h3BoundaryChecks, Some(h3BoundaryChecksSql)),
    Op("h3_boundary_exact", h3BoundaryExactChecks, Some(h3BoundaryExactChecksSql)),
    Op("h3_polyfill", h3PolyfillChecks, Some(h3PolyfillChecksSql)),
    Op("h3_compact", h3CompactChecks, Some(h3CompactChecksSql)),
    Op("hex_kring_neighbors", hexKringNeighbors, Some(hexKringNeighborsSql)),
    Op("hex_rg", hexRg, Some(hexRgSql)),
  )
}
