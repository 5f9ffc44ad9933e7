package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * h3_to_parent analogs). Codegen'd Catalyst expressions; no oracle
    * (not SQL-expressible) — invariants are scalatest-checked.
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

  /** F20: CRS re-projection stage — the reference's
    * `to_crs("EPSG:4326")` catalog step (RadiusOfGyrationHandler.py:
    * 73-85) as a ONE-pass projected→geographic→hex-index pipeline over
    * synthetic EPSG:6365 coordinates derived from customer. Runs on the
    * catalog side before any broadcast join — never per ping. Rows-only
    * (no geodesy in the oracle engine); round-trip and invariants are
    * spec-verified (R2Spec).
    */
  def crsReproject(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        (lit(2300000.0) + (col("c_custkey") % 4000).cast("double") * 100.0).as("easting"),
        (lit(800000.0) + (abs(col("c_acctbal")) % 9000.0) * 100.0).as("northing"))
      .withColumn("lon", lcc_lon(col("easting"), col("northing")))
      .withColumn("lat", lcc_lat(col("easting"), col("northing")))
      .withColumn("cell", hex_index(col("lat"), col("lon"), lit(9)))

  val ops: Seq[Op] = Seq(
    Op("point_in_polygon", pointInPolygon, Some(pointInPolygonSql), bench = true),
    Op("crs_reproject", crsReproject, None),
    Op("impute_by_kring", (s, d) => imputeByKRing(s, d), None),
    Op("hex_cells", hexCells, None),
    Op("hex_kring_neighbors", hexKringNeighbors, None),
    Op("hex_rg", hexRg, None),
  )
}
