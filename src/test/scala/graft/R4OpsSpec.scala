package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sources

/** Round-4 additions: GeoJSON FeatureCollection harvest (S6 closure).
  * The reader's contract is pinned on a tiny fixture: one row per
  * feature, properties flattened, and a geometry string that feeds the
  * existing point-in-polygon path unchanged.
  */
class R4OpsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("geojson_features: FeatureCollection explodes to a usable polygon catalog") {
    // fixture mirrors the municipio-catalog shape
    // (GeneratesMunicipioDB.ipynb cells 1-5): properties + Polygon
    // geometry, pretty-printed across lines (multiLine read).
    val fixture =
      """{
        |  "type": "FeatureCollection",
        |  "features": [
        |    {"type": "Feature",
        |     "properties": {"CVEGEO": "09002", "NOMGEO": "Azcapotzalco"},
        |     "geometry": {"type": "Polygon",
        |       "coordinates": [[[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]]]}},
        |    {"type": "Feature",
        |     "properties": {"CVEGEO": "09003", "NOMGEO": "Coyoacan"},
        |     "geometry": {"type": "Polygon",
        |       "coordinates": [[[10.0, 10.0], [14.0, 10.0], [14.0, 14.0], [10.0, 14.0], [10.0, 10.0]]]}}
        |  ]
        |}""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("geojson").toFile
    val f = new java.io.File(dir, "catalog.geojson")
    java.nio.file.Files.write(f.toPath, fixture.getBytes("UTF-8"))

    val catalog = Sources.geoJsonFeatures(spark, f.getAbsolutePath)
    assert(catalog.count() == 2)
    assert(catalog.columns.toSet ==
      Set("CVEGEO", "NOMGEO", "geometry_type", "geometry"))
    assert(catalog.where(col("geometry_type") === "Polygon").count() == 2)

    // the geometry string must feed the existing containment path:
    // from_json($.coordinates) + st_contains, as Spatial does.
    val ringsType: DataType = ArrayType(ArrayType(ArrayType(DoubleType)))
    import graft.functions.GraftFunctions._
    val hits = catalog
      .select(col("CVEGEO"),
        from_json(get_json_object(col("geometry"), "$.coordinates"), ringsType)
          .as("rings"))
      .select(col("CVEGEO"),
        st_contains(col("rings"), lit(2.0), lit(2.0)).as("in_a"),
        st_contains(col("rings"), lit(12.0), lit(12.0)).as("in_b"))
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2))).toSet
    assert(hits == Set(("09002", true, false), ("09003", false, true)))
  }
}
