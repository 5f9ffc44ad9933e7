package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions._

/** EPSG dispatch (r9): the registry must be a pure TABLE over the
  * existing kernels — bit-exact delegation per family, the published
  * UTM hemisphere conventions, plan-time rejection of unknown codes,
  * and round-trip convergence through the uniform surface for every
  * covered family member.
  */
class EpsgDispatchSpec extends AnyFunSuite {

  test("dispatch delegates bit-exactly to the family kernels") {
    // conic: EPSG:6365 == the registered Lcc2sp instance
    val lcc = EpsgRegistry.resolve(6365)
    val lccRef = CrsRegistry.Epsg6365
    for ((lon, lat) <- Seq((-99.1, 19.4), (-103.3, 20.7), (-89.6, 21.0))) {
      assert(lcc.easting(lon, lat) == lccRef.easting(lon, lat))
      assert(lcc.northing(lon, lat) == lccRef.northing(lon, lat))
      val (e, n) = (lccRef.easting(lon, lat), lccRef.northing(lon, lat))
      assert(lcc.lonOf(e, n) == lccRef.lonOf(e, n))
      assert(lcc.latOf(e, n) == lccRef.latOf(e, n))
    }
    // polar, both aspects
    val psN = EpsgRegistry.resolve(3413)
    assert(psN.easting(-45.0, 70.0)
      == PolarStereoRegistry.Epsg3413.easting(-45.0, 70.0))
    val psS = EpsgRegistry.resolve(3976)
    assert(psS.northing(10.0, -75.0)
      == PolarStereoRegistry.Epsg3976.northing(10.0, -75.0))
    // cylindrical: UTM north == the zone helpers, FN = 0
    val utm14 = EpsgRegistry.resolve(32614)
    assert(utm14.easting(-99.0, 19.4) == TmHelpers.utmEasting(-99.0, 19.4, 14))
    assert(utm14.northing(-99.0, 19.4) == TmHelpers.utmNorthing(-99.0, 19.4, 14))
    // web mercator
    val wm = EpsgRegistry.resolve(3857)
    assert(wm.easting(13.4, 52.5) == TmHelpers.webmercX(13.4))
    assert(wm.northing(13.4, 52.5) == TmHelpers.webmercY(52.5))
  }

  test("UTM south hemisphere: the 10,000,000 m false northing convention") {
    val utm23s = EpsgRegistry.resolve(32723)
    // Rio de Janeiro (~43.2W, 22.9S): published UTM 23S northing is
    // ~7,460,000 m — i.e. POSITIVE and below 1e7 (southern points
    // count down from the false northing)
    val n = utm23s.northing(-43.2, -22.9)
    assert(n > 7.4e6 && n < 7.5e6, s"UTM 23S northing $n")
    // exactly the north formula plus FN
    assert(n == 1.0e7 + TmHelpers.utmNorthing(-43.2, -22.9, 23))
    // inverse recovers the southern latitude from the shifted northing
    val e = utm23s.easting(-43.2, -22.9)
    assert(math.abs(utm23s.latOf(e, n) - (-22.9)) < 1e-6)
    assert(math.abs(utm23s.lonOf(e, n) - (-43.2)) < 1e-6)
  }

  test("round-trip convergence through the uniform surface, every family") {
    val cases = Seq(
      6365 -> (-99.1, 19.43), 3347 -> (-106.3, 52.1),
      3413 -> (-20.0, 75.0), 3976 -> (140.0, -77.5),
      32614 -> (-99.0, 19.4), 32723 -> (-43.2, -22.9),
      3857 -> (2.35, 48.86))
    for ((code, (lon, lat)) <- cases) {
      val p = EpsgRegistry.resolve(code)
      val (e, n) = (p.easting(lon, lat), p.northing(lon, lat))
      assert(math.abs(p.lonOf(e, n) - lon) < 1e-6, s"EPSG:$code lon")
      assert(math.abs(p.latOf(e, n) - lat) < 1e-6, s"EPSG:$code lat")
    }
  }

  test("unknown codes are rejected at resolution (and at analysis time)") {
    intercept[IllegalArgumentException](EpsgRegistry.resolve(4326)) // geographic, not planar
    intercept[IllegalArgumentException](EpsgRegistry.resolve(32661)) // UPS, not UTM
    intercept[IllegalArgumentException](EpsgRegistry.resolve(0))
    assert(!EpsgRegistry.covered(99999))
    assert(EpsgRegistry.covered(32601) && EpsgRegistry.covered(32760))
    // through the expression surface: a bad literal fails analysis
    val spark = Sessions.build("epsg-spec", "2")
    import spark.implicits._
    val df = Seq((1.0, 2.0)).toDF("lon", "lat")
    intercept[Exception] {
      df.selectExpr("crs_epsg_easting(9999, lon, lat)").collect()
    }
    // and a non-literal code fails analysis too (plan-time dispatch only)
    intercept[Exception] {
      df.selectExpr("crs_epsg_easting(CAST(lon AS INT), lon, lat)").collect()
    }
  }
}
