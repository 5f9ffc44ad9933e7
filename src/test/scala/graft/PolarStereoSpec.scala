package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PolarStereoRegistry

/** EPSG:3413 polar stereographic: published-geometry anchors (pole at
  * the false origin, axis orientation from the central meridian),
  * round-trip convergence, and the defining property of "variant B" —
  * true scale at the standard parallel.
  */
class PolarStereoSpec extends AnyFunSuite {

  private val P = PolarStereoRegistry.Epsg3413

  test("north pole maps exactly to the false origin") {
    for (lon <- Seq(-180.0, -45.0, 0.0, 90.0)) {
      assert(math.abs(P.easting(lon, 90.0)) < 1e-6)
      assert(math.abs(P.northing(lon, 90.0)) < 1e-6)
    }
  }

  test("axis orientation: central meridian points down, +90 east points right") {
    // on the central meridian (45W), x = 0 and y < 0 (grid south)
    assert(math.abs(P.easting(-45.0, 70.0)) < 1e-6)
    assert(P.northing(-45.0, 70.0) < 0)
    // 90 degrees east of it (45E), y = 0 and x > 0
    assert(P.easting(45.0, 70.0) > 0)
    assert(math.abs(P.northing(45.0, 70.0)) < 1e-6)
    // the anti-meridian of the CM (135E): x = 0, y > 0
    assert(math.abs(P.easting(135.0, 70.0)) < 1e-6)
    assert(P.northing(135.0, 70.0) > 0)
  }

  test("true scale at the standard parallel (the variant-B contract)") {
    // scale along a parallel = (projected arc length) / (ellipsoidal
    // parallel arc length); at 70N it must be 1 to first order
    val a = 6378137.0
    val e2 = {
      val f = 1.0 / 298.257223563; f * (2 - f)
    }
    def parallelRadius(latDeg: Double): Double = {
      val phi = math.toRadians(latDeg)
      val s = math.sin(phi)
      a * math.cos(phi) / math.sqrt(1 - e2 * s * s)
    }
    def scaleAt(latDeg: Double): Double = {
      val dLon = 0.001
      val (x1, y1) = (P.easting(-45.0, latDeg), P.northing(-45.0, latDeg))
      val (x2, y2) = (P.easting(-45.0 + dLon, latDeg), P.northing(-45.0 + dLon, latDeg))
      val proj = math.hypot(x2 - x1, y2 - y1)
      proj / (parallelRadius(latDeg) * math.toRadians(dLon))
    }
    assert(math.abs(scaleAt(70.0) - 1.0) < 1e-6, s"k(70) = ${scaleAt(70.0)}")
    // polar stereographic scale grows away from the standard parallel
    // toward the equator and shrinks toward the pole
    assert(scaleAt(60.0) > 1.0 && scaleAt(80.0) < 1.0)
  }

  test("south aspect (EPSG:3976): pole at origin, orientation, round-trip") {
    val S = PolarStereoRegistry.Epsg3976
    for (lon <- Seq(-180.0, 0.0, 77.0)) {
      assert(math.abs(S.easting(lon, -90.0)) < 1e-6)
      assert(math.abs(S.northing(lon, -90.0)) < 1e-6)
    }
    // on the central meridian (0°), grid y is POSITIVE (the south
    // aspect reverses the y axis relative to north)
    assert(math.abs(S.easting(0.0, -70.0)) < 1e-6)
    assert(S.northing(0.0, -70.0) > 0)
    // 90°E maps to +x
    assert(S.easting(90.0, -70.0) > 0)
    assert(math.abs(S.northing(90.0, -70.0)) < 1e-6)
    val rng = new scala.util.Random(23)
    for (_ <- 1 to 300) {
      val lon = rng.nextDouble() * 360.0 - 180.0
      val lat = -55.0 - rng.nextDouble() * 35.0
      val (e, n) = (S.easting(lon, lat), S.northing(lon, lat))
      assert(math.abs(S.latOf(e, n) - lat) < 1e-9)
      val dLon = {
        val d = math.abs(S.lonOf(e, n) - lon); math.min(d, 360 - d)
      }
      assert(dLon < 1e-9, s"lon $lon (lat $lat)")
    }
  }

  test("round-trip is sub-centimeter-accurate across the arctic") {
    val rng = new scala.util.Random(11)
    for (_ <- 1 to 500) {
      val lon = rng.nextDouble() * 360.0 - 180.0
      val lat = 55.0 + rng.nextDouble() * 35.0
      val (e, n) = (P.easting(lon, lat), P.northing(lon, lat))
      val (lon2, lat2) = (P.lonOf(e, n), P.latOf(e, n))
      assert(math.abs(lat2 - lat) < 1e-9, s"lat $lat -> $lat2")
      val dLon = math.min(math.abs(lon2 - lon), 360 - math.abs(lon2 - lon))
      assert(dLon < 1e-9, s"lon $lon -> $lon2 (lat $lat)")
    }
  }
}
