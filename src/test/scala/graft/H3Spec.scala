package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.H3Core

/** True-H3 cell indexing: golden vectors from the public H3 docs plus
  * global structural properties. The golden vectors are the decisive
  * check — they pin the implementation to the published cell numbering,
  * not merely to self-consistency.
  */
class H3Spec extends AnyFunSuite {

  import H3Core._

  test("golden: San Francisco res-9 cell from the H3 docs") {
    // latLngToCell(37.7752702151959, -122.4183072708366, 9)
    // == 8928308280fffff — the worked example in the published docs.
    val h = latLngToCell(37.7752702151959257, -122.418307270836565, 9)
    assert(h3ToString(h) == "8928308280fffff")
  }

  test("golden: res-8 parent of the SF cell") {
    val h = latLngToCell(37.7752702151959257, -122.418307270836565, 9)
    assert(h3ToString(cellToParent(h, 8)) == "8828308281fffff")
    // parent-of-parent consistency: truncating twice == truncating once
    assert(cellToParent(cellToParent(h, 8), 5) == cellToParent(h, 5))
  }

  test("golden: the 12 res-0 pentagons are the published set") {
    // the pentagon base cells {4,14,24,38,49,58,63,72,83,97,107,117}
    // produce exactly these res-0 ids (public H3 test fixtures)
    val want = Set("8009fffffffffff", "801dfffffffffff", "8031fffffffffff",
      "804dfffffffffff", "8063fffffffffff", "8075fffffffffff",
      "807ffffffffffff", "8091fffffffffff", "80a7fffffffffff",
      "80c3fffffffffff", "80d7fffffffffff", "80ebfffffffffff")
    val got = scala.collection.mutable.Set[String]()
    var lat = -89.5
    while (lat <= 89.5) {
      var lon = -179.9
      while (lon <= 180.0) {
        val h = latLngToCell(lat, lon, 0)
        if (isPentagon(h)) got += h3ToString(h)
        lon += 0.5
      }
      lat += 0.5
    }
    assert(got.toSet == want)
  }

  test("res-0 global scan: exactly 122 distinct valid cells, correct digit tails") {
    val cells = scala.collection.mutable.Set[Long]()
    var lat = -89.5
    while (lat <= 89.5) {
      var lon = -179.9
      while (lon <= 180.0) { cells += latLngToCell(lat, lon, 0); lon += 0.5 }
      lat += 0.5
    }
    assert(cells.size == NumBaseCells)
    assert(cells.forall(isValidCell))
    assert(cells.map(getBaseCell).toSeq.sorted == (0 until NumBaseCells))
  }

  test("every res yields valid cells; resolution and base cell decode") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val lat = rng.nextDouble() * 170.0 - 85.0
      val lon = rng.nextDouble() * 360.0 - 180.0
      for (res <- Seq(0, 1, 2, 5, 9, 12, 15)) {
        val h = latLngToCell(lat, lon, res)
        assert(isValidCell(h), s"invalid cell for ($lat,$lon,$res): ${h3ToString(h)}")
        assert(getResolution(h) == res)
        assert(stringToH3(h3ToString(h)) == h, "string round-trip")
      }
    }
  }

  test("indexing refines consistently: parent truncation matches coarser indexing") {
    // child cells overhang parents slightly (aperture-7 rotation), so
    // exact agreement is ~all-but-boundary points; assert a high rate.
    val rng = new scala.util.Random(7)
    var agree = 0
    var total = 0
    for (_ <- 1 to 2000) {
      val lat = rng.nextDouble() * 170.0 - 85.0
      val lon = rng.nextDouble() * 360.0 - 180.0
      for (res <- Seq(5, 9, 13)) {
        val fine = latLngToCell(lat, lon, res)
        val coarse = latLngToCell(lat, lon, res - 1)
        total += 1
        if (cellToParent(fine, res - 1) == coarse) agree += 1
      }
    }
    val rate = agree.toDouble / total
    assert(rate > 0.85, s"parent/refine agreement too low: $rate")
  }

  test("hierarchy is prefix-consistent: same point shares parents across res") {
    // for a fixed point, the res-r index truncated to res-p equals the
    // point's own res-p index for most points (and the SF golden chain
    // exactly) — spot-check the reference's res 12/15 pair
    val lat = 19.432608
    val lon = -99.133209 // Mexico City — the reference's operating area
    val c15 = latLngToCell(lat, lon, 15)
    val c12 = latLngToCell(lat, lon, 12)
    assert(cellToParent(c15, 12) == c12)
    assert(h3ToString(c15).length == 15)
    assert(h3ToString(c15).startsWith("8f"))
    assert(h3ToString(c12).startsWith("8c"))
  }

  test("pentagon flags: pentagons persist down the hierarchy center line") {
    // a pentagon's center child chain stays pentagonal: digits all 0
    val pent0 = stringToH3("8009fffffffffff")
    assert(isPentagon(pent0))
    assert(!isPentagon(latLngToCell(37.7752702151959257, -122.418307270836565, 9)))
  }

  test("golden: decoded SF cell center matches the published value") {
    // h3_to_geo('8928308280fffff') ≈ (37.77670234943567,
    // -122.41845932318311) in the public docs
    val h = stringToH3("8928308280fffff")
    val (la, lo) = cellToLatLng(h)
    assert(math.abs(la - 37.77670234943567) < 1e-9, s"lat $la")
    assert(math.abs(lo - -122.41845932318311) < 1e-9, s"lon $lo")
  }

  test("cellToLatLng round-trips bit-exactly at every resolution") {
    val rng = new scala.util.Random(99)
    for (_ <- 1 to 2000) {
      val lat = rng.nextDouble() * 170.0 - 85.0
      val lon = rng.nextDouble() * 360.0 - 180.0
      val res = rng.nextInt(16)
      val h = latLngToCell(lat, lon, res)
      val (cl, cn) = cellToLatLng(h)
      assert(latLngToCell(cl, cn, res) == h,
        s"decode of ${h3ToString(h)} does not round-trip")
      // the center must be inside-cell-close to the query point:
      // within ~2 cell diameters even at the coarsest scale
      assert(math.abs(cl - lat) < 25.0)
    }
  }

  test("pentagon centers decode to the icosahedron vertices") {
    // the north Atlantic pentagon sits in the Norwegian Sea near
    // (64.7, 10.54) — a well-known H3 fact
    val (la, lo) = cellToLatLng(stringToH3("8009fffffffffff"))
    assert(math.abs(la - 64.7) < 0.01 && math.abs(lo - 10.536) < 0.01,
      s"unexpected pentagon position ($la, $lo)")
  }

  test("golden: k-ring of the SF cell matches the published docs list") {
    val sf = stringToH3("8928308280fffff")
    val got = gridDisk(sf, 1).map(h3ToString).toSet
    val want = Set("8928308280fffff", "8928308280bffff", "89283082873ffff",
      "89283082877ffff", "8928308283bffff", "89283082807ffff",
      "89283082803ffff")
    assert(got == want)
  }

  test("gridDisk sizes and membership distances hold globally") {
    val rng = new scala.util.Random(5)
    for (_ <- 1 to 40) {
      val lat = rng.nextDouble() * 140.0 - 70.0
      val lon = rng.nextDouble() * 360.0 - 180.0
      val res = 6 + rng.nextInt(8)
      val c = latLngToCell(lat, lon, res)
      val k = 1 + rng.nextInt(3)
      val disk = gridDisk(c, k)
      assert(disk.length == 3 * k * (k + 1) + 1,
        s"disk size ${disk.length} for k=$k at ($lat,$lon,$res)")
      assert(disk.contains(c))
      disk.filter(_ != c).foreach { m =>
        val d = gridDistance(c, m)
        assert(d >= 1 && d <= k, s"member at distance $d in k=$k disk")
        assert(gridDistance(m, c) == d, "distance asymmetric")
      }
    }
  }

  test("gridDistance: zero to self, 1 to neighbors, scales with geo distance") {
    val a = latLngToCell(19.4326, -99.1332, 12)
    assert(gridDistance(a, a) == 0)
    gridDisk(a, 1).filter(_ != a).foreach(n => assert(gridDistance(a, n) == 1))
    // ~11.1 km at res 12 (~17.6 m pitch) lands in the hundreds of cells
    val far = latLngToCell(19.5326, -99.1332, 12)
    val d = gridDistance(a, far)
    assert(d > 400 && d < 900, s"implausible res-12 distance $d for ~11 km")
  }

  test("boundary stress: indexing at cell/seam boundaries stays total and valid") {
    // bisect random point pairs to a res-0 boundary (face seams
    // included), then hammer the crossing with ulp-to-1e-6 offsets at
    // random resolutions: indexing must stay total (no lookup-hole
    // throw) and produce valid cells
    val rng = new scala.util.Random(2024)
    var probes = 0
    for (_ <- 1 to 600) {
      var aLat = rng.nextDouble() * 170 - 85
      var aLon = rng.nextDouble() * 360 - 180
      var bLat = rng.nextDouble() * 170 - 85
      var bLon = rng.nextDouble() * 360 - 180
      if (latLngToCell(aLat, aLon, 0) != latLngToCell(bLat, bLon, 0)) {
        var i = 0
        while (i < 45) {
          val mLat = (aLat + bLat) / 2
          val mLon = (aLon + bLon) / 2
          if (latLngToCell(mLat, mLon, 0) == latLngToCell(aLat, aLon, 0)) {
            aLat = mLat; aLon = mLon
          } else {
            bLat = mLat; bLon = mLon
          }
          i += 1
        }
        for (_ <- 1 to 30) {
          val eps = math.pow(10.0, -12 + rng.nextInt(7))
          val lat = aLat + (rng.nextDouble() - 0.5) * eps
          val lon = aLon + (rng.nextDouble() - 0.5) * eps
          val res = rng.nextInt(16)
          val h = latLngToCell(lat, lon, res)
          assert(isValidCell(h), s"invalid at boundary ($lat,$lon,$res)")
          probes += 1
        }
      }
    }
    assert(probes > 10000, s"stress generated too few probes: $probes")
  }

  test("distinct nearby points at res 15 get distinct fine cells") {
    // ~0.5 m cells: two points 100 m apart must differ at res 15
    val a = latLngToCell(19.4326, -99.1332, 15)
    val b = latLngToCell(19.4335, -99.1332, 15)
    assert(a != b)
  }

  private def vec(latD: Double, lonD: Double): (Double, Double, Double) = {
    val la = math.toRadians(latD); val lo = math.toRadians(lonD)
    val c = math.cos(la)
    (c * math.cos(lo), c * math.sin(lo), math.sin(la))
  }

  private def chord(a: (Double, Double, Double), b: (Double, Double, Double)): Double = {
    val dx = a._1 - b._1; val dy = a._2 - b._2; val dz = a._3 - b._3
    math.sqrt(dx * dx + dy * dy + dz * dz)
  }

  test("cellToBoundary: 6 vertices, each equidistant from its three generating centers") {
    val samples = Seq(
      stringToH3("8928308280fffff"),                 // SF golden
      latLngToCell(19.4326, -99.1332, 7),            // CDMX res 7
      latLngToCell(-33.86, 151.21, 5),               // Sydney res 5
      latLngToCell(60.17, 24.94, 9))                 // Helsinki res 9
    for (h <- samples) {
      val verts = cellToBoundary(h)
      assert(verts.length == 6, s"hexagon ${h3ToString(h)} must have 6 vertices")
      val (cLat, cLon) = cellToLatLng(h)
      val centers = gridDisk(h, 1).filter(_ != h).map(n => vec _ tupled cellToLatLng(n))
      val cv = vec(cLat, cLon)
      for (v <- verts) {
        val vv = vec(v._1, v._2)
        val dc = chord(vv, cv)
        // equidistance: distance to the cell center equals the distance
        // to (at least) two neighbor centers — the dual-vertex property
        val near = centers.map(chord(vv, _)).count(d => math.abs(d - dc) < dc * 1e-6)
        assert(near >= 2, s"vertex $v of ${h3ToString(h)} not equidistant (dc=$dc)")
      }
    }
  }

  test("cellToBoundary: pentagons have 5 vertices") {
    val pent = stringToH3("8009fffffffffff") // res-0 pentagon (base cell 4)
    assert(isPentagon(pent))
    assert(cellToBoundary(pent).length == 5)
  }

  test("cellToBoundary: adjacent cells share exactly two vertices") {
    val h = latLngToCell(19.4326, -99.1332, 7)
    val hv = cellToBoundary(h).map(v => vec(v._1, v._2))
    for (n <- gridDisk(h, 1).filter(_ != h)) {
      val nv = cellToBoundary(n).map(v => vec(v._1, v._2))
      val shared = hv.count(a => nv.exists(b => chord(a, b) < 1e-9))
      assert(shared == 2,
        s"${h3ToString(h)} and ${h3ToString(n)} share $shared vertices, want 2")
    }
  }

  test("cellToBoundary: center is inside the vertex ring (planar winding)") {
    val h = latLngToCell(19.4326, -99.1332, 7)
    val (cLat, cLon) = cellToLatLng(h)
    val ring = cellToBoundary(h)
    // planar ray-cast is adequate at cell scale away from poles
    var inside = false
    var i = 0
    var j = ring.length - 1
    while (i < ring.length) {
      val (yi, xi) = ring(i); val (yj, xj) = ring(j)
      if ((yi > cLat) != (yj > cLat) &&
        cLon < (xj - xi) * (cLat - yi) / (yj - yi) + xi) inside = !inside
      j = i; i += 1
    }
    assert(inside, s"center ($cLat,$cLon) outside ring ${ring.mkString(";")}")
  }
}
