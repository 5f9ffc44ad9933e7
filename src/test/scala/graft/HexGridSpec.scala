package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HexGrid

/** Property-style tests over seeded random samples (offline build: no
  * scalatestplus bridge in the cache, so sampling is hand-rolled).
  */
class HexGridSpec extends AnyFunSuite {

  private def samples(n: Int): Seq[(Double, Double, Int)] = {
    val rnd = new scala.util.Random(42)
    (1 to n).map { _ =>
      (rnd.nextDouble() * 178 - 89, rnd.nextDouble() * 359.8 - 179.9,
        1 + rnd.nextInt(15))
    }
  }

  test("index is 15 lowercase hex chars and never the zero sentinel") {
    samples(500).foreach { case (lat, lon, res) =>
      val c = HexGrid.index(lat, lon, res)
      assert(c.length == 15, s"($lat,$lon,$res) -> $c")
      assert(c.matches("[0-9a-f]{15}"))
      assert(c != "000000000000000")
    }
  }

  test("centroid round-trip: index(center(cell)) == cell") {
    samples(500).foreach { case (lat, lon, res) =>
      val cell = HexGrid.index(lat, lon, res)
      val (clat, clon) = HexGrid.center(cell)
      assert(HexGrid.index(clat, clon, res) == cell, s"($lat,$lon,$res)")
    }
  }

  test("centroid is within one edge length of the indexed point") {
    samples(500).foreach { case (lat, lon, res) =>
      val cell = HexGrid.index(lat, lon, res)
      val (clat, clon) = HexGrid.center(cell)
      val d = math.hypot(clat - lat, clon - lon)
      assert(d <= HexGrid.edgeLengthDeg(res) * 1.01, s"($lat,$lon,$res): $d")
    }
  }

  test("kRing size is exactly 3k(k+1)+1, includes center, all within k") {
    samples(100).zipWithIndex.foreach { case ((lat, lon, _), i) =>
      val k = i % 6
      val cell = HexGrid.index(lat, lon, 9)
      val ring = HexGrid.kRing(cell, k)
      assert(ring.length == 3 * k * (k + 1) + 1)
      assert(ring.contains(cell))
      assert(ring.distinct.length == ring.length)
      assert(ring.forall(c => HexGrid.gridDistance(cell, c) <= k))
    }
  }

  test("ring-1 neighbors are exactly distance 1") {
    samples(200).foreach { case (lat, lon, _) =>
      val cell = HexGrid.index(lat, lon, 10)
      val neighbors = HexGrid.kRing(cell, 1).filterNot(_ == cell)
      assert(neighbors.length == 6)
      assert(neighbors.forall(c => HexGrid.gridDistance(cell, c) == 1))
    }
  }

  test("grid distance: identity, symmetry, triangle inequality") {
    val pts = samples(300)
    pts.sliding(3, 3).foreach {
      case Seq((la, lo, _), (lb, lob, _), (lc, loc, _)) =>
        val a = HexGrid.index(la, lo, 8)
        val b = HexGrid.index(lb, lob, 8)
        val c = HexGrid.index(lc, loc, 8)
        assert(HexGrid.gridDistance(a, a) == 0)
        assert(HexGrid.gridDistance(a, b) == HexGrid.gridDistance(b, a))
        assert(HexGrid.gridDistance(a, c) <=
          HexGrid.gridDistance(a, b) + HexGrid.gridDistance(b, c))
      case _ => ()
    }
  }

  test("parent-via-centroid is within one cell of direct coarse index") {
    samples(500).foreach { case (lat, lon, _) =>
      val fine = HexGrid.index(lat, lon, 15)
      val parent = HexGrid.parent(fine, 12)
      val direct = HexGrid.index(lat, lon, 12)
      assert(HexGrid.gridDistance(parent, direct) <= 1, s"($lat,$lon)")
    }
  }

  test("distinct resolutions give distinct ids for the same point") {
    samples(100).foreach { case (lat, lon, _) =>
      val ids = (0 to 15).map(r => HexGrid.index(lat, lon, r))
      assert(ids.distinct.length == 16)
      (0 to 15).foreach(r => assert(HexGrid.resolution(ids(r)) == r))
    }
  }
}
