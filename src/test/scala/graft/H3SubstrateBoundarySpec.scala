package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.H3Core

/** Substrate-exact cellToBoundary (h3lib's construction). No h3lib
  * binary exists in this environment, so bit-comparison is
  * impossible; instead the suite asserts the properties that uniquely
  * characterize the substrate construction and that the dual
  * construction provably lacks:
  *
  *  - the owner-frame decomposition re-indexes bit-exactly through
  *    the independent base-cell-lookup path (certifies the DERIVED
  *    face-neighbor transform table and the overage adjustment);
  *  - pentagon boundaries have exactly 5 (Class II) / 10 (Class III)
  *    vertices — the distortion-vertex structure h3lib documents;
  *  - every inserted distortion vertex lies ON an icosahedron edge
  *    (equidistant from the two nearest face centers to ~1e-12);
  *  - adjacent cells share boundary vertices ACROSS faces — the
  *    global vertex-set consistency the per-cell dual construction
  *    cannot provide at folds.
  */
class H3SubstrateBoundarySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260815)

  private def randomCells(res: Int, n: Int): Seq[Long] =
    (1 to n).map { _ =>
      H3Core.latLngToCell(rnd.nextDouble() * 180 - 90,
        rnd.nextDouble() * 360 - 180, res)
    }

  /** pentagon cells with random digit tails (leading 4/5 digits hit
    * the deleted-subsequence overage branches).
    */
  private def pentagonCells(res: Int, perBase: Int): Seq[Long] = {
    val bases = (0 until 122).filter(H3Core.isPentagonBaseCell)
    bases.flatMap { bc =>
      (1 to perBase).flatMap { _ =>
        var h = (1L << 59) | (res.toLong << 52) | (bc.toLong << 45)
        var r = 1
        while (r <= 15) {
          val d = if (r <= res) rnd.nextInt(7).toLong else 7L
          h |= d << ((15 - r) * 3)
          r += 1
        }
        if (H3Core.isValidCell(h)) Some(h) else None
      }
    }
  }

  test("owner-frame decomposition re-indexes bit-exactly (derived table certified)") {
    for (res <- 0 to 9) {
      randomCells(res, 1500).foreach { h =>
        assert(H3Core.faceIjkRoundTrips(h),
          s"res=$res cell=${H3Core.h3ToString(h)}")
      }
    }
    for (res <- 0 to 8) {
      pentagonCells(res, 8).foreach { h =>
        assert(H3Core.faceIjkRoundTrips(h),
          s"pentagon res=$res cell=${H3Core.h3ToString(h)}")
      }
    }
  }

  test("vertex arity: hex 6 (+distortions at Class III), pentagon 5 / 10 exactly") {
    for (res <- 0 to 8) {
      randomCells(res, 400).foreach { h =>
        val n = H3Core.cellToBoundaryExact(h).length
        if (H3Core.isPentagon(h))
          assert(n == (if (res % 2 == 1) 10 else 5), H3Core.h3ToString(h))
        else if (res % 2 == 0) assert(n == 6, H3Core.h3ToString(h))
        else assert(n >= 6 && n <= 10, H3Core.h3ToString(h))
      }
      // pentagonCells yields the PENTAGON only for all-zero digit
      // tails; the rest are hexagon children in pentagon-adjacent
      // territory — exactly the cells whose overage paths are hardest
      pentagonCells(res, 2).foreach { h =>
        val n = H3Core.cellToBoundaryExact(h).length
        if (H3Core.isPentagon(h))
          assert(n == (if (res % 2 == 1) 10 else 5),
            s"pentagon ${H3Core.h3ToString(h)}: $n verts")
        else if (res % 2 == 0) assert(n == 6, H3Core.h3ToString(h))
        else assert(n >= 6 && n <= 10, H3Core.h3ToString(h))
      }
    }
  }

  test("every distortion vertex lies ON an icosahedron edge") {
    var found = 0
    for (res <- Seq(1, 3, 5)) {
      (randomCells(res, 500) ++ pentagonCells(res, 2)).foreach { h =>
        H3Core.cellToBoundaryExactTagged(h).foreach { case (a, o, inserted) =>
          if (inserted) {
            found += 1
            val la = math.toRadians(a); val lo = math.toRadians(o)
            val ds = (0 until 20).map { f =>
              val (fla, flo) = H3Core.faceCenterForSpec(f)
              math.acos(math.max(-1.0, math.min(1.0,
                math.sin(la) * math.sin(fla) +
                  math.cos(la) * math.cos(fla) * math.cos(lo - flo))))
            }.sorted
            assert(math.abs(ds(0) - ds(1)) < 1e-12,
              s"${H3Core.h3ToString(h)} vertex ($a,$o) off-edge by ${ds(1) - ds(0)}")
          }
        }
      }
    }
    assert(found > 50, s"too few distortion vertices exercised: $found")
  }

  test("adjacent cells share boundary vertices, including across faces") {
    var crossFacePairs = 0
    for (res <- Seq(2, 3, 5)) {
      randomCells(res, 250).filterNot(H3Core.isPentagon).foreach { h =>
        val vs = H3Core.cellToBoundaryExact(h)
        val f = H3Core.ownerFace(h)
        H3Core.gridDisk(h, 1).filter(x => x != h && !H3Core.isPentagon(x))
          .foreach { nb =>
            val bb = H3Core.cellToBoundaryExact(nb)
            val shared = vs.count { case (a, o) =>
              bb.exists { case (a2, o2) =>
                math.abs(a - a2) < 1e-7 &&
                  math.abs(((o - o2 + 540) % 360) - 180) < 1e-7
              }
            }
            assert(shared >= 2,
              s"${H3Core.h3ToString(h)} and ${H3Core.h3ToString(nb)} share $shared")
            if (H3Core.ownerFace(nb) != f) crossFacePairs += 1
          }
      }
    }
    assert(crossFacePairs > 20,
      s"too few cross-face neighbor pairs exercised: $crossFacePairs")
  }

  test("boundary contains its cell: shrunk vertices re-index to the cell") {
    var bad = 0; var n = 0
    for (res <- Seq(2, 4, 6, 8)) {
      randomCells(res, 300).foreach { h =>
        val (cla, clo) = H3Core.cellToLatLng(h)
        H3Core.cellToBoundaryExact(h).foreach { case (a, o) =>
          val dLon = ((o - clo + 540) % 360) - 180
          n += 1
          if (H3Core.latLngToCell(cla + 0.9 * (a - cla),
            clo + 0.9 * dLon, res) != h) bad += 1
        }
      }
    }
    // chord-vs-geodesic shrinking is inexact at coarse res; the
    // budget is a sanity band, not a tolerance for wrong vertices
    assert(bad <= n / 200, s"$bad of $n shrunk vertices left the cell")
  }

  test("within-face agreement with the dual construction is bounded") {
    for (res <- Seq(4, 6, 8)) {
      randomCells(res, 200).filterNot(H3Core.isPentagon).foreach { h =>
        val f = H3Core.ownerFace(h)
        // disk-2: a cell's VERTICES reach beyond its disk-1 neighbor
        // centers, so disk-1-same-face cells can still have a vertex
        // across a fold (where the constructions genuinely diverge)
        val allSameFace = H3Core.gridDisk(h, 2)
          .forall(x => !H3Core.isPentagon(x) && H3Core.ownerFace(x) == f)
        val ex = H3Core.cellToBoundaryExact(h)
        if (allSameFace && ex.length == 6) {
          val (cla, clo) = H3Core.cellToLatLng(h)
          val rad = ex.map { case (a, o) =>
            math.hypot(a - cla, ((o - clo + 540) % 360) - 180) }.max
          val dual = H3Core.cellToBoundary(h)
          val dMax = ex.map { case (a, o) =>
            dual.map { case (a2, o2) =>
              math.hypot(a - a2, ((o - o2 + 540) % 360) - 180) }.min }.max
          // the two constructions are genuinely different (planar
          // substrate vertices vs spherical circumcenters); interior
          // cells must still roughly agree
          assert(dMax / rad < 0.5,
            s"${H3Core.h3ToString(h)}: dual diff ${dMax / rad}")
        }
      }
    }
  }
}
