package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.H3Core._

/** Pentagon-distortion completeness: the one region where gridDisk's
  * face-frame enumeration could in principle drop members is around
  * the 12 pentagons (h3lib special-cases those disks). Locked here:
  * every cell within distance 2 of every pentagon at res 0-3 has its
  * full neighbor set (6, pentagons 5), and the pentagon-origin disk
  * sizes match the closed form 1 + 5k(k+1)/2.
  */
class H3PentagonProbeSpec extends AnyFunSuite {

  private def pentagonAt(bc: Int, res: Int): Long = {
    var h = (1L << 59) | (res.toLong << 52) | (bc.toLong << 45) | 0x1fffffffffffL
    var r = 1
    while (r <= res) { h = h & ~(7L << ((15 - r) * 3)); r += 1 }
    h
  }

  test("pentagon-adjacent disks are complete at res 0-3 (no dropped neighbors)") {
    var checked = 0
    for (res <- 0 to 3;
        bc <- 0 until NumBaseCells if isPentagonBaseCell(bc);
        m <- gridDisk(pentagonAt(bc, res), 2)) {
      val want = if (isPentagon(m)) 5 else 6
      val got = gridDisk(m, 1).count(_ != m)
      assert(got == want,
        s"res=$res cell=${h3ToString(m)} has $got neighbors, want $want")
      checked += 1
    }
    // 12 pentagons × (1 + 5·2·3/2) members × 4 resolutions
    assert(checked == 768, s"probe shrank: $checked cells")
  }

  test("pentagon-origin disk sizes match 1 + 5k(k+1)/2") {
    for (res <- 0 to 3; k <- 1 to 3;
        bc <- 0 until NumBaseCells if isPentagonBaseCell(bc)) {
      val size = gridDisk(pentagonAt(bc, res), k).length
      assert(size == 1 + 5 * k * (k + 1) / 2,
        s"pentagon bc=$bc res=$res k=$k disk=$size")
    }
  }
}
