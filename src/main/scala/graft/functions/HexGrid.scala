package graft.functions

/** Clean-room hierarchical hexagonal spatial index ("hex grid").
  *
  * Serves the H3-shaped roles the reference pipelines need
  * (/root/reference/src/transforms/NTLTransforms.py:71-72 geo_to_h3,
  * /root/reference/src/imputers/home_ageb_imputers.py:36-51 k_ring +
  * cell centroid, /root/reference/scripts/RadiusOfGyrationHandler.py:139-140
  * grid distance): uniform hex cells over lat/lon, 15-char hex string
  * ids, resolutions 0..15 with ~sqrt(7) linear scaling per resolution
  * (res 12 ≈ 9 m, res 15 ≈ 0.5 m edge — same magnitudes as H3), cell
  * centroid, grid distance, k-ring, parent.
  *
  * NOT bit-compatible with H3's cell numbering — for that, use
  * [[H3Core]] (true published-spec H3, golden-verified) via the
  * h3_* expressions. This grid remains the SQL-oracle-checkable
  * variant: its axial/centroid/distance math is reproducible in the
  * DuckDB oracle (operators.Spatial.HexSql), which transcendental
  * spherical H3 math is not. The id space keeps the reference's
  * string shape: 15 lowercase hex chars, with '000000000000000'
  * remaining an impossible/natural sentinel.
  *
  * Geometry: pointy-top axial coordinates (q, r) on an equirectangular
  * lon/lat plane. All hex math is exact Long arithmetic; only the
  * plane↔axial conversion is floating point.
  */
object HexGrid {

  private val Sqrt3 = math.sqrt(3.0)
  /** Cell edge length in degrees at resolution r: 10 / sqrt(7)^r. */
  private val EdgeDeg: Array[Double] =
    (0 to 15).map(r => 10.0 / math.pow(math.sqrt(7.0), r)).toArray

  // Packed id layout (60 bits in 15 hex chars):
  //   value = ((q + QOff) << 25 | (r + ROff)) * 16 + res
  // q ∈ ±2.9e7 max at res 15 (< QOff = 2^25), r ∈ ±1.3e7 (< ROff = 2^24).
  private val QOff = 1L << 25
  private val ROff = 1L << 24

  final def edgeLengthDeg(res: Int): Double = EdgeDeg(res)

  /** axial coords of the cell containing (lat, lon) at `res`. */
  private def toAxial(lat: Double, lon: Double, res: Int): (Long, Long) = {
    val s = EdgeDeg(res)
    val qf = (Sqrt3 / 3.0 * lon - lat / 3.0) / s
    val rf = (2.0 / 3.0 * lat) / s
    cubeRound(qf, rf)
  }

  /** cube rounding: round fractional axial to the nearest hex center.
    * Rounding is floor(x + 0.5) — NOT Math.round, whose post-JDK-8
    * exact-ties contract differs for inputs one ulp below a half
    * (0.49999999999999994 → 0 vs floor-form 1). The floor form is the
    * one the DuckDB oracle mirror (operators.Spatial.HexSql) can
    * express, so the engine adopts it and parity holds by construction.
    */
  private def cubeRound(qf: Double, rf: Double): (Long, Long) = {
    val sf = -qf - rf
    var q = math.floor(qf + 0.5).toLong
    var r = math.floor(rf + 0.5).toLong
    val s = math.floor(sf + 0.5).toLong
    val dq = math.abs(q - qf)
    val dr = math.abs(r - rf)
    val ds = math.abs(s - sf)
    if (dq > dr && dq > ds) q = -r - s
    else if (dr > ds) r = -q - s
    (q, r)
  }

  private def pack(q: Long, r: Long, res: Int): Long =
    (((q + QOff) << 25) | (r + ROff)) * 16L + res

  private def unpack(v: Long): (Long, Long, Int) = {
    val res = (v % 16).toInt
    val qr = v / 16
    (( qr >> 25) - QOff, (qr & ((1L << 25) - 1)) - ROff, res)
  }

  private def toHex(v: Long): String = {
    val s = java.lang.Long.toHexString(v)
    "0" * (15 - s.length) + s
  }

  private def fromHex(s: String): Long = java.lang.Long.parseLong(s.trim, 16)

  /** lat/lon → 15-char hex cell id (geo_to_h3 analog). */
  def index(lat: Double, lon: Double, res: Int): String = {
    require(res >= 0 && res <= 15, s"resolution $res out of [0,15]")
    val (q, r) = toAxial(lat, lon, res)
    toHex(pack(q, r, res))
  }

  /** cell centroid (h3_to_geo analog): (lat, lon). */
  def center(cell: String): (Double, Double) = {
    val (q, r, res) = unpack(fromHex(cell))
    val s = EdgeDeg(res)
    val lon = s * (Sqrt3 * q + Sqrt3 / 2.0 * r)
    val lat = s * 1.5 * r
    (lat, lon)
  }

  def centerLat(cell: String): Double = center(cell)._1
  def centerLon(cell: String): Double = center(cell)._2

  /** hex grid distance between two same-resolution cells. */
  def gridDistance(a: String, b: String): Long = {
    val (qa, ra, resA) = unpack(fromHex(a))
    val (qb, rb, resB) = unpack(fromHex(b))
    require(resA == resB, s"grid distance across resolutions: $resA vs $resB")
    val dq = qa - qb
    val dr = ra - rb
    (math.abs(dq) + math.abs(dr) + math.abs(dq + dr)) / 2
  }

  /** all cells within grid distance k (k_ring analog, includes center).
    * Size is exactly 3k(k+1)+1.
    */
  def kRing(cell: String, k: Int): Array[String] = {
    require(k >= 0, "k must be >= 0")
    val (q, r, res) = unpack(fromHex(cell))
    val out = Array.newBuilder[String]
    var dq = -k
    while (dq <= k) {
      var dr = math.max(-k, -dq - k)
      val hi = math.min(k, -dq + k)
      while (dr <= hi) {
        out += toHex(pack(q + dq, r + dr, res))
        dr += 1
      }
      dq += 1
    }
    out.result()
  }

  /** coarser-resolution cell containing this cell's centroid
    * (h3_to_parent analog).
    */
  def parent(cell: String, parentRes: Int): String = {
    val (lat, lon) = center(cell)
    index(lat, lon, parentRes)
  }

  def resolution(cell: String): Int = unpack(fromHex(cell))._3
}
