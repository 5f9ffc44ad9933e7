package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Clean-room CRS re-projection for the reference's one projected CRS
  * (F20): EPSG:6365 "Mexico ITRF2008 / LCC" ↔ geographic (EPSG:4326-
  * equivalent; ITRF2008 and WGS84 agree at sub-meter for this use).
  * The reference does this with geopandas/pyproj before every spatial
  * join (/root/reference/scripts/RadiusOfGyrationHandler.py:73-85,
  * FactPingsBaseGenerator.py:60-129); here it is a pair of codegen'd
  * scalar expressions a projected catalog runs through ONCE before the
  * broadcast join — never per-ping.
  *
  * Math: Lambert Conformal Conic 2SP on GRS80, standard series from
  * Snyder, "Map Projections — A Working Manual" (USGS PP 1395),
  * pp. 107-109; EPSG:6365 parameters from the public EPSG registry
  * (lat0 12°, lon0 −102°, parallels 17.5°/29.5°, FE 2 500 000 m,
  * FN 0 m).
  */
object CrsHelpers {
  private val A = 6378137.0 // GRS80 semi-major
  private val F = 1.0 / 298.257222101
  private val E2 = F * (2 - F)
  private val E = math.sqrt(E2)

  private val Lat0 = math.toRadians(12.0)
  private val Lon0 = math.toRadians(-102.0)
  private val Lat1 = math.toRadians(17.5)
  private val Lat2 = math.toRadians(29.5)
  private val FalseE = 2500000.0
  private val FalseN = 0.0

  private def mFn(phi: Double): Double = {
    val s = math.sin(phi)
    math.cos(phi) / math.sqrt(1 - E2 * s * s)
  }

  private def tFn(phi: Double): Double = {
    val s = math.sin(phi)
    math.tan(math.Pi / 4 - phi / 2) /
      math.pow((1 - E * s) / (1 + E * s), E / 2)
  }

  private val m1 = mFn(Lat1)
  private val m2 = mFn(Lat2)
  private val t0 = tFn(Lat0)
  private val t1 = tFn(Lat1)
  private val t2 = tFn(Lat2)
  private val n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
  private val bigF = m1 / (n * math.pow(t1, n))
  private val rho0 = A * bigF * math.pow(t0, n)

  /** Forward: geographic degrees → projected easting (m). */
  def lccEasting(lon: Double, lat: Double): Double = {
    val rho = A * bigF * math.pow(tFn(math.toRadians(lat)), n)
    val theta = n * (math.toRadians(lon) - Lon0)
    FalseE + rho * math.sin(theta)
  }

  /** Forward: geographic degrees → projected northing (m). */
  def lccNorthing(lon: Double, lat: Double): Double = {
    val rho = A * bigF * math.pow(tFn(math.toRadians(lat)), n)
    val theta = n * (math.toRadians(lon) - Lon0)
    FalseN + rho0 - rho * math.cos(theta)
  }

  /** Inverse: projected (m) → longitude degrees. */
  def lccLon(easting: Double, northing: Double): Double = {
    val x = easting - FalseE
    val y = rho0 - (northing - FalseN)
    val theta = math.atan2(x, y) // n > 0 for EPSG:6365
    math.toDegrees(theta / n + Lon0)
  }

  /** Inverse: projected (m) → latitude degrees (iterative t⁻¹).
    * Exactly 8 fixed-point rounds, no convergence early-exit: the
    * contraction rate is ~e²/2 ≈ 0.003, so 8 rounds land within an
    * ulp of the fixed point, and a FIXED count is what lets the
    * DuckDB oracle unroll the identical iteration (same float ops in
    * the same order) and hash-match bit-for-bit.
    */
  def lccLat(easting: Double, northing: Double): Double = {
    val x = easting - FalseE
    val y = rho0 - (northing - FalseN)
    val rho = math.sqrt(x * x + y * y) * (if (n < 0) -1 else 1)
    val t = math.pow(rho / (A * bigF), 1 / n)
    var phi = math.Pi / 2 - 2 * math.atan(t)
    var i = 0
    while (i < 8) {
      val s = math.sin(phi)
      phi = math.Pi / 2 - 2 * math.atan(
        t * math.pow((1 - E * s) / (1 + E * s), E / 2))
      i += 1
    }
    math.toDegrees(phi)
  }

  /** Constants a SQL mirror needs to replay the inverse projection
    * with zero cross-engine constant drift (injected as literals).
    */
  object SqlConsts {
    val e: Double = E
    val eHalf: Double = E / 2
    val nConst: Double = n
    val invN: Double = 1 / n
    val aBigF: Double = A * bigF
    val rho0C: Double = rho0
    val lon0: Double = Lon0
    val falseE: Double = FalseE
    val falseN: Double = FalseN
    val halfPi: Double = math.Pi / 2
    val pi: Double = math.Pi
  }
}

/** Binary (x, y) → double scalar projection expressions, codegen'd. */
abstract class CrsBinaryExpr extends BinaryExpression {
  def helper: String
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (double, double), got (${left.dataType}, ${right.dataType})")
  override def nullSafeEval(a: Any, b: Any): Any = evalD(
    a.asInstanceOf[Double], b.asInstanceOf[Double])
  def evalD(a: Double, b: Double): Double
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CrsHelpers.$helper($a, $b)")
}

case class LccEastingExpr(left: Expression, right: Expression) extends CrsBinaryExpr {
  override def helper: String = "lccEasting"
  override def evalD(lon: Double, lat: Double): Double = CrsHelpers.lccEasting(lon, lat)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class LccNorthingExpr(left: Expression, right: Expression) extends CrsBinaryExpr {
  override def helper: String = "lccNorthing"
  override def evalD(lon: Double, lat: Double): Double = CrsHelpers.lccNorthing(lon, lat)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class LccLonExpr(left: Expression, right: Expression) extends CrsBinaryExpr {
  override def helper: String = "lccLon"
  override def evalD(e: Double, n: Double): Double = CrsHelpers.lccLon(e, n)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class LccLatExpr(left: Expression, right: Expression) extends CrsBinaryExpr {
  override def helper: String = "lccLat"
  override def evalD(e: Double, n: Double): Double = CrsHelpers.lccLat(e, n)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}
