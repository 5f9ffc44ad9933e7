package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Parameterized Lambert Conformal Conic 2SP (r7): the generalization
  * of the hardwired EPSG:6365 pair in [[CrsHelpers]] to ARBITRARY
  * published 2SP parameter sets — the reference's geopandas can
  * re-project any registered CRS (RadiusOfGyrationHandler.py:73-85),
  * so the engine's LCC must be a parameter family, not one instance.
  * Same Snyder (USGS PP 1395 pp. 107-109) series, identical
  * expression sequences to the original object (bit-parity for the
  * EPSG:6365 instance is what keeps crs_reproject's oracle hash
  * stable), instance-scoped derived constants, and a per-instance
  * [[Lcc2sp.SqlC]] bundle so a DuckDB mirror can replay any instance
  * with spliced literals.
  */
final class Lcc2sp(
    val aAxis: Double, val invFlat: Double,
    val lat0Deg: Double, val lon0Deg: Double,
    val lat1Deg: Double, val lat2Deg: Double,
    val fE: Double, val fN: Double) extends Serializable {

  private val A = aAxis
  private val F = 1.0 / invFlat
  private val E2 = F * (2 - F)
  private val E = math.sqrt(E2)

  private val Lat0 = math.toRadians(lat0Deg)
  private val Lon0 = math.toRadians(lon0Deg)
  private val Lat1 = math.toRadians(lat1Deg)
  private val Lat2 = math.toRadians(lat2Deg)

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
  def easting(lon: Double, lat: Double): Double = {
    val rho = A * bigF * math.pow(tFn(math.toRadians(lat)), n)
    val theta = n * (math.toRadians(lon) - Lon0)
    fE + rho * math.sin(theta)
  }

  /** Forward: geographic degrees → projected northing (m). */
  def northing(lon: Double, lat: Double): Double = {
    val rho = A * bigF * math.pow(tFn(math.toRadians(lat)), n)
    val theta = n * (math.toRadians(lon) - Lon0)
    fN + rho0 - rho * math.cos(theta)
  }

  /** Inverse: projected (m) → longitude degrees. */
  def lonOf(easting: Double, northing: Double): Double = {
    val x = easting - fE
    val y = rho0 - (northing - fN)
    val theta = math.atan2(x, y) // n > 0 for the registered instances
    math.toDegrees(theta / n + Lon0)
  }

  /** Inverse: projected (m) → latitude degrees — the fixed 8-round
    * t⁻¹ iteration (see [[CrsHelpers.lccLat]] for why the count is
    * fixed: the SQL mirror must unroll the identical op sequence).
    */
  def latOf(easting: Double, northing: Double): Double = {
    val x = easting - fE
    val y = rho0 - (northing - fN)
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

  /** Per-instance constants for a SQL mirror (spliced as literals).
    * Serializable: once touched (the oracle builder runs at object
    * init) the module is an instance FIELD, and the expressions ship
    * the whole instance to executors — a non-serializable inner
    * object would fail task serialization.
    */
  object SqlC extends Serializable {
    val e: Double = E
    val eHalf: Double = E / 2
    val nConst: Double = n
    val invN: Double = 1 / n
    val aBigF: Double = A * bigF
    val rho0C: Double = rho0
    val lon0: Double = Lon0
    val falseE: Double = fE
    val falseN: Double = fN
    val halfPi: Double = math.Pi / 2
    val quarterPi: Double = math.Pi / 4
    val pi: Double = math.Pi
  }
}

/** Named LCC instances with parameters from the public EPSG registry.
  * Adding a CRS is one line: the expressions, SQL-mirror builder and
  * specs are all parameter-driven.
  */
object CrsRegistry {
  /** Mexico ITRF2008 / LCC (the reference's catalog CRS). */
  val Epsg6365 = new Lcc2sp(6378137.0, 298.257222101,
    12.0, -102.0, 17.5, 29.5, 2500000.0, 0.0)

  /** NAD83 / Statistics Canada Lambert (EPSG:3347): lat0 63°23'26.43",
    * lon0 91°52'W, standard parallels 49°/77°, FE 6 200 000 m,
    * FN 3 000 000 m on GRS80.
    */
  val Epsg3347 = new Lcc2sp(6378137.0, 298.257222101,
    63.390675, -91.86666666666667, 49.0, 77.0, 6200000.0, 3000000.0)

  val byName: Map[String, Lcc2sp] = Map(
    "EPSG:6365" -> Epsg6365,
    "EPSG:3347" -> Epsg3347)
}

/** (crs-literal, lon/e, lat/n) → double: the parameterized LCC
  * expression family. The CRS name resolves to its [[Lcc2sp]] instance
  * at construction; codegen binds the instance as a reference object,
  * so the per-row work is the same straight-line math as the
  * hardwired expressions.
  */
abstract class LccCrsExpr extends TernaryExpression {
  def first: Expression
  def second: Expression
  def third: Expression
  def call: String
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    if (!(first.dataType == StringType && first.foldable))
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a literal CRS name as its first argument")
    val nm = first.eval()
    if (nm == null || !CrsRegistry.byName.contains(nm.toString))
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName: unknown CRS '$nm' (registered: " +
          s"${CrsRegistry.byName.keys.mkString(", ")})")
    if (second.dataType == DoubleType && third.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, double, double)")
  }
  protected lazy val proj: Lcc2sp =
    CrsRegistry.byName(first.eval().asInstanceOf[UTF8String].toString)
  def evalD(p: Lcc2sp, a: Double, b: Double): Double
  override def nullSafeEval(c: Any, a: Any, b: Any): Any =
    evalD(proj, a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lccProj", proj, classOf[Lcc2sp].getName)
    nullSafeCodeGen(ctx, ev, (_, a, b) =>
      s"${ev.value} = $ref.$call($a, $b);")
  }
}

case class LccCrsEastingExpr(first: Expression, second: Expression, third: Expression)
    extends LccCrsExpr {
  override def call: String = "easting"
  override def prettyName: String = "lcc_crs_easting"
  override def evalD(p: Lcc2sp, lon: Double, lat: Double): Double = p.easting(lon, lat)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

case class LccCrsNorthingExpr(first: Expression, second: Expression, third: Expression)
    extends LccCrsExpr {
  override def call: String = "northing"
  override def prettyName: String = "lcc_crs_northing"
  override def evalD(p: Lcc2sp, lon: Double, lat: Double): Double = p.northing(lon, lat)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

case class LccCrsLonExpr(first: Expression, second: Expression, third: Expression)
    extends LccCrsExpr {
  override def call: String = "lonOf"
  override def prettyName: String = "lcc_crs_lon"
  override def evalD(p: Lcc2sp, e: Double, n: Double): Double = p.lonOf(e, n)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

case class LccCrsLatExpr(first: Expression, second: Expression, third: Expression)
    extends LccCrsExpr {
  override def call: String = "latOf"
  override def prettyName: String = "lcc_crs_lat"
  override def evalD(p: Lcc2sp, e: Double, n: Double): Double = p.latOf(e, n)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}
