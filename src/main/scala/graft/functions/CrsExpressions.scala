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
  /** The reference's CRS, now one instance of the parameterized
    * [[Lcc2sp]] family (LccProjection.scala) — this object keeps the
    * original static entry points and SQL-constant bundle so the
    * hardwired expressions and the crs_reproject oracle are
    * bit-unchanged (the instance computes every derived constant in
    * the identical expression order).
    */
  private val P = CrsRegistry.Epsg6365

  def lccEasting(lon: Double, lat: Double): Double = P.easting(lon, lat)
  def lccNorthing(lon: Double, lat: Double): Double = P.northing(lon, lat)
  def lccLon(easting: Double, northing: Double): Double = P.lonOf(easting, northing)
  def lccLat(easting: Double, northing: Double): Double = P.latOf(easting, northing)

  /** Constants a SQL mirror needs to replay the inverse projection
    * with zero cross-engine constant drift (injected as literals).
    */
  object SqlConsts {
    val e: Double = P.SqlC.e
    val eHalf: Double = P.SqlC.eHalf
    val nConst: Double = P.SqlC.nConst
    val invN: Double = P.SqlC.invN
    val aBigF: Double = P.SqlC.aBigF
    val rho0C: Double = P.SqlC.rho0C
    val lon0: Double = P.SqlC.lon0
    val falseE: Double = P.SqlC.falseE
    val falseN: Double = P.SqlC.falseN
    val halfPi: Double = P.SqlC.halfPi
    val pi: Double = P.SqlC.pi
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
