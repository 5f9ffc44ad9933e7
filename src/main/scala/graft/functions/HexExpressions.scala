package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JVM helpers the generated code calls (static forwarders). */
object HexExprHelpers {
  def index(lat: Double, lon: Double, res: Int): UTF8String =
    UTF8String.fromString(HexGrid.index(lat, lon, res))
  def centerLat(cell: UTF8String): Double = HexGrid.centerLat(cell.toString)
  def centerLon(cell: UTF8String): Double = HexGrid.centerLon(cell.toString)
  def gridDistance(a: UTF8String, b: UTF8String): Long =
    HexGrid.gridDistance(a.toString, b.toString)
  def parent(cell: UTF8String, res: Int): UTF8String =
    UTF8String.fromString(HexGrid.parent(cell.toString, res))
  def kRing(cell: UTF8String, k: Int): ArrayData = {
    val cells = HexGrid.kRing(cell.toString, k)
    new GenericArrayData(cells.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  /** Even-odd ray casting over GeoJSON Polygon rings (outer + holes). */
  def rayCast(rings: ArrayData, x: Double, y: Double): Boolean = {
    var inside = false
    var ri = 0
    while (ri < rings.numElements()) {
      val ring = rings.getArray(ri)
      val n = ring.numElements()
      var i = 0
      var j = n - 1
      while (i < n) {
        val pi = ring.getArray(i)
        val pj = ring.getArray(j)
        val xi = pi.getDouble(0); val yi = pi.getDouble(1)
        val xj = pj.getDouble(0); val yj = pj.getDouble(1)
        if ((yi > y) != (yj > y) &&
          x < (xj - xi) * (y - yi) / (yj - yi) + xi) inside = !inside
        j = i
        i += 1
      }
      ri += 1
    }
    inside
  }
}

/** hex_index(lat, lon, res) → 15-char hex cell id. Codegen'd — this is
  * the per-ping hot path (reference: geo_to_h3 pandas apply / h3_pyspark
  * UDF, /root/reference/src/transforms/NTLTransforms.py:71-72).
  */
case class HexIndexExpr(lat: Expression, lon: Expression, res: Expression)
    extends TernaryExpression {
  override def first: Expression = lat
  override def second: Expression = lon
  override def third: Expression = res
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = lat.dataType == DoubleType && lon.dataType == DoubleType &&
      res.dataType == IntegerType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hex_index expects (double, double, int), got " +
        s"(${lat.dataType}, ${lon.dataType}, ${res.dataType})")
  }
  override def nullSafeEval(latV: Any, lonV: Any, resV: Any): Any =
    HexExprHelpers.index(latV.asInstanceOf[Double], lonV.asInstanceOf[Double],
      resV.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.functions.HexExprHelpers.index($a, $b, $c)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** hex_center_lat/lon(cell) → centroid coordinate (h3_to_geo analog). */
case class HexCenterExpr(child: Expression, isLat: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(cell: Any): Any =
    if (isLat) HexExprHelpers.centerLat(cell.asInstanceOf[UTF8String])
    else HexExprHelpers.centerLon(cell.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (isLat) "centerLat" else "centerLon"
    defineCodeGen(ctx, ev, c => s"graft.functions.HexExprHelpers.$m($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** hex_grid_distance(a, b) → hex steps between same-res cells
  * (h3_distance analog, RadiusOfGyrationHandler.py:139-140).
  */
case class HexGridDistanceExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    HexExprHelpers.gridDistance(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HexExprHelpers.gridDistance($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** hex_kring(cell, k) → array of the 3k(k+1)+1 cells within distance k
  * (k_ring analog, home_ageb_imputers.py:36-39). Codegen'd (r2): it sits
  * under explode in the k-ring imputer's per-round hot path, and a
  * CodegenFallback child breaks the whole-stage span around it.
  */
case class HexKRingExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(cell: Any, k: Any): Any =
    HexExprHelpers.kRing(cell.asInstanceOf[UTF8String], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HexExprHelpers.kRing($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** hex_parent(cell, res) → coarser cell containing this cell's centroid
  * (h3_to_parent analog).
  */
case class HexParentExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(cell: Any, res: Any): Any =
    HexExprHelpers.parent(cell.asInstanceOf[UTF8String], res.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HexExprHelpers.parent($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** st_contains(rings, lon, lat): even-odd ray casting over GeoJSON
  * Polygon coordinates (array<array<array<double>>> — outer ring +
  * holes), the point-in-polygon predicate behind the reference's
  * geopandas sjoin (/root/reference/src/transforms/
  * localization_transforms.py:54-61). Pair with from_json to parse the
  * catalog's GeoJSON strings once, then broadcast-join pings against
  * the tiny polygon catalog.
  */
case class StContainsExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(ringsV: Any, lonV: Any, latV: Any): Any =
    HexExprHelpers.rayCast(ringsV.asInstanceOf[ArrayData],
      lonV.asInstanceOf[Double], latV.asInstanceOf[Double])
  // codegen'd (r2): this predicate runs per-ping inside the broadcast
  // NLJ — CodegenFallback here forced the whole join stage interpreted.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (r, x, y) =>
      s"graft.functions.HexExprHelpers.rayCast($r, $x, $y)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}
