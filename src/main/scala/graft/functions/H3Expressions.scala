package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JVM helpers the generated code calls (static forwarders). */
object H3ExprHelpers {
  /** null (→ SQL NULL) for non-finite coordinates: a sentinel id would
    * poison every downstream h3_* call one step later instead.
    */
  def index(lat: Double, lon: Double, res: Int): UTF8String = {
    val h = H3Core.latLngToCell(lat, lon, res)
    if (h == H3Core.InvalidIndex) null
    else UTF8String.fromString(H3Core.h3ToString(h))
  }
  def parent(cell: UTF8String, res: Int): UTF8String =
    UTF8String.fromString(
      H3Core.h3ToString(H3Core.cellToParent(H3Core.stringToH3(cell.toString), res)))
  def resolution(cell: UTF8String): Int =
    H3Core.getResolution(H3Core.stringToH3(cell.toString))
  def isPentagon(cell: UTF8String): Boolean =
    H3Core.isPentagon(H3Core.stringToH3(cell.toString))
  def centerLat(cell: UTF8String): Double =
    H3Core.cellToLatLng(H3Core.stringToH3(cell.toString))._1
  def centerLon(cell: UTF8String): Double =
    H3Core.cellToLatLng(H3Core.stringToH3(cell.toString))._2
  def gridDistance(a: UTF8String, b: UTF8String): Long =
    H3Core.gridDistance(H3Core.stringToH3(a.toString), H3Core.stringToH3(b.toString))
  def kRing(cell: UTF8String, k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val cells = H3Core.gridDisk(H3Core.stringToH3(cell.toString), k)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      cells.map(c => UTF8String.fromString(H3Core.h3ToString(c)): Any))
  }
  def children(cell: UTF8String, res: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val cs = H3Core.cellToChildren(H3Core.stringToH3(cell.toString), res)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      cs.map(c => UTF8String.fromString(H3Core.h3ToString(c)): Any))
  }
  /** WKT POLYGON of the cell boundary ("lon lat" vertex order, ring
    * closed) — a string, not a nested array, so results survive any
    * canonizer and feed GIS tools directly.
    */
  def boundaryWkt(cell: UTF8String): UTF8String = {
    val vs = H3Core.cellToBoundary(H3Core.stringToH3(cell.toString))
    wktRing(vs)
  }
  /** WKT of the SUBSTRATE-exact boundary ([[H3Core.cellToBoundaryExact]]
    * — h3lib's construction, including Class III distortion vertices).
    */
  def boundaryExactWkt(cell: UTF8String): UTF8String = {
    val vs = H3Core.cellToBoundaryExact(H3Core.stringToH3(cell.toString))
    wktRing(vs)
  }
  private def wktRing(vs: Array[(Double, Double)]): UTF8String = {
    val ring = vs :+ vs.head
    // plain decimal notation: Double.toString emits 1.2E-4 below 1e-3,
    // which OGC-strict WKT parsers reject; toPlainString keeps the
    // exact shortest-repr digits without the exponent
    def p(d: Double): String = java.math.BigDecimal.valueOf(d).toPlainString
    val pts = ring.map { case (la, lo) => s"${p(lo)} ${p(la)}" }.mkString(", ")
    UTF8String.fromString(s"POLYGON(($pts))")
  }
}

/** h3_index(lat, lon, res) → true H3 cell id string (bit-compatible
  * with the published H3 cell numbering — the reference's geo_to_h3,
  * /root/reference/src/transforms/NTLTransforms.py:71-72). Codegen'd:
  * this is the per-ping hot path. Contrast [[HexIndexExpr]], the
  * engine's SQL-oracle-checkable hex grid with the same string shape.
  */
case class H3IndexExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = first.dataType == DoubleType && second.dataType == DoubleType &&
      third.dataType == IntegerType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"h3_index expects (double, double, int), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }
  override def nullable: Boolean = true
  override def nullSafeEval(lat: Any, lon: Any, res: Any): Any =
    H3ExprHelpers.index(lat.asInstanceOf[Double], lon.asInstanceOf[Double],
      res.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"""${ev.value} = graft.functions.H3ExprHelpers.index($a, $b, $c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** h3_parent(cell, res) → containing H3 cell at coarser res
  * (h3_to_parent, NTLTransforms.py:73) — pure digit truncation.
  */
case class H3ParentExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(cell: Any, res: Any): Any =
    H3ExprHelpers.parent(cell.asInstanceOf[UTF8String], res.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.H3ExprHelpers.parent($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** h3_center_lat/lon(cell) → cell centroid coordinate (h3_to_geo,
  * home_ageb_imputers.py:36-51 centroid use). Decode self-certifies by
  * round-trip (H3Core.cellToLatLng).
  */
case class H3CenterExpr(child: Expression, isLat: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(cell: Any): Any =
    if (isLat) H3ExprHelpers.centerLat(cell.asInstanceOf[UTF8String])
    else H3ExprHelpers.centerLon(cell.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (isLat) "centerLat" else "centerLon"
    defineCodeGen(ctx, ev, c => s"graft.functions.H3ExprHelpers.$m($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** h3_resolution(cell) → resolution 0..15 encoded in the id. */
case class H3ResolutionExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(cell: Any): Any =
    H3ExprHelpers.resolution(cell.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.H3ExprHelpers.resolution($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** h3_grid_distance(a, b) → hex steps between same-res H3 cells
  * (h3_distance, RadiusOfGyrationHandler.py:139-140); -1 when the pair
  * spans a fold no common frame can represent (the reference
  * implementation's local-IJK error surface).
  */
case class H3GridDistanceExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    H3ExprHelpers.gridDistance(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.H3ExprHelpers.gridDistance($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** h3_kring(cell, k) → the 3k(k+1)+1 cells within grid distance k
  * (k_ring, home_ageb_imputers.py:36-39).
  */
case class H3KRingExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullSafeEval(cell: Any, k: Any): Any =
    H3ExprHelpers.kRing(cell.asInstanceOf[UTF8String], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.H3ExprHelpers.kRing($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** h3_children(cell, res) → the cell's descendants at `res`
  * (uncompact's kernel; pentagons expand to 6 per level, hexagons 7).
  */
case class H3ChildrenExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullSafeEval(cell: Any, res: Any): Any =
    H3ExprHelpers.children(cell.asInstanceOf[UTF8String], res.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.H3ExprHelpers.children($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** h3_boundary_wkt(cell) → the cell's boundary polygon as WKT
  * (dual-construction vertices — see [[H3Core.cellToBoundary]]).
  */
case class H3BoundaryWktExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(cell: Any): Any =
    H3ExprHelpers.boundaryWkt(cell.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.H3ExprHelpers.boundaryWkt($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** h3_boundary_exact_wkt(cell) → the cell's boundary polygon as WKT
  * via the substrate construction ([[H3Core.cellToBoundaryExact]] —
  * h3lib-faithful: planar substrate vertices, Class III distortion
  * vertices at icosahedron-edge crossings).
  */
case class H3BoundaryExactWktExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(cell: Any): Any =
    H3ExprHelpers.boundaryExactWkt(cell.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.H3ExprHelpers.boundaryExactWkt($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** h3_is_pentagon(cell) → whether the cell is one of the 12 pentagons
  * at its resolution.
  */
case class H3IsPentagonExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(cell: Any): Any =
    H3ExprHelpers.isPentagon(cell.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.H3ExprHelpers.isPentagon($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
