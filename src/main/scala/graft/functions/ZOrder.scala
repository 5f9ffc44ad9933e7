package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) curve encoding for multi-dimensional data layout.
  *
  * Interleaving the bits of two sort keys gives a single clustering key
  * whose contiguous ranges are 2-D locality boxes: range-partitioning +
  * sorting files by the z-value bounds BOTH dimensions' min/max per
  * file, so predicates on EITHER column prune files — the layout trick
  * behind Delta/Iceberg OPTIMIZE ZORDER, built here from plain integer
  * bit arithmetic (closed-form magic-mask spreading, no loops, fully
  * codegen'd by Catalyst as built-in expressions, and expressible
  * verbatim in any engine with shifts — the oracle runs the identical
  * formula).
  *
  * Domain: the low 16 bits of each key (callers quantize/clamp first);
  * the result is a 32-bit value in a non-negative long.
  */
object ZOrder {

  /** Spread the low 16 bits of x to even bit positions 0,2,..,30. */
  private def spread(x: Column): Column = {
    val m0 = x.bitwiseAND(lit(0xFFFFL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(0x33333333L))
    m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** z-value of (a, b): a's bits at even positions, b's at odd. */
  def zValue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  private def spreadSql(x: String): String = {
    val m0 = s"($x & 65535)"
    val m1 = s"(($m0 | ($m0 << 8)) & 16711935)"
    val m2 = s"(($m1 | ($m1 << 4)) & 252645135)"
    val m3 = s"(($m2 | ($m2 << 2)) & 858993459)"
    s"(($m3 | ($m3 << 1)) & 1431655765)"
  }

  /** The same z-value as ANSI-ish SQL over integer columns (DuckDB
    * oracle form; identical constants/shifts as [[zValue]]).
    */
  def zValueSql(a: String, b: String): String =
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"

  /** xy→d Hilbert walk on the 16-bit grid (the public-domain per-level
    * quadrant + reflect/transpose algorithm), as one JVM loop for the
    * codegen'd [[HilbertDExpr]]. Bit-identical to the 16 unrolled
    * relational projections it replaces (r10 opt, guide §1.2/§4): the
    * unrolled stack planned ~100 chained conditional expressions per
    * row and benched 4.1 s at sf0.1 under the compute-everything noop
    * sink; the loop is the identical integer arithmetic in one fused
    * call. The ORACLE keeps the 16-CTE SQL spelling — this is an
    * engine-side expression of the same public algorithm, not a new
    * semantic.
    */
  def hilbertD(x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 32768L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** `hilbert_d(x, y)`: Hilbert-curve distance of a 16-bit grid cell —
  * codegen'd single call replacing the 16 unrolled per-level
  * projections (see [[ZOrder.hilbertD]]).
  */
case class HilbertDExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_d expects (bigint, bigint), got (${left.dataType}, ${right.dataType})")
  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.hilbertD(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrder.hilbertD($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
}
