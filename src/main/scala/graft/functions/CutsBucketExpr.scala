package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Branch kernels for [[CutsBucketExpr]] — binary search over the
  * sorted cut array instead of the previous `size(filter(cuts, c =>
  * c OP key))` higher-order-function spelling, which is
  * CodegenFallback and was splitting the whole-stage-codegen span
  * right above every scan feeding a RangeRank pass (r7 plan audit:
  * the bucket Project lost its `*(n)` prefix). Semantics are
  * bit-identical to the HOF counts, including the NaN behavior (all
  * comparisons against NaN are false → bucket 0).
  */
object CutsBucket {
  /** DESC bucket: number of cuts strictly ABOVE the key. */
  def bucketDesc(key: Double, cuts: Array[Double]): Long = {
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (cuts(m) > key) hi = m else lo = m + 1
    }
    (cuts.length - lo).toLong
  }

  /** ASC bucket: number of cuts strictly BELOW the key. */
  def bucketAsc(key: Double, cuts: Array[Double]): Long = {
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (cuts(m) < key) lo = m + 1 else hi = m
    }
    lo.toLong
  }
}

/** `CutsBucketExpr(key, cuts, asc)`: RangeRank's range-bucket
  * assignment as a codegen'd O(log buckets) expression. NULL keys map
  * to the LAST bucket (`cuts.length` — the NULLS LAST position for
  * both directions), so the output is never null; the cut array binds
  * as a codegen reference object (never serialized into the source
  * text).
  */
case class CutsBucketExpr(child: Expression, cuts: Array[Double],
    asc: Boolean) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cuts_bucket expects DOUBLE, got ${child.dataType.sql}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) cuts.length.toLong
    else if (asc) CutsBucket.bucketAsc(v.asInstanceOf[Double], cuts)
    else CutsBucket.bucketDesc(v.asInstanceOf[Double], cuts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val ref = ctx.addReferenceObj("cuts", cuts, "double[]")
    val fn = if (asc) "bucketAsc" else "bucketDesc"
    val resultCode =
      code"""
        ${childGen.code}
        long ${ev.value} = ${childGen.isNull} ? (long) $ref.length :
          graft.functions.CutsBucket.$fn(${childGen.value}, $ref);"""
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
