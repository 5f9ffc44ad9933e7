package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `ngram_explode(text, n)` — a custom Catalyst Generator (the UDTF
  * surface): emits one (pos, ngram) row per word-n-gram of the input,
  * LAZILY — no intermediate array of ngram strings ever materializes
  * in the row, which is the point versus `explode(transform(...))`
  * when n-grams blow up a 100 TB corpus by ~n×.
  *
  * Completes the engine's extension-type coverage: scalar Expressions,
  * a TypedImperativeAggregate (bloom), this Generator, a custom
  * LogicalPlan/Strategy/Exec (as-of join), optimizer Rules, and both
  * DataSource V2 surfaces. Generators run through the Generate
  * operator; CodegenFallback here is the standard shape for custom
  * generators (Generate itself stages the codegen boundary), and the
  * per-row work is the same tokenizer the shingle kernels use.
  */
case class NgramExplodeExpr(child: Expression, n: Expression)
  extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, n)

  override def elementSchema: StructType = new StructType()
    .add("pos", IntegerType, nullable = false)
    .add("ngram", StringType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngram_explode requires (STRING, INT), got " +
        s"(${child.dataType.sql}, ${n.dataType.sql})")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input).asInstanceOf[UTF8String]
    val nv = n.eval(input)
    if (text == null || nv == null) return Nil
    val k = nv.asInstanceOf[Number].intValue()
    if (k <= 0) return Nil
    val toks = text.toString.split(' ')
    if (toks.length < k) return Nil
    new Iterator[InternalRow] {
      private var i = 0
      override def hasNext: Boolean = i <= toks.length - k
      override def next(): InternalRow = {
        val s = new java.lang.StringBuilder(toks(i))
        var j = i + 1
        while (j < i + k) { s.append(' ').append(toks(j)); j += 1 }
        val row = InternalRow(i, UTF8String.fromString(s.toString))
        i += 1
        row
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NgramExplodeExpr =
    copy(child = newChildren(0), n = newChildren(1))
}
