package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** PCY-style candidate pruning for thresholded pair counting
  * (Park/Chen/Yu, SIGMOD '95: hash-bucket counts from a cheap first
  * pass rule out pairs that cannot meet the support threshold).
  *
  * The co-occurrence ops explode per-entity item sets into O(k²) pair
  * rows whose exact counting needs a full exchange on the pair key —
  * at 100 TB that pair shuffle IS the job. But with a support
  * threshold t, a bucket-count sketch built map-side (mergeable:
  * element-wise saturating add) bounds every pair's true count from
  * above: count(pair) ≤ bucket(hash(pair)). Pairs whose bucket total
  * stays under t are dropped BEFORE the exchange, and the surviving
  * few still go through the exact groupBy — collisions only ever
  * over-count, so the pruned plan returns byte-identical results while
  * shuffling ~P(bucket ≥ t) of the rows (≈4% for the CF pipeline at
  * sf0.1; the ratio improves as buckets are sized to the data).
  *
  * Wire shape: `pairs.agg(pcy_sketch(hash))` is one row of 2^bits
  * bytes; riding it back on a broadcast nested-loop join keeps the
  * whole flow declarative (the pair-generating subtree is planned
  * once and its exchange reused — no driver collect round-trip).
  *
  * Callers pass a WELL-MIXED 64-bit key (xxhash64 over the pair
  * columns); the sketch just masks low bits for the bucket index.
  */
case class PcySketchAgg(
    child: Expression,
    bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(bits >= 8 && bits <= 28,
    s"pcy_sketch: bits must be in [8, 28], got $bits")

  private val mask: Long = (1L << bits) - 1L

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << bits)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val i = (v.asInstanceOf[Long] & mask).toInt
      if (buffer(i) != Byte.MaxValue) buffer(i) = (buffer(i) + 1).toByte
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buffer.length) {
      val s = buffer(i) + other(i)
      buffer(i) = if (s > Byte.MaxValue) Byte.MaxValue else s.toByte
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = buffer
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storageFormat: Array[Byte]): Array[Byte] = storageFormat

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pcy_sketch requires a BIGINT hash, got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "pcy_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): PcySketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PcySketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): PcySketchAgg =
    copy(child = newChild)
}

/** `pcy_prune(hash, sketch, min)`: true iff the key's saturating
  * bucket count — an upper bound on any pair mapped there — reaches
  * `min`. The sketch is a BUILD-TIME byte array (the collected 1-row
  * aggregate, the BloomMightContainExpr pattern): it enters codegen
  * via addReferenceObj, so the probe is a straight array index inside
  * WholeStageCodegen. Passing the sketch as a COLUMN instead would
  * re-copy the whole array out of its UnsafeRow for every probed row
  * (UnsafeRow.getBinary is a copy — measured as a multi-minute stall
  * at 10M rows × 8 MB), which is why this expression deliberately
  * takes the bytes as a constructor argument, not a child.
  */
case class PcyPruneExpr(child: Expression, sketch: Array[Byte], min: Int)
  extends UnaryExpression with Predicate {

  require(Integer.bitCount(sketch.length) == 1,
    s"pcy_prune: sketch length must be a power of two, got ${sketch.length}")
  require(min >= 1 && min <= Byte.MaxValue,
    s"pcy_prune: min must fit the sketch's byte counters, got $min")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pcy_prune requires a BIGINT hash, got ${child.dataType.sql}")

  override def nullSafeEval(key: Any): Any =
    sketch((key.asInstanceOf[Long] & (sketch.length - 1L)).toInt) >= min

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sk = ctx.addReferenceObj("pcySketch", sketch, "byte[]")
    defineCodeGen(ctx, ev, k =>
      s"($sk[(int) ($k & ((long) $sk.length - 1L))] >= $min)")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "pcy_prune"
  override protected def withNewChildInternal(newChild: Expression): PcyPruneExpr =
    copy(child = newChild)

  // case-class equality on an Array field is reference identity, which
  // would make semantically identical prune predicates compare unequal
  // and defeat common-subexpression elimination / exchange reuse over
  // the pruned subtrees — compare the sketch by CONTENT
  override def equals(o: Any): Boolean = o match {
    case p: PcyPruneExpr => p.child == child && p.min == min &&
      java.util.Arrays.equals(p.sketch, sketch)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + java.util.Arrays.hashCode(sketch)) + min
}

/** `pcy_prune(hash, sketch, min)` with the sketch as an EXPRESSION —
  * for the scalar-subquery wiring (`sketchDf.scalar()`), where the
  * whole prune stays one declarative query: the subquery executes
  * once, its 2^bits-byte result enters codegen as a plan-literal
  * reference (no per-row copy), and exchange reuse lets the main
  * query and the sketch subquery share the pair-source exchange.
  * Do NOT feed this a real per-row binary column: UnsafeRow.getBinary
  * copies the whole array per row (the stall documented on
  * PcyPruneExpr). The registry picks the constant variant whenever
  * the sketch argument is foldable.
  */
case class PcyPruneSubqueryExpr(left: Expression, right: Expression, min: Int)
  extends BinaryExpression with Predicate {

  require(min >= 1 && min <= Byte.MaxValue,
    s"pcy_prune: min must fit the sketch's byte counters, got $min")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pcy_prune requires (BIGINT, BINARY), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(key: Any, sketch: Any): Any = {
    val sk = sketch.asInstanceOf[Array[Byte]]
    // `len - 1` only masks when len is a non-zero power of two (the
    // shape pcy_sketch produces); anything else would silently index
    // the wrong bucket or throw on an empty array — fail loudly.
    if (sk.length == 0 || Integer.bitCount(sk.length) != 1)
      throw new IllegalArgumentException(
        s"pcy_prune: sketch length must be a non-zero power of two " +
          s"(a pcy_sketch output), got ${sk.length}")
    sk((key.asInstanceOf[Long] & (sk.length - 1L)).toInt) >= min
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (k, sk) => s"""
      |if ($sk.length == 0 || java.lang.Integer.bitCount($sk.length) != 1) {
      |  throw new IllegalArgumentException(
      |    "pcy_prune: sketch length must be a non-zero power of two (a pcy_sketch output), got " + $sk.length);
      |}
      |${ev.value} = ($sk[(int) ($k & ((long) $sk.length - 1L))] >= $min);
      |""".stripMargin)

  override def dataType: DataType = BooleanType
  override def prettyName: String = "pcy_prune"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PcyPruneSubqueryExpr =
    copy(left = newLeft, right = newRight)
}
