package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Predicate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter runtime join pruning, the explicit form of Spark's
  * adaptive runtime filters: an aggregate builds a compact bloom over
  * the selective (dim) side's join keys, the probe side drops rows the
  * filter rejects BEFORE the join's exchange, and an exact semi-join
  * finishes the job (the bloom only prunes — false positives flow to
  * the exact join, so results are exact for any fpp).
  *
  * At cluster scale this is the difference between shuffling the whole
  * fact table and shuffling only candidate rows: the filter is a few
  * hundred KB broadcast once, the pruned volume is (1 - selectivity) of
  * the probe side.
  */
object BloomExpressions {

  /** Runs the build aggregate and returns the serialized filter.
    * Builders should size expectedItems to the dim cardinality; 1M
    * items at 3% fpp ≈ 0.9 MB — broadcastable.
    */
  def build(df: org.apache.spark.sql.DataFrame, key: org.apache.spark.sql.Column,
      expectedItems: Long = 1 << 20, fpp: Double = 0.03): Array[Byte] = {
    import org.apache.spark.sql.functions.{call_function, lit}
    df.select(call_function("bloom_build",
        key.cast("long"), lit(expectedItems), lit(fpp)).as("bloom"))
      .head().getAs[Array[Byte]](0)
  }
}

/** `bloom_build(key)`: aggregates long keys into a serialized
  * `org.apache.spark.util.sketch.BloomFilter` (binary). Partial
  * aggregation works: per-partition filters are built map-side and
  * OR-merged (`mergeInPlace`) — a bloom is a mergeable sketch, so the
  * exchange carries one filter per partition, never the keys.
  */
case class BloomBuildAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(storageFormat))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_build requires a BIGINT key, got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_build"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuildAgg =
    copy(child = newChild)
}

/** `might_contain(key)` against a build-time bloom: deserialized once
  * per task (transient lazy), probed via a straight-line codegen call —
  * no CodegenFallback, so the filter rides inside WholeStageCodegen
  * right behind the scan.
  */
case class BloomMightContainExpr(child: Expression, bloomBytes: Array[Byte])
  extends UnaryExpression with Predicate {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"might_contain requires a BIGINT key, got ${child.dataType.sql}")

  override def nullSafeEval(value: Any): Any =
    bloom.mightContainLong(value.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, v => s"$bf.mightContainLong($v)")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}
