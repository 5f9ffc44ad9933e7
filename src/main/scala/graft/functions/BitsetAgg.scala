package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/** `bitset_agg(idx, n)`: aggregates dense int indexes `[0, n)` into a
  * fixed-width bitset (binary, `ceil(n/64)` little-endian longs).
  *
  * The dense-graph adjacency building block: per-group state is
  * exactly `n/8` bytes regardless of how many rows hit the group, and
  * partial aggregation works — per-partition bitsets are built
  * map-side and OR-merged, so the exchange carries one `n/8`-byte
  * buffer per (partition, group), never the index rows. Callers bound
  * `n` (the dense-id catalog) BEFORE choosing this kernel; the ctor
  * refuses an `n` whose per-group buffer would be silly to broadcast.
  */
case class BitsetAgg(
    child: Expression,
    nBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(nBits > 0 && nBits <= (1 << 22),
    s"bitset_agg: n must be in (0, ${1 << 22}] (got $nBits) — a wider " +
      "bitset means the caller skipped its dense-catalog bound")

  private val words = (nBits + 63) >>> 6

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val i = v.asInstanceOf[Int]
      require(i >= 0 && i < nBits, s"bitset_agg: index $i outside [0, $nBits)")
      buffer(i >>> 6) |= 1L << (i & 63)
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var w = 0
    while (w < words) { buffer(w) |= other(w); w += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = serialize(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): Array[Long] = {
    val out = new Array[Long](storageFormat.length / 8)
    java.nio.ByteBuffer.wrap(storageFormat)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitset_agg requires an INT index, got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bitset_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): BitsetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitsetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitsetAgg =
    copy(child = newChild)
}

object BitsetAgg {
  /** Decode a serialized bitset back to its long words. */
  def words(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }
}
