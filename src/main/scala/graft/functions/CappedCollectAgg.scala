package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `capped_collect(struct, limit)`: collect_list that STOPS RETAINING
  * past `limit + 1` elements — the bounded buffer for build-then-gate
  * aggregations (collect a group's members, then DISCARD any group
  * over a size cap).
  *
  * Why it exists: `collect_list ... WHERE size(xs) <= cap` has the
  * right semantics but materializes the FULL group in one aggregation
  * buffer before the filter runs — a poisoned/stopword-hot key (a
  * gram with df=10⁶⁻⁹ in an inverted index, a stuck-sensor cell)
  * builds a multi-GB single-group buffer and OOMs the executor at
  * exactly the corpus scale the cap exists for. This aggregate keeps
  * at most `limit + 1` elements: groups within the cap retain EVERY
  * element (output identical to collect_list up to order, which
  * build-then-gate consumers never depend on — they explode and
  * re-aggregate), and an over-cap group retains `limit + 1` — enough
  * to prove `size > limit` to the gate that discards it — in O(limit)
  * memory no matter how hot the key is.
  *
  * NOT a general collect_list replacement: which elements survive in
  * an over-cap group depends on partial/merge order. Use only where
  * over-cap groups are filtered out.
  */
case class CappedCollectAgg(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[UnsafeRow]]
  with UnaryLike[Expression] {

  require(limit >= 1 && limit <= (1 << 20),
    s"capped_collect: limit out of range: $limit")

  private def structType = child.dataType.asInstanceOf[StructType]

  // canonicalizes whatever row representation the child evals to into
  // an owned, serializable UnsafeRow copy
  @transient private lazy val proj =
    UnsafeProjection.create(Array(child.dataType))

  override def createAggregationBuffer(): mutable.ArrayBuffer[UnsafeRow] =
    mutable.ArrayBuffer.empty

  override def update(
      buffer: mutable.ArrayBuffer[UnsafeRow],
      input: InternalRow): mutable.ArrayBuffer[UnsafeRow] = {
    if (buffer.length <= limit) { // retain up to limit + 1, then stop
      val v = child.eval(input)
      if (v != null) buffer += proj(InternalRow(v)).copy()
    }
    buffer
  }

  override def merge(
      buffer: mutable.ArrayBuffer[UnsafeRow],
      other: mutable.ArrayBuffer[UnsafeRow]): mutable.ArrayBuffer[UnsafeRow] = {
    var i = 0
    while (buffer.length <= limit && i < other.length) {
      buffer += other(i); i += 1
    }
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[UnsafeRow]): Any =
    new GenericArrayData(buffer.map(_.getStruct(0, structType.length).copy())
      .toArray[Any])

  override def serialize(buffer: mutable.ArrayBuffer[UnsafeRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.length)
    buffer.foreach { r =>
      val b = r.getBytes
      out.writeInt(b.length); out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[UnsafeRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[UnsafeRow]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(1)
      row.pointTo(b, len)
      buf += row
      i += 1
    }
    buf
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StructType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"capped_collect requires a STRUCT child, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "capped_collect"

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CappedCollectAgg =
    copy(child = newChild)
}
