package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary (the mergeable heavy-hitters
  * sketch of Agarwal et al., "Mergeable Summaries"): at most `capacity`
  * counters; an unseen item with a full table decrements every counter
  * instead of evicting one, so every surviving estimate satisfies
  *
  *   true − N/(capacity+1) ≤ estimate ≤ true
  *
  * and any item with true count > N/(capacity+1) is guaranteed present.
  *
  * Scale shape: partial aggregation works — each partition builds its
  * own ≤capacity-entry summary map-side, and the exchange carries one
  * serialized summary per partition (a few KB) instead of the full
  * token-count relation. Merge sums counterpart counters, then applies
  * the standard (k+1)-th-largest subtraction to restore the size bound
  * (error bounds add, preserving the guarantee).
  *
  * Determinism: with capacity ≥ distinct keys no decrement ever fires
  * and the summary IS the exact count map regardless of arrival or
  * merge order — the regime the oracle checks exactly; below that the
  * estimates are order-dependent but bound-respecting (spec-checked).
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(capacity >= 1, "heavy_hitters capacity must be >= 1")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    new mutable.HashMap[String, Long]()

  override def update(
      buffer: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy out of the (possibly reused) UTF8String backing buffer
      val key = v.asInstanceOf[UTF8String].toString
      buffer.get(key) match {
        case Some(c) => buffer.update(key, c + 1)
        case None if buffer.size < capacity => buffer.update(key, 1L)
        case None => decrementAll(buffer, 1L)
      }
    }
    buffer
  }

  override def merge(
      buffer: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) =>
      buffer.update(k, buffer.getOrElse(k, 0L) + c)
    }
    if (buffer.size > capacity) {
      // subtract the (capacity+1)-th largest counter from all, drop ≤0
      val kth = buffer.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      decrementAll(buffer, kth)
    }
    buffer
  }

  private def decrementAll(b: mutable.HashMap[String, Long], by: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[String]
    b.foreach { case (k, c) =>
      if (c - by <= 0) dead += k else b.update(k, c - by)
    }
    dead.foreach(b.remove)
  }

  /** Deterministic output order: estimate DESC, token ASC. */
  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    val rows = buffer.toArray.sortBy { case (k, c) => (-c, k) }.map {
      case (k, c) =>
        InternalRow(UTF8String.fromString(k), c): Any
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new mutable.HashMap[String, Long]()
    var i = 0
    while (i < n) { b.update(in.readUTF(), in.readLong()); i += 1 }
    b
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters requires a STRING key, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}
