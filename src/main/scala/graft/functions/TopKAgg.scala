package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `topk_pairs(score, id, k)`: the k largest (score, id) pairs per
  * group, by (score DESC, id ASC) — a bounded-heap aggregate.
  *
  * This is the scale-correct alternative to the row_number-window
  * idiom for per-group top-k: the window shape sorts EVERY group row
  * through an exchange (O(n log n) and full shuffle of the input);
  * the heap aggregate keeps ≤ k candidates per partition per group
  * map-side, so the exchange carries at most k pairs per (partition,
  * group) — the input relation itself never shuffles. Same trade
  * Spark's own physical top-k rewrites make, exposed as a reusable
  * aggregate for grouped queries.
  *
  * Determinism: the (score DESC, id ASC) total order has no ties when
  * ids are unique, so partial/merge order cannot change the result —
  * the window-idiom oracle matches exactly.
  */
case class TopKPairsAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Long)]]
  with BinaryLike[Expression] {

  // the offer() path is a linear scan per non-inserted candidate —
  // only sane for small k (the per-group-top-N use case); a real heap
  // would be the next step if the bound ever needs to grow
  require(k >= 1 && k <= 4096, s"topk_pairs: k out of range: $k")

  // ascending order of "badness": worst-kept candidate first.
  // (a, idA) beats (b, idB) iff a > b, or a == b && idA < idB.
  // Double.compare, NOT raw </==: raw comparisons make NaN
  // un-insertable (every compare false) and the eval sort comparator
  // inconsistent, while Double.compare ranks NaN above every finite
  // value — exactly how Spark's window ORDER BY value DESC and the
  // oracle treat it.
  private def worseThan(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c < 0 || (c == 0 && a._2 > b._2)
  }

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Long)] =
    mutable.ArrayBuffer.empty

  override def update(
      buffer: mutable.ArrayBuffer[(Double, Long)],
      input: InternalRow): mutable.ArrayBuffer[(Double, Long)] = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null)
      offer(buffer, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buffer
  }

  override def merge(
      buffer: mutable.ArrayBuffer[(Double, Long)],
      other: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] = {
    other.foreach(offer(buffer, _))
    buffer
  }

  /** Insert keeping at most k: linear scan is fine — k is small and
    * the buffer is hot in cache (the classic bounded-candidate trade).
    */
  private def offer(b: mutable.ArrayBuffer[(Double, Long)],
      cand: (Double, Long)): Unit = {
    if (b.length < k) { b += cand; () }
    else {
      // replace the current worst if the candidate beats it
      var worst = 0
      var i = 1
      while (i < b.length) { if (worseThan(b(i), b(worst))) worst = i; i += 1 }
      if (worseThan(b(worst), cand)) b(worst) = cand
    }
  }

  override def eval(buffer: mutable.ArrayBuffer[(Double, Long)]): Any = {
    // same total order as worseThan (Double.compare handles NaN)
    val sorted = buffer.sortWith((a, b) => worseThan(b, a))
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(buffer: mutable.ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.length)
    buffer.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = mutable.ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) { b += ((in.readDouble(), in.readLong())); i += 1 }
    b
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_pairs requires (DOUBLE score, BIGINT id), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_pairs"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairsAgg =
    copy(left = newLeft, right = newRight)
}
