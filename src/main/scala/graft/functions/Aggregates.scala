package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `topk_desc(x, k)` — the k LARGEST values of `x` per group, as a
  * descending-sorted `array<double>`.
  *
  * Why a custom aggregate instead of `collect_list` + sort + slice, or a
  * window `row_number <= k`: both materialize EVERY group member before
  * cutting — `collect_list` holds the whole group in one buffer (OOM on a
  * skewed group at scale) and the window shuffles and sorts all rows. This
  * is a [[TypedImperativeAggregate]] with a bounded min-heap buffer
  * (size ≤ k), so the partial aggregate runs map-side, each executor ships
  * AT MOST k doubles per group to the shuffle, and merge is heap-union.
  * Memory and network are O(groups × k), independent of group size — the
  * aggregate-function analogue of the CosineKnnJoin operator's heap
  * pruning.
  *
  * Determinism: the result is a sorted multiset of VALUES, so input order,
  * partitioning, and merge order cannot change it (ties are equal values).
  */
@ExpressionDescription(
  usage = "topk_desc(expr, k) - top k values of expr per group, sorted descending.")
case class TopKDesc(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Double]]
  with UnaryLike[Expression] {

  require(k > 0, s"topk_desc requires k > 0, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double column (cast explicitly), got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_desc"

  // reverse ordering = min-heap: the head is the WORST kept value, so a
  // full buffer evicts in O(log k)
  override def createAggregationBuffer(): mutable.PriorityQueue[Double] =
    mutable.PriorityQueue.empty[Double](Ordering[Double].reverse)

  private def push(b: mutable.PriorityQueue[Double], v: Double): Unit =
    if (!v.isNaN) { // NaN can never rank (mirrors the kNN operator contract)
      if (b.size < k) b.enqueue(v)
      else if (v > b.head) { b.dequeue(); b.enqueue(v) }
    }

  override def update(
      b: mutable.PriorityQueue[Double], input: InternalRow): mutable.PriorityQueue[Double] = {
    val v = child.eval(input)
    if (v != null) push(b, v.asInstanceOf[Double])
    b
  }

  override def merge(
      b: mutable.PriorityQueue[Double],
      other: mutable.PriorityQueue[Double]): mutable.PriorityQueue[Double] = {
    other.foreach(push(b, _))
    b
  }

  override def eval(b: mutable.PriorityQueue[Double]): Any =
    new GenericArrayData(b.toArray.sorted(Ordering[Double].reverse))

  override def serialize(b: mutable.PriorityQueue[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(b.size * 8)
    b.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Double] = {
    val b = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) b.enqueue(bb.getDouble)
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKDesc =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKDesc =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKDesc =
    copy(child = newChild)
}

object Aggregates {
  /** Column-API entry: `Aggregates.topkDesc(col("x"), 5)` in an `agg(...)`. */
  def topkDesc(c: Column, k: Int): Column =
    ColumnBridge.column(TopKDesc(ColumnBridge.expression(c), k).toAggregateExpression())
}
