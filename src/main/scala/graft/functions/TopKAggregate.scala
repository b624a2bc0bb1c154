package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (score desc, id asc) pairs.
  * `worst` ordering puts the eviction candidate at the heap head. */
final class TopKBuffer(val k: Int) {
  // NOT implicit — an implicit Ordering[(Double, Long)] here would also be
  // picked up by sortBy below and scramble the output order.
  private val goodness: Ordering[(Double, Long)] =
    Ordering.fromLessThan[(Double, Long)] { (a, b) =>
      // a < b  ⇔  a is WORSE than b  ⇔  lower score, or same score+higher id.
      // Double.compare (not <) so the order stays total on -0.0/NaN —
      // raw NaN comparisons are false both ways and corrupt heap invariants.
      val c = java.lang.Double.compare(a._1, b._1)
      c < 0 || (c == 0 && a._2 > b._2)
    }
  // PriorityQueue dequeues its maximum; reversing goodness puts the WORST
  // element at the head for O(log k) eviction.
  val heap = new scala.collection.mutable.PriorityQueue[(Double, Long)]()(goodness.reverse)

  def add(score: Double, id: Long): Unit = {
    // a NaN score (e.g. cosine of a zero-norm vector) is not a ranking —
    // dropping it keeps results deterministic under any partitioning
    if (java.lang.Double.isNaN(score)) return
    if (heap.size < k) heap.enqueue((score, id))
    else if (goodness.lt(heap.head, (score, id))) { heap.dequeue(); heap.enqueue((score, id)) }
  }
  /** best-first */
  def sorted: Array[(Double, Long)] =
    heap.toArray.sorted(goodness.reverse)
}

/** Per-group top-k as a true aggregate: each partition keeps a k-bounded
  * heap (partial aggregation), heaps merge associatively, and no per-group
  * sort of the full candidate set ever happens — the scalable replacement
  * for `row_number().over(Window...)` ≤ k, whose per-partition sort is
  * O(n log n) in group size. Returns array<struct<id,score>> best-first.
  */
case class TopKByScore(scoreExpr: Expression, idExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_k_by_score"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.heap.foreach { case (s, i) => buf.add(s, i) }
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (s, i) =>
      InternalRow(i, s)
    }.toArray[Any])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val arr = buf.sorted
    val bb = ByteBuffer.allocate(4 + arr.length * 16)
    bb.putInt(arr.length)
    arr.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var j = 0
    while (j < n) { val s = bb.getDouble; val i = bb.getLong; buf.add(s, i); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = c(0), idExpr = c(1))
}

object topk {
  import GraftSqlBridge.{column, expression}
  import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression

  /** Aggregate column: best-k (score desc, id asc) pairs per group. */
  def top_k_by_score(score: Column, id: Column, k: Int): Column =
    column(TopKByScore(expression(score), expression(id), k)
      .toAggregateExpression())
}
