package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters buffer with `k` counters.
  *
  * Guarantees (Misra & Gries 1982; mergeability per Agarwal et al.,
  * "Mergeable Summaries", PODS'12):
  *  - memory is O(k) regardless of stream length or distinct count;
  *  - every item with true frequency > n/(k+1) is retained;
  *  - retained counts undercount by at most n/(k+1);
  *  - when k ≥ distinct items the counts are EXACT (which is what lets the
  *    canned query be oracle-checked while the operator stays a true
  *    bounded-memory sketch at corpus scale).
  */
final class MGBuffer(val k: Int) {
  val counts = new java.util.HashMap[String, Long]()

  def add(item: String, w: Long = 1L): Unit = {
    val cur = counts.getOrDefault(item, 0L)
    if (cur > 0L) counts.put(item, cur + w)
    else if (counts.size < k) counts.put(item, w)
    else {
      // decrement all by the largest amount that zeroes at least one
      // counter or absorbs w entirely
      var minC = Long.MaxValue
      val it0 = counts.values().iterator()
      while (it0.hasNext) minC = math.min(minC, it0.next())
      val d = math.min(minC, w)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= d) it.remove() else e.setValue(e.getValue - d)
      }
      if (w > d) add(item, w - d)
    }
  }

  def mergeFrom(other: MGBuffer): Unit = {
    other.counts.forEach((item, w) =>
      counts.put(item, counts.getOrDefault(item, 0L) + w))
    if (counts.size > k) {
      // subtract the (k+1)-th largest count from everything, drop <= 0
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - k - 1)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= cut) it.remove() else e.setValue(e.getValue - cut)
      }
    }
  }

  /** (count desc, item asc) — a total order, stable across partitionings
    * whenever the counts themselves are (e.g. the exact regime). */
  def sorted: Array[(String, Long)] = {
    val arr = new Array[(String, Long)](counts.size)
    var i = 0
    counts.forEach((item, c) => { arr(i) = (item, c); i += 1 })
    arr.sortBy { case (item, c) => (-c, item) }
  }
}

/** Heavy-hitters as a true aggregate: O(k) state per group, mergeable
  * partials (map-side combine), no full vocabulary aggregation — the
  * frequency-analysis shape for a 100 TB token stream. Returns
  * array<struct<item,count>> (count desc, item asc). */
case class HeavyHitters(itemExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGBuffer] {

  override def children: Seq[Expression] = Seq(itemExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(k)

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val v = itemExpr.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MGBuffer, other: MGBuffer): MGBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: MGBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    }.toArray[Any])

  override def serialize(buf: MGBuffer): Array[Byte] = {
    val items = buf.sorted.map { case (s, c) => (s.getBytes("UTF-8"), c) }
    val bb = ByteBuffer.allocate(4 + items.map(_._1.length + 12).sum)
    bb.putInt(items.length)
    items.foreach { case (b, c) => bb.putInt(b.length); bb.put(b); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MGBuffer(k)
    var j = 0
    while (j < n) {
      val len = bb.getInt
      val b = new Array[Byte](len); bb.get(b)
      val c = bb.getLong
      buf.counts.put(new String(b, "UTF-8"), c)
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHitters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHitters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(itemExpr = c(0))
}

object heavyhitters {
  import GraftSqlBridge.{column, expression}

  /** Aggregate column: Misra–Gries top items with k counters. */
  def heavy_hitters(item: Column, k: Int): Column =
    column(HeavyHitters(expression(item), k).toAggregateExpression())
}
