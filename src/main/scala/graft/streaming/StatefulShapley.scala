package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Watermark-evicted per-user state for the B95 streaming Shapley board —
  * the same treatment [[StatefulBaskets]] gives B94, applied to the next
  * instance of the complete-mode class: the previous design held EVERY
  * user ever seen in a complete-mode aggregation and re-ran the lattice
  * tail over all of them every micro-batch. The load-bearing fact: a
  * CONVERTED user's touch flags FREEZE once the event-time watermark
  * passes their first purchase — "channel c credits" ⟺ min(touch ts) <
  * min(purchase ts), and after the watermark no event with ts < fpts can
  * arrive, so no later touch can flip a flag and no later purchase can
  * lower fpts. Such a user SETTLES: their signature (f0…f_{m−1}) emits
  * exactly once in append mode, their state frees, and the drain appends
  * per-batch SIGNATURE COUNTS — a ≤2^m-row sum-monoid rollup — to the
  * persisted board. The final answer merges the rollup and runs the SAME
  * lattice arithmetic as batch B93
  * ([[graft.operators.OlapD.shapleyBoardTail]]), so drain == batch and
  * the key keeps `attribution_shapley`'s oracle. Unconverted users stay
  * in state (their mins matter only if a purchase ever arrives; at
  * deploy a TTL ages them out — the open tail), contributing nothing to
  * v(S) in either engine. At 100 TB: state = unconverted + not-yet-
  * settled users, per-batch drain = O(users settled this batch) + a
  * bounded-literal board merge.
  */
object StatefulShapley {

  /** Sentinel/feed event encoding: purchase = −1, channel touch = its
    * index in the channel alphabet, anything else filtered upstream. */
  final case class Ev(user_id: Long, kind: Int, ts_us: Long,
      ts: java.sql.Timestamp)
  /** Long.MaxValue = "never seen". mins is indexed by channel. */
  final case class ShapAcc(fpts: Long, mins: Seq[Long])
  final case class Settled(user_id: Long, sig: Seq[Int])

  private val Never = Long.MaxValue

  def updateUser(m: Int)(uid: Long, evs: Iterator[Ev],
      state: GroupState[ShapAcc]): Iterator[Settled] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator.single(Settled(uid,
        s.mins.map(t => if (t < s.fpts) 1 else 0)))
    }
    if (uid < 0) return Iterator.empty // watermark sentinel, not a user
    val hadState = state.exists
    // the watermark contract: an event older than the watermark merges
    // only into a user still OPEN in state. With no state it must be
    // DROPPED: the user either already settled into the signature
    // rollup — re-creating state would re-settle them and double-count
    // their signature (review r13 finding; a late lone purchase would
    // even emit all-zero flags) — or was never seen, in which case every
    // watermark system drops the event.
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val live =
      if (hadState) evs
      else evs.filter(_.ts_us >= wmUs)
    val prev = state.getOption.getOrElse(ShapAcc(Never, Seq.fill(m)(Never)))
    var fpts = prev.fpts
    val mins = prev.mins.toArray
    var any = hadState
    live.foreach { e =>
      any = true
      if (e.kind < 0) fpts = math.min(fpts, e.ts_us)
      else mins(e.kind) = math.min(mins(e.kind), e.ts_us)
    }
    if (!any) return Iterator.empty
    state.update(ShapAcc(fpts, mins.toSeq))
    // only converted users settle: the flags freeze when the watermark
    // passes fpts (min is monotone; pre-fpts events can no longer
    // arrive). Unconverted users hold no timeout — the open tail.
    if (fpts != Never)
      state.setTimeoutTimestamp(math.max(fpts / 1000 + 1,
        state.getCurrentWatermarkMs() + 1))
    Iterator.empty
  }

  /** The settled-signature stream over a (user_id, kind, ts) feed whose
    * end carries a far-future sentinel (user_id < 0). */
  def settledSignatures(spark: SparkSession, raw: DataFrame,
      m: Int): Dataset[Settled] = {
    import spark.implicits._
    raw.withWatermark("ts", "1 second")
      .select(col("user_id"), col("kind"),
        unix_micros(col("ts")).as("ts_us"), col("ts"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateUser(m))
  }
}
