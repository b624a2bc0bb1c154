package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Watermark-settled per-user state for the B108 streaming entry-path
  * board (B103's top-k journeys maintained BY the stream).
  *
  * State per user = the ≤L smallest (ts, event_id, type) events — a
  * bounded sorted-merge-truncate monoid, so ANY arrival order (split
  * waves, late events) lands on the same prefix. The load-bearing
  * freeze: once a user holds L events and the event-time watermark
  * passes the L-th event's timestamp, no admissible event can sort into
  * the prefix (a later event's ts ≥ watermark > ts_L strictly), so the
  * path SETTLES and emits exactly once in append mode.
  *
  * Why settled users keep a TOMBSTONE instead of freeing entirely (the
  * one deliberate departure from the B94/B95/B98 eviction machines):
  * "first L events" is a prefix property over an UNBOUNDED suffix — the
  * user's later events keep arriving forever, and with no state at all
  * each would re-open the user and re-emit a spurious path at flush.
  * The tombstone is the per-user bit that makes the suffix ignorable;
  * state stays O(users seen) but each settled row shrinks to the empty
  * prefix (at deploy a TTL ages tombstones of users whose event flow
  * ended — the B86 discipline). Users still short of L events cannot
  * freeze mid-stream (any future event extends their prefix), so they
  * flush at `flushAtUs` — the end-of-replay bound the far-future
  * sentinel pushes the watermark past; at deploy that flush is the
  * report cut-off.
  */
object StatefulPaths {

  final case class Ev(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String, ts: java.sql.Timestamp)
  /** settled = tombstone (empty evs); else the sorted ≤L prefix as
    * (ts_us, event_id, event_type) triples. */
  final case class PathAcc(settled: Boolean,
      evs: Seq[(Long, Long, String)])
  final case class SettledPath(user_id: Long, path: String)

  private def pathOf(evs: Seq[(Long, Long, String)]): String =
    evs.map(_._3).mkString(">")

  def updateUser(l: Int, flushAtUs: Long)(uid: Long, evs: Iterator[Ev],
      state: GroupState[PathAcc]): Iterator[SettledPath] = {
    if (state.hasTimedOut) {
      val s = state.get
      if (s.settled) { state.remove(); return Iterator.empty }
      // freeze point (full prefix) or end-of-replay flush (short one):
      // emit once, leave the tombstone so the user's suffix stays inert
      state.update(PathAcc(settled = true, Seq.empty))
      return Iterator.single(SettledPath(uid, pathOf(s.evs)))
    }
    if (uid < 0) return Iterator.empty // watermark sentinel, not a user
    val hadState = state.exists
    if (hadState && state.get.settled) return Iterator.empty
    // the watermark contract (the B95 discipline): a pre-watermark event
    // merges only into OPEN state; with no state it is dropped — the
    // user either settled (tombstone since removed by TTL) or was never
    // seen, and every watermark system drops such an event
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val live = if (hadState) evs else evs.filter(_.ts_us >= wmUs)
    var acc = state.getOption.map(_.evs.toVector).getOrElse(Vector.empty)
    var any = hadState
    live.foreach { e =>
      any = true
      acc = ((acc :+ ((e.ts_us, e.event_id, e.event_type)))
        .sortBy(t => (t._1, t._2))).take(l)
    }
    if (!any) return Iterator.empty
    state.update(PathAcc(settled = false, acc))
    if (acc.size >= l) {
      // full: freezes the moment the watermark strictly passes ts_L
      val tsL = acc.last._1
      state.setTimeoutTimestamp(math.max(tsL / 1000 + 1,
        state.getCurrentWatermarkMs() + 1))
    } else {
      // short: only the end-of-replay flush can finalize it
      state.setTimeoutTimestamp(flushAtUs / 1000)
    }
    Iterator.empty
  }

  /** The settled-path stream over a (user_id, ts, event_id, event_type)
    * feed whose end carries a far-future sentinel (user_id < 0). */
  def settledPaths(spark: SparkSession, raw: DataFrame, l: Int,
      flushAtUs: Long): Dataset[SettledPath] = {
    import spark.implicits._
    raw.withWatermark("ts", "1 second")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"), col("ts"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateUser(l, flushAtUs))
  }
}
