package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Custom-state Structured Streaming: gap-based sessionization with
  * `flatMapGroupsWithState` — the streaming twin of
  * [[graft.operators.Sessionize]] (reference analogue: the per-invoice
  * accumulation the service does in memory, stream/processor.py:56, made
  * incremental and fault-tolerant).
  *
  * State per user is O(1) (current session accumulator), keyed state lives
  * in the state store (RocksDB at deploy scale), and event-time timeouts
  * close sessions when the watermark passes the gap. With shuffle
  * partitioning on the group key this scales linearly in distinct keys —
  * the pattern a 100 TB clickstream needs.
  *
  * The driver-facing query replays the events table with AvailableNow (all
  * rows in one batch, then a timeout flush), so closed sessions match the
  * batch operator exactly — asserted in StatefulSessionsSpec.
  */
object StatefulSessions {

  val GapUs: Long = 1800L * 1000000

  final case class Ev(user_id: Long, event_id: Long, ts_us: Long, cents: Long,
      ts: java.sql.Timestamp)
  final case class SessionState(start_us: Long, end_us: Long, n: Long, cents: Long)
  final case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
      start_us: Long, end_us: Long, session_value: Double)

  private def close(userId: Long, sessionId: Long, s: SessionState): SessionOut =
    // cents/100.0 is the correctly-rounded double of the exact decimal sum,
    // so this bit-matches the batch dsum(value, 2) column
    SessionOut(userId, sessionId, s.n, s.start_us, s.end_us, s.cents / 100.0)

  /** Incremental sessionizer for one user's new events. Events within a
    * batch arrive unordered → sort locally (bounded by per-batch per-key
    * volume); the gap rule then extends or closes the open session. */
  def updateUser(userId: Long, events: Iterator[Ev],
      state: GroupState[(Long, SessionState)]): Iterator[SessionOut] = {
    var (closedCount, open) = state.getOption.getOrElse((0L, null: SessionState))
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
    val sorted = events.toArray.sortBy(e => (e.ts_us, e.event_id))
    if (state.hasTimedOut) {
      if (open != null) {
        closedCount += 1
        out += close(userId, closedCount, open)
      }
      // keep the session counter: a later in-watermark event for this user
      // must continue numbering, not restart at 1 (state.remove() here
      // would emit duplicate (user_id, session_id) keys in a live stream)
      state.update((closedCount, null))
      return out.iterator
    }
    for (e <- sorted) {
      if (open == null) open = SessionState(e.ts_us, e.ts_us, 1L, e.cents)
      else if (e.ts_us - open.end_us > GapUs) {
        closedCount += 1
        out += close(userId, closedCount, open)
        open = SessionState(e.ts_us, e.ts_us, 1L, e.cents)
      } else {
        open = SessionState(open.start_us, e.ts_us, open.n + 1, open.cents + e.cents)
      }
    }
    state.update((closedCount, open))
    // close the open session once the event-time watermark passes the gap
    state.setTimeoutTimestamp(open.end_us / 1000 + GapUs / 1000)
    out.iterator
  }

  val QueryName = "graft_stream_sessions"

  /** The sessionizer DAG over a streaming event source — shared by the
    * driver query (memory sink) and durable deployments (file/Kafka sink +
    * checkpoint; see StatefulSessionsSpec's recovery test). */
  def sessionsStream(spark: SparkSession, dir: String,
      glob: String = "events.parquet"): Dataset[SessionOut] = {
    import spark.implicits._
    val schema = spark.read.option("pathGlobFilter", glob).parquet(dir).schema
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", glob).parquet(dir)
    val withTs =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    // the watermark column must survive into the typed Dataset for
    // EventTimeTimeout bookkeeping
    val evs: Dataset[Ev] = withTs
      .withWatermark("ts", "1 second")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        // exact cents via the same decimal(25,2) quantization dsum uses
        (col("value").cast("decimal(25,2)") * 100).cast("long").as("cents"),
        col("ts"))
      .as[Ev]
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateUser)
  }

  def streamSessions(spark: SparkSession, dir: String): DataFrame = {
    val sessions = sessionsStream(spark, dir)
    spark.streams.active.filter(_.name == QueryName).foreach(_.stop())
    StreamOps.withStatePartitions(spark) {
      val q = sessions.toDF().writeStream.format("memory").queryName(QueryName)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    spark.table(QueryName).orderBy(col("user_id"), col("session_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_sessions" -> (streamSessions _)
  )
}
