package graft.streaming

import graft.SparkSpec
import graft.operators.OlapB
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class StatefulSessionsSpec extends SparkSpec {

  test("stateful streaming sessions equal batch sessions (closed set)") {
    val streamed = StatefulSessions.streamSessions(spark, sfDir)
      .select("user_id", "session_id", "n_events", "start_us", "end_us", "session_value")
      .collect().map(_.toString).toSet
    // AvailableNow replay closes a session only when a later event (or a
    // fired timeout) seals it, so the comparison set is the batch result
    // minus each user's final (still-open) session.
    val w = Window.partitionBy("user_id")
    val batchClosed = OlapB.eventsSessionize(spark, sfDir)
      .withColumn("_max", max("session_id").over(w))
      .filter(col("session_id") < col("_max"))
      .select("user_id", "session_id", "n_events", "start_us", "end_us", "session_value")
      .collect().map(_.toString).toSet
    assert(batchClosed.nonEmpty)
    assert(batchClosed.subsetOf(streamed),
      s"missing ${(batchClosed -- streamed).take(3)}")
    // anything extra must be timeout-closed final sessions — also valid
    val extra = streamed -- batchClosed
    val batchAll = OlapB.eventsSessionize(spark, sfDir)
      .select("user_id", "session_id", "n_events", "start_us", "end_us", "session_value")
      .collect().map(_.toString).toSet
    assert(extra.subsetOf(batchAll -- batchClosed),
      s"unexpected sessions ${(extra -- batchAll).take(3)}")
  }

  test("session counter survives a timeout close (no duplicate session ids)") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    import StatefulSessions.{Ev, SessionState, updateUser}
    // user has 3 closed sessions and an open one; the watermark fires
    val s1 = TestGroupState.create[(Long, SessionState)](
      Optional.of((3L, SessionState(0L, 1000L, 2L, 300L))),
      GroupStateTimeout.EventTimeTimeout, 0L, Optional.of(999999L),
      hasTimedOut = true)
    val closed = updateUser(7L, Iterator.empty, s1).toSeq
    assert(closed.map(_.session_id) === Seq(4L))
    assert(closed.head.session_value === 3.0)
    // the counter must persist so a later in-watermark event continues at 5
    assert(!s1.isRemoved)
    assert(s1.get._1 === 4L && s1.get._2 == null)
    val s2 = TestGroupState.create[(Long, SessionState)](
      Optional.of(s1.get), GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(999999L), hasTimedOut = false)
    val ev = Ev(7L, 1L, 10000000000L, 100L, new java.sql.Timestamp(10000000L))
    assert(updateUser(7L, Iterator(ev), s2).toSeq.isEmpty)
    assert(s2.get._1 === 4L && s2.get._2.n === 1L)
  }
}
