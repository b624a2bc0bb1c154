package graft.streaming

import graft.SparkSpec
import graft.operators.OlapB
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class StatefulSessionsSpec extends SparkSpec {

  test("stateful streaming sessions equal batch sessions (closed set)") {
    val streamed = StatefulSessions.streamSessions(spark, sfDir)
      .select("user_id", "session_id", "n_events", "start_us", "end_us")
      .collect().map(_.toString).toSet
    // AvailableNow replay closes a session only when a later event (or a
    // fired timeout) seals it, so the comparison set is the batch result
    // minus each user's final (still-open) session.
    val w = Window.partitionBy("user_id")
    val batchClosed = OlapB.eventsSessionize(spark, sfDir)
      .withColumn("_max", max("session_id").over(w))
      .filter(col("session_id") < col("_max"))
      .select("user_id", "session_id", "n_events", "start_us", "end_us")
      .collect().map(_.toString).toSet
    assert(batchClosed.nonEmpty)
    assert(batchClosed.subsetOf(streamed),
      s"missing ${(batchClosed -- streamed).take(3)}")
    // anything extra must be timeout-closed final sessions — also valid
    val extra = streamed -- batchClosed
    val batchAll = OlapB.eventsSessionize(spark, sfDir)
      .select("user_id", "session_id", "n_events", "start_us", "end_us")
      .collect().map(_.toString).toSet
    assert(extra.subsetOf(batchAll -- batchClosed),
      s"unexpected sessions ${(extra -- batchAll).take(3)}")
  }
}
