package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B97 `time_in_state`: hand-checked interval durations (open tail
  * excluded, ties zero-length), plus conservation on the real corpus. */
class TimeInStateSpec extends SparkSpec {

  test("hand timeline: durations per state, open last interval excluded, " +
      "same-ts tie contributes zero") {
    import spark.implicits._
    val ev = Seq(
      (1L, 0, 100L, "A"), (1L, 10, 101L, "B"), (1L, 15, 102L, "A"),
      (1L, 20, 103L, "B"), // u1's last event: open, excluded
      (2L, 5, 200L, "A"), (2L, 7, 201L, "A"),
      (3L, 4, 300L, "C"), (3L, 4, 301L, "A")) // tie: C->A at the same ts
      .toDF("user_id", "t", "event_id", "event_type")
      .select(col("user_id"),
        timestamp_seconds(lit(1704067200L) + col("t")).as("ts"),
        col("event_id"), col("event_type"))
    val got = OlapC.timeInStateOn(ev, "user_id", "ts", "event_id",
        "event_type").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // u1: A 0->10 (10s), B 10->15 (5s), A 15->20 (5s); u2: A 5->7 (2s);
    // u3: C 4->4 (0s, the tie - event_id orders it first)
    assert(got === Map(
      "A" -> ((3L, 17000000L)),
      "B" -> ((1L, 5000000L)),
      "C" -> ((1L, 0L))))
  }

  test("real corpus: per-user interval time conserves — Σ state time == " +
      "Σ (user span), and dur_s is the exact quotient") {
    val rows = OlapC.timeInState(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(3) ===
      r.getLong(2).toDouble / 1000000.0))
    val total = rows.map(_.getLong(2)).sum
    val spans = graft.sources.Tables(spark, sfDir).events
      .groupBy(col("user_id"))
      .agg((max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
        .as("span"))
      .agg(sum(col("span"))).head().getLong(0)
    assert(total === spans,
      s"state time $total must equal the summed user spans $spans")
  }
}
