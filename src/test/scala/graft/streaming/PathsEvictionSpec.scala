package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.TestGroupState
import org.apache.spark.api.java.Optional

/** B108 `stream_top_paths`: the prefix monoid under waves (split users,
  * admissible reorders), the freeze-settle contract, the tombstone's
  * suffix inertness, and drain == batch. */
class PathsEvictionSpec extends SparkSpec with WaveStaging {

  private val T0 = 1704067200L // fixed UTC anchor
  private def evd(rows: Seq[(Long, Int, Long, String)]) = {
    import spark.implicits._
    // (user, hours-from-anchor, event_id, type)
    rows.toDF("user_id", "hh", "event_id", "event_type")
      .select(col("user_id"),
        timestamp_seconds(lit(T0) + col("hh") * 3600L).as("ts"),
        col("event_id"), col("event_type"))
  }

  test("waves: split prefixes merge, a full prefix settles and its " +
      "suffix stays inert, short users flush, drain == batch") {
    // u1 fills its 3-prefix across waves 0/1, then keeps emitting (the
    // suffix the tombstone must ignore); u2 stays short (2 events);
    // u3's second event arrives in a later wave with an EARLIER ts
    // (admissible reorder into open state).
    val w0 = evd(Seq((1L, 1, 11L, "a"), (1L, 2, 12L, "b"),
      (2L, 1, 21L, "x"), (3L, 48, 31L, "p")))
    val w1 = evd(Seq((1L, 3, 13L, "c"), (3L, 47, 32L, "q")))
    val w2 = evd(Seq((1L, 120, 14L, "d"), (2L, 144, 22L, "y")))
    val w3 = evd(Seq((1L, 150, 15L, "e")))
    val maxUs = (T0 + 150L * 3600) * 1000000L
    val sentinel = evd(Seq((-1L, 24 * 3650, -1L, "_sentinel")))
    val srcDir = java.nio.file.Files.createTempDirectory("paths_evict")
    val t0 = System.currentTimeMillis() - 100000
    Seq(w0, w1, w2, w3, sentinel).zipWithIndex.foreach { case (w, i) =>
      writeWave(srcDir, w, s"w$i.parquet", t0 + i * 1000) }
    val raw = spark.readStream.schema(w0.schema)
      .option("pathGlobFilter", "w*.parquet")
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)

    val got = StreamOps.topPathsStreamOn(spark, raw,
      flushAtUs = maxUs + 2L * 86400 * 1000000)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    val batch = graft.operators.OlapC.topPathsOn(
      Seq(w0, w1, w2, w3).reduce(_ unionAll _),
      "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === batch.toSeq, s"drain != batch: ${got.toSeq}")
    // the expected board, hand-checked: u1 a>b>c (d, e ignored by the
    // tombstone), u2 x>y (flushed short), u3 q>p (reorder merged)
    assert(got.map(t => (t._2, t._3)).toSet ===
      Set(("a>b>c", 1L), ("x>y", 1L), ("q>p", 1L)))
    // conservation: every user exactly once — a tombstone leak would
    // re-emit u1 and break this
    assert(got.map(_._3).sum === 3L)
  }

  test("unit state machine: freeze timeout at ts_L, tombstone emits " +
      "nothing and survives, late no-state events drop") {
    import StatefulPaths._
    val l = 3
    val f = updateUser(l, flushAtUs = Long.MaxValue / 2) _
    def ev(ts: Long, id: Long, et: String) =
      Ev(7L, ts, id, et, new java.sql.Timestamp(ts / 1000))
    // full prefix: timeout lands strictly past ts_L (micro → ms + 1)
    val s1 = TestGroupState.create[PathAcc](Optional.empty[PathAcc](),
      org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout(),
      batchProcessingTimeMs = 1000, eventTimeWatermarkMs = Optional.of(10L),
      hasTimedOut = false)
    val out1 = f(7L, Iterator(ev(5000000L, 1, "a"), ev(6000000L, 2, "b"),
      ev(7000000L, 3, "c"), ev(9000000L, 4, "d")), s1)
    assert(out1.isEmpty && s1.exists && !s1.get.settled)
    assert(s1.get.evs.map(_._3) === Seq("a", "b", "c"))
    assert(s1.getTimeoutTimestampMs.get === 7001L)
    // timeout → emit once, leave a tombstone
    val s2 = TestGroupState.create[PathAcc](Optional.of(s1.get),
      org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout(),
      batchProcessingTimeMs = 2000, eventTimeWatermarkMs = Optional.of(8000L),
      hasTimedOut = true)
    val out2 = f(7L, Iterator.empty, s2).toSeq
    assert(out2 === Seq(SettledPath(7L, "a>b>c")))
    assert(s2.exists && s2.get.settled)
    // the tombstone ignores the suffix
    val s3 = TestGroupState.create[PathAcc](Optional.of(s2.get),
      org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout(),
      batchProcessingTimeMs = 3000, eventTimeWatermarkMs = Optional.of(9000L),
      hasTimedOut = false)
    assert(f(7L, Iterator(ev(9500000L, 5, "e")), s3).isEmpty)
    assert(s3.get.settled)
    // a pre-watermark event with NO state drops (settled-and-aged or
    // never seen — the watermark contract)
    val s4 = TestGroupState.create[PathAcc](Optional.empty[PathAcc](),
      org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout(),
      batchProcessingTimeMs = 4000, eventTimeWatermarkMs = Optional.of(9000L),
      hasTimedOut = false)
    assert(f(7L, Iterator(ev(1000000L, 6, "z")), s4).isEmpty)
    assert(!s4.exists)
  }
}
