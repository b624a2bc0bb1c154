package graft.streaming

import graft.SparkSpec
import graft.operators.{OlapB, OlapC, OlapD}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Genuine multi-batch drain==batch proofs for the flatMapGroupsWithState
  * family (B15 sessions, B38 SCD2, B45 attribution, B47 transitions).
  *
  * Each machine replays the event corpus as THREE time-ordered waves with
  * `maxFilesPerTrigger=1` — one micro-batch per wave — so per-key state
  * must genuinely survive batch boundaries (and, for sessions/SCD2, the
  * watermark-driven timeout path fires BETWEEN batches, not only at the
  * final sentinel flush). The wave boundary is placed INSIDE a known
  * batch-result interval (a session / an SCD2 run / a click→purchase
  * pair), so the cross-batch carry provably fires rather than the test
  * passing vacuously on waves that happen to contain whole histories.
  *
  * Time-ordering matters: the waves partition event time, so the
  * watermark after wave w (max(wave w) − 1 s) never marks a wave-(w+1)
  * event late — the same property a time-ordered production source (Kafka
  * with bounded disorder inside the delay) provides. The gate queries keep
  * their single-data-batch `require` because their ORACLE equality is only
  * claimed for the sentinel-flush replay; THIS spec is the evidence the
  * machines themselves are not single-batch artifacts.
  */
class StatefulReplaySpec extends SparkSpec with WaveStaging {

  private val OneBatchPerFile = Map("maxFilesPerTrigger" -> "1")

  /** Events with ts both as timestamp and epoch micros, plus corpus span. */
  private def eventsUs: (DataFrame, Long, Long) = {
    val ev = graft.sources.Tables(spark, sfDir).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("ts"), unix_micros(col("ts")).as("ts_us"))
    val r = ev.agg(min(col("ts_us")), max(col("ts_us"))).head()
    (ev, r.getLong(0), r.getLong(1))
  }

  /** Split into 3 time-ordered waves at (b1, b2) and write them (plus an
    * optional sentinel row appended to the LAST wave), returning the
    * source dir. `cols` picks the wave schema the machine reads. */
  private def writeWaves(ev: DataFrame, b1: Long, b2: Long,
      cols: Seq[String], sentinel: Option[DataFrame]): java.nio.file.Path = {
    require(b1 < b2)
    val src = java.nio.file.Files.createTempDirectory("graft_fmgws_mb")
    val t0 = 1700000000000L
    val waves = Seq(
      ev.filter(col("ts_us") < b1),
      ev.filter(col("ts_us") >= b1 && col("ts_us") < b2),
      ev.filter(col("ts_us") >= b2))
    waves.zipWithIndex.foreach { case (w, i) =>
      assert(w.limit(1).count() == 1, s"wave $i is empty — bad boundaries")
      val base = w.select(cols.map(col): _*)
      val df = if (i == 2) sentinel.fold(base)(base.unionByName(_)) else base
      writeWave(src, df, s"w$i.parquet", t0 + i * 60000L)
    }
    src
  }

  private def drainWaves[T](ds: org.apache.spark.sql.Dataset[T],
      name: String): (DataFrame, Int) = {
    val ss = StreamOps.streamingSession(spark)
    var nDataBatches = 0
    val drained = StreamOps.drainViaParquetSink(ss, ds.toDF(), name,
      afterDrain = q =>
        nDataBatches = q.recentProgress.count(_.numInputRows > 0))
    (drained, nDataBatches)
  }

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("B15 multi-batch: session state carries across 3 time-ordered " +
      "micro-batches and equals the batch sessionizer") {
    import spark.implicits._
    val (ev, mn, mx) = eventsUs
    // boundary INSIDE the longest batch session, so that session's state
    // must survive the wave-0 → wave-1 batch boundary to close correctly
    val batch = OlapB.eventsSessionize(spark, sfDir)
    val longest = batch.orderBy((col("end_us") - col("start_us")).desc)
      .select(col("start_us"), col("end_us")).head()
    val b1 = (longest.getLong(0) + longest.getLong(1)) / 2
    assert(longest.getLong(0) < b1 && b1 < longest.getLong(1))
    val b2 = b1 + (mx - b1) / 2
    val sentinel = Seq((-1L, -1L, 0.0, new java.sql.Timestamp(0L)))
      .toDF("user_id", "event_id", "value", "ts")
      .withColumn("ts",
        timestamp_micros(lit(mx + 3 * StatefulSessions.GapUs)))
    val src = writeWaves(ev, b1, b2,
      Seq("user_id", "event_id", "value", "ts"), Some(sentinel))
    val ss = StreamOps.streamingSession(spark)
    val (drained, nBatches) = drainWaves(
      StatefulSessions.sessionsStream(ss, src.toString, glob = "w*.parquet",
        sourceOptions = OneBatchPerFile), "graft_sessions_mb")
    assert(nBatches >= 3, s"expected >=3 data micro-batches, got $nBatches")
    val w = Window.partitionBy(col("user_id")).orderBy(col("start_us"))
    val streamed = drained.filter(col("user_id") >= 0)
      .select(col("user_id"),
        row_number().over(w).cast("bigint").as("session_id"),
        col("n_events"), col("start_us"), col("end_us"),
        col("session_value"))
    val b = rows(batch); val s = rows(streamed)
    assert(s.nonEmpty && s === b,
      s"missing ${(b -- s).take(3)} extra ${(s -- b).take(3)}")
    graft.sources.IndexScratch.deleteRec(src.toFile)
  }

  test("B38 multi-batch: SCD2 version counters survive 3 time-ordered " +
      "micro-batches and equal the batch compaction") {
    import spark.implicits._
    val (ev, mn, mx) = eventsUs
    // boundary INSIDE the longest batch run: the open run (and its version
    // counter) must carry across the boundary until the closing event
    // arrives in a LATER batch
    val batch = OlapC.scd2Track(spark, sfDir)
    val longest = batch.filter(col("valid_to_us").isNotNull)
      .orderBy((col("valid_to_us") - col("valid_from_us")).desc)
      .select(col("valid_from_us"), col("valid_to_us")).head()
    val b1 = (longest.getLong(0) + longest.getLong(1)) / 2
    assert(longest.getLong(0) < b1 && b1 < longest.getLong(1))
    val b2 = b1 + (mx - b1) / 2
    val sentinel = Seq((-1L, -1L, "_sentinel", new java.sql.Timestamp(0L)))
      .toDF("user_id", "event_id", "event_type", "ts")
      .withColumn("ts", timestamp_micros(
        lit(mx + StatefulSessions.Scd2IdleUs + 3 * StatefulSessions.GapUs)))
    val src = writeWaves(ev, b1, b2,
      Seq("user_id", "event_id", "event_type", "ts"), Some(sentinel))
    val ss = StreamOps.streamingSession(spark)
    val (drained, nBatches) = drainWaves(
      StatefulSessions.scd2Stream(ss, src.toString, glob = "w*.parquet",
        sourceOptions = OneBatchPerFile), "graft_scd2_mb")
    assert(nBatches >= 3, s"expected >=3 data micro-batches, got $nBatches")
    val streamed = drained.filter(col("user_id") >= 0)
      .select(col("user_id"), col("version"), col("event_type"),
        col("valid_from_us"), col("valid_to_us"), col("n_events"))
    val b = rows(batch); val s = rows(streamed)
    assert(s.nonEmpty && s === b,
      s"missing ${(b -- s).take(3)} extra ${(s -- b).take(3)}")
    graft.sources.IndexScratch.deleteRec(src.toFile)
  }

  test("B45 multi-batch: a purchase credits a click from an EARLIER " +
      "micro-batch and the feed equals the batch attribution") {
    val (ev, mn, mx) = eventsUs
    // boundary strictly between a credited click and its purchase, so the
    // click state must survive the batch boundary to be credited
    val batch = OlapD.attribution(spark, sfDir)
    val pair = batch.filter(col("click_event_id").isNotNull &&
        col("ts_us") > col("click_ts_us") + 1)
      .orderBy((col("ts_us") - col("click_ts_us")).desc)
      .select(col("click_ts_us"), col("ts_us")).head()
    val b1 = (pair.getLong(0) + pair.getLong(1)) / 2
    assert(pair.getLong(0) < b1 && b1 < pair.getLong(1))
    val b2 = b1 + (mx - b1) / 2
    val src = writeWaves(ev, b1, b2,
      Seq("user_id", "event_id", "event_type", "value", "ts"), None)
    val ss = StreamOps.streamingSession(spark)
    val (drained, nBatches) = drainWaves(
      StatefulAttribution.attributionStream(ss, src.toString,
        glob = "w*.parquet", sourceOptions = OneBatchPerFile),
      "graft_attr_mb")
    assert(nBatches >= 3, s"expected >=3 data micro-batches, got $nBatches")
    val streamed = drained.select(col("event_id"), col("user_id"),
      col("ts_us"), col("click_event_id"), col("click_ts_us"), col("value"))
    val b = rows(batch); val s = rows(streamed)
    assert(s.nonEmpty && s === b,
      s"missing ${(b -- s).take(3)} extra ${(s -- b).take(3)}")
    graft.sources.IndexScratch.deleteRec(src.toFile)
  }

  test("B47 multi-batch: transition chains continue across micro-batches " +
      "(no spurious START edges) and the matrix equals the batch rollup") {
    val (ev, mn, mx) = eventsUs
    val b1 = mn + (mx - mn) / 3
    val b2 = mn + 2 * (mx - mn) / 3
    // cross-batch edges must exist: some user has events on both sides of
    // b1 — if the carry broke, that user would contribute an extra START
    // edge and the matrix would differ from the batch twin
    val straddlers = ev.groupBy(col("user_id"))
      .agg(min(col("ts_us")).as("mn"), max(col("ts_us")).as("mx"))
      .filter(col("mn") < b1 && col("mx") >= b1).limit(1).count()
    assert(straddlers == 1, "no user straddles the wave boundary")
    val src = writeWaves(ev, b1, b2,
      Seq("user_id", "event_id", "event_type", "ts"), None)
    val ss = StreamOps.streamingSession(spark)
    val (drainedEdges, nBatches) = drainWaves(
      StatefulTransitions.transitionsStream(ss, src.toString,
        glob = "w*.parquet", sourceOptions = OneBatchPerFile),
      "graft_trans_mb")
    assert(nBatches >= 3, s"expected >=3 data micro-batches, got $nBatches")
    val streamed = drainedEdges
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val b = rows(OlapC.eventTransitions(spark, sfDir)); val s = rows(streamed)
    assert(s.nonEmpty && s === b,
      s"missing ${(b -- s).take(3)} extra ${(s -- b).take(3)}")
    graft.sources.IndexScratch.deleteRec(src.toFile)
  }
}
