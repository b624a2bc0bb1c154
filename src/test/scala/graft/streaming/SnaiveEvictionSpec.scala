package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B98 state eviction (r13 — the third instance of the complete-mode
  * class, after B94/B95): a day whose window the watermark has
  * finalized must (a) leave the state store — state holds only OPEN
  * days, not all history — and (b) still contribute to the final error
  * board via the append-mode drain, waves later. A day split across
  * waves must still sum both halves (the windowed-agg monoid). */
class SnaiveEvictionSpec extends SparkSpec with WaveStaging {

  private def evd(rows: Seq[(Int, Int, String, Double)]) = {
    import spark.implicits._
    // (day, hour, group, value) on a fixed UTC calendar
    rows.toDF("d", "hh", "event_type", "value")
      .select(
        timestamp_seconds(lit(1704067200L) + col("d") * 86400L +
          col("hh") * 3600L).as("ts"),
        col("event_type"), col("value"))
  }

  test("a wave-0 day finalizes mid-stream, leaves state, and still " +
      "scores in the final board; a split day sums across waves") {
    // group g: day 0 revenue split across waves 0 and 1 (both land
    // before the watermark passes day 0's end); day 7 arrives in wave 2
    // (the season lag partner); the far-future sentinel flushes day 7.
    val w0 = evd(Seq((0, 1, "g", 10.0)))
    val w1 = evd(Seq((0, 5, "g", 2.5)))   // same day, later hour
    val w2 = evd(Seq((7, 3, "g", 9.0)))   // wm jumps past day 0's end
    val flush = evd(Seq((3650, 0, "_sentinel", 0.0)))
    val srcDir = java.nio.file.Files.createTempDirectory("snaive_evict")
    val t0 = System.currentTimeMillis() - 100000
    Seq(w0, w1, w2, flush).zipWithIndex.foreach { case (w, i) =>
      writeWave(srcDir, w, s"w$i.parquet", t0 + i * 1000) }
    val raw = spark.readStream.schema(w0.schema)
      .option("pathGlobFilter", "w*.parquet")
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)

    var stateRows: Seq[(Long, Long)] = Seq.empty
    val got = StreamOps.forecastSnaiveStreamOn(spark, raw,
      afterDrain = q => stateRows = q.recentProgress.toSeq
        .filter(_.stateOperators.nonEmpty)
        .map(p => p.batchId -> p.stateOperators.head.numRowsTotal))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))

    // (b) drain == batch: 2 days, day 7 scored against day 0's SUMMED
    // 12.5 -> abs err |9 - 12.5| = 3.5 = 3_500_000 micro
    assert(got.toSeq === Seq(("g", 2L, 1L, 3500000L)), s"got ${got.toSeq}")
    val batch = graft.operators.OlapC.forecastSnaiveOn(
      Seq(w0, w1, w2).reduce(_ unionAll _), "event_type", "ts", "value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq === batch.toSeq)

    // (a) bounded state: day 0 left the store when it finalized (wave
    // 2's batch), so no batch ever held both real days at once beyond
    // the open tail; the flush drains everything but the sentinel's own
    // never-finalized window
    assert(stateRows.nonEmpty, "no state-operator progress captured")
    val perDay = stateRows.head._2 // batch 0 holds exactly day 0's window
    assert(perDay > 0, s"batch 0 should hold day 0; $stateRows")
    assert(stateRows.map(_._2).max <= 2 * perDay,
      s"state should hold only the open tail; progress: $stateRows")
    assert(stateRows.last._2 <= perDay,
      s"flush must drain every real day; progress: $stateRows")
  }
}
