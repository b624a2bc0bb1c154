package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B84 state eviction (r13 — fourth instance of the complete-mode
  * class): a day whose window the watermark finalized leaves the state
  * store yet still contributes its sufficient-statistics terms to the
  * final OLS board via the append-mode drain. */
class LinregEvictionSpec extends SparkSpec with WaveStaging {

  private def li(rows: Seq[(String, Int, Int, Double)]) = {
    import spark.implicits._
    rows.toDF("grp", "d", "hh", "v")
      .select(col("grp"),
        timestamp_seconds(lit(1704067200L) + col("d") * 86400L +
          col("hh") * 3600L).as("ts"),
        col("v").cast("decimal(25,6)").as("rev"))
  }

  test("a wave-0 day finalizes mid-stream and still enters the OLS " +
      "sums; split days merge; state stays bounded by the open tail") {
    // group A: revenue on days 0 (split over two waves), 1, and 2 — a
    // clean slope. Rows sit at hour 1 so each wave's watermark (max ts
    // − 1 s) clears the PREVIOUS day's midnight window end: day 0
    // finalizes in wave 2's batch, two batches before the drain ends.
    val w0 = li(Seq(("A", 0, 1, 4.0)))
    val w1 = li(Seq(("A", 0, 2, 2.0), ("A", 1, 1, 8.0)))
    val w2 = li(Seq(("A", 2, 1, 10.0)))
    val flush = li(Seq(("_sentinel", 3650, 0, 0.0)))
    val srcDir = java.nio.file.Files.createTempDirectory("linreg_evict")
    val t0 = System.currentTimeMillis() - 100000
    Seq(w0, w1, w2, flush).zipWithIndex.foreach { case (w, i) =>
      writeWave(srcDir, w, s"w$i.parquet", t0 + i * 1000) }
    val raw = spark.readStream.schema(w0.schema)
      .option("pathGlobFilter", "w*.parquet")
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)

    var stateRows: Seq[(Long, Long)] = Seq.empty
    val got = StreamOps.linregStreamOn(spark, raw,
      afterDrain = q => stateRows = q.recentProgress.toSeq
        .filter(_.stateOperators.nonEmpty)
        .map(p => p.batchId -> p.stateOperators.head.numRowsTotal))
      .collect()

    // drain == batch on the union of waves: days (6, 8, 10) — slope 2
    val batch = graft.operators.OlapD.linregStatsOn(
      Seq(w0, w1, w2).reduce(_ unionAll _)
        .groupBy(col("grp"), to_date(col("ts")).as("d"))
        .agg(sum(col("rev")).as("rev"))
        .select(col("grp"), col("d"),
          floor(col("rev")).cast("decimal(20,0)").as("y")))
      .orderBy(col("grp")).collect()
    assert(got.map(_.toString).toSeq === batch.map(_.toString).toSeq,
      s"stream ${got.toSeq} != batch ${batch.toSeq}")

    // bounded state: with per-wave watermark advances, days retire as
    // later days arrive — the store never holds every day of history
    assert(stateRows.nonEmpty, "no state-operator progress captured")
    val perDay = stateRows.head._2 // batch 0 holds exactly day 0
    assert(perDay > 0, s"batch 0 should hold day 0; $stateRows")
    assert(stateRows.map(_._2).max <= 2 * perDay,
      s"state should hold only the open tail; progress: $stateRows")
    assert(stateRows.last._2 <= perDay,
      s"flush must drain every real day; progress: $stateRows")
  }
}
