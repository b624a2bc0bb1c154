package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B105 `stream_changepoint`: the B98 eviction machine under B101's
  * CUSUM tail — a day split across waves must sum both halves before its
  * window finalizes and leaves state; the drained board must equal the
  * batch key exactly. */
class ChangepointEvictionSpec extends SparkSpec with WaveStaging {

  private def evd(rows: Seq[(Int, Int, String, Double)]) = {
    import spark.implicits._
    rows.toDF("d", "hh", "event_type", "value")
      .select(
        timestamp_seconds(lit(1704067200L) + col("d") * 86400L +
          col("hh") * 3600L).as("ts"),
        col("event_type"), col("value"))
  }

  test("a split day sums across waves, finalized days leave state, and " +
      "the drained CUSUM board equals batch") {
    // g: day 0 = 10.0 + 2.5 (waves 0/1), day 1 = 9.0 (wave 2),
    // day 2 = 20.0 (wave 3); sentinel flushes day 2.
    val w0 = evd(Seq((0, 1, "g", 10.0)))
    val w1 = evd(Seq((0, 5, "g", 2.5)))
    val w2 = evd(Seq((1, 3, "g", 9.0)))
    val w3 = evd(Seq((2, 2, "g", 20.0)))
    val flush = evd(Seq((3650, 0, "_sentinel", 0.0)))
    val srcDir = java.nio.file.Files.createTempDirectory("cusum_evict")
    val t0 = System.currentTimeMillis() - 100000
    Seq(w0, w1, w2, w3, flush).zipWithIndex.foreach { case (w, i) =>
      writeWave(srcDir, w, s"w$i.parquet", t0 + i * 1000) }
    val raw = spark.readStream.schema(w0.schema)
      .option("pathGlobFilter", "w*.parquet")
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)

    var stateRows: Seq[(Long, Long)] = Seq.empty
    val got = StreamOps.changepointStreamOn(spark, raw,
      afterDrain = q => stateRows = q.recentProgress.toSeq
        .filter(_.stateOperators.nonEmpty)
        .map(p => p.batchId -> p.stateOperators.head.numRowsTotal))
      .collect()

    // D over micro dailies (12.5, 9, 20): D1 = −4e6, D2 = −18.5e6 →
    // change after day 1, means 10.75 | 20
    assert(got.length === 1)
    val r = got.head
    assert(r.getString(0) === "g" && r.getLong(1) === 3L)
    assert(r.getDate(2).toString === "2024-01-02")
    assert(r.getString(3) === "-18500000")
    assert(r.getDouble(4) === 10.75 && r.getDouble(5) === 20.0)

    // drain == batch on the same rows
    val batch = graft.operators.OlapC.changepointCusumOn(
      Seq(w0, w1, w2, w3).reduce(_ unionAll _), "event_type", "ts",
      "value").collect()
    assert(got.toSeq.map(_.toString) === batch.toSeq.map(_.toString))

    // bounded state: finalized days leave the store — no batch holds
    // more than the open tail (one real day window + the sentinel's)
    assert(stateRows.nonEmpty)
    val perDay = stateRows.head._2
    assert(perDay > 0)
    assert(stateRows.map(_._2).max <= 2 * perDay,
      s"state must hold only the open tail; $stateRows")
  }
}
