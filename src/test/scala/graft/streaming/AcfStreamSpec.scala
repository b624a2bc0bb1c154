package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B106 `stream_acf`: the shared day-window eviction machine under the
  * ACF read tail — a day split across waves sums before finalizing, and
  * the drained board equals batch B102 exactly. (The machine itself —
  * mid-stream finalization, bounded state — is pinned by
  * SnaiveEvictionSpec/ChangepointEvictionSpec on the SAME
  * `dailyRevenueDrain`; this spec pins the third tail.) */
class AcfStreamSpec extends SparkSpec with WaveStaging {

  private def evd(rows: Seq[(Int, Int, String, Double)]) = {
    import spark.implicits._
    rows.toDF("d", "hh", "event_type", "value")
      .select(
        timestamp_seconds(lit(1704067200L) + col("d") * 86400L +
          col("hh") * 3600L).as("ts"),
        col("event_type"), col("value"))
  }

  test("a split day sums across waves and the drained ACF board equals " +
      "batch") {
    // alternating 0/10 over six days — the AcfLagsSpec fixture, split
    // so day 1's total (10) arrives in two waves (4 + 6)
    val w0 = evd(Seq((0, 1, "g", 0.0), (1, 2, "g", 4.0)))
    val w1 = evd(Seq((1, 5, "g", 6.0), (2, 1, "g", 0.0)))
    val w2 = evd(Seq((3, 1, "g", 10.0), (4, 1, "g", 0.0),
      (5, 1, "g", 10.0)))
    val flush = evd(Seq((3650, 0, "_sentinel", 0.0)))
    val srcDir = java.nio.file.Files.createTempDirectory("acf_evict")
    val t0 = System.currentTimeMillis() - 100000
    Seq(w0, w1, w2, flush).zipWithIndex.foreach { case (w, i) =>
      writeWave(srcDir, w, s"w$i.parquet", t0 + i * 1000) }
    val raw = spark.readStream.schema(w0.schema)
      .option("pathGlobFilter", "w*.parquet")
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)

    val got = StreamOps.acfStreamOn(spark, raw).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val batch = graft.operators.OlapC.acfLagsOn(
      Seq(w0, w1, w2).reduce(_ unionAll _), "event_type", "ts", "value")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === batch.toSeq)
    // the alternating fixture's exact rational: acf(1) = −5/6
    assert(got.find(_._2 == 1).get._5 === -5.0 / 6.0)
  }
}
