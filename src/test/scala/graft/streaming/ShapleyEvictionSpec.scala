package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B95 state eviction (r13 — the next instance of the complete-mode
  * class B94's fix closed): a CONVERTED user whose first purchase the
  * watermark has passed must (a) leave the state store — their flags
  * are frozen, state stays bounded by the open tail — and (b) still
  * contribute their signature to the final lattice via the persisted
  * count rollup, waves later. Unconverted users stay in state (the
  * documented open tail) and contribute nothing, exactly like batch. */
class ShapleyEvictionSpec extends SparkSpec with WaveStaging {

  private def evd(rows: Seq[(Long, Int, String)]) = {
    import spark.implicits._
    rows.toDF("user_id", "t", "event_type")
      .select(col("user_id"),
        timestamp_seconds(lit(1704067200L) + col("t") * 3600L).as("ts"),
        col("event_type"))
  }

  test("a wave-0 conversion settles mid-stream once the watermark passes " +
      "its purchase, and still credits its channels from the rollup") {
    // u1 converts early (view t1 -> purchase t2); wave 1 jumps event
    // time far past t2, so u1 settles in wave 2's batch. u2 converts
    // late (wave 2), u3 never converts (stays in state, contributes 0).
    val w0 = evd(Seq((1L, 1, "view"), (1L, 2, "purchase")))
    val w1 = evd(Seq((3L, 1500, "click")))             // wm jump; u3 open
    val w2 = evd(Seq((2L, 1600, "click"), (2L, 1601, "purchase")))
    // w3: a beyond-watermark STRAGGLER purchase for u1, who settled in
    // wave 2's batch — it must be DROPPED, not re-create state (a
    // re-settle would double-count u1's signature; a lone late purchase
    // would even emit all-zero flags — r13 review finding)
    val w3 = evd(Seq((1L, 5, "purchase")))
    val flush = evd(Seq((-1L, 24 * 3650, "_sentinel")))
    val srcDir = java.nio.file.Files.createTempDirectory("shap_evict")
    val t0 = System.currentTimeMillis() - 100000
    Seq(w0, w1, w2, w3, flush).zipWithIndex.foreach { case (w, i) =>
      writeWave(srcDir, w, s"w$i.parquet", t0 + i * 1000) }
    val raw = spark.readStream.schema(w0.schema)
      .option("pathGlobFilter", "w*.parquet")
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)

    var stateRows: Seq[(Long, Long)] = Seq.empty
    val got = StreamOps.shapleyStreamOn(spark, raw,
      afterDrain = q => stateRows = q.recentProgress.toSeq
        .filter(_.stateOperators.nonEmpty)
        .map(p => p.batchId -> p.stateOperators.head.numRowsTotal))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // (b) the lattice: two conversions — u1 touched {view}, u2 touched
    // {click}; symmetric single carriers each earn phi*6 = 6. u1's
    // credit can only have come from the rollup: it settled two waves
    // before the drain ended.
    assert(got === Map("click" -> 6L, "signup" -> 0L, "view" -> 6L),
      s"expected rollup-sourced credits, got $got")

    // (a) bounded state: u1 left when it settled; u3 (unconverted) is
    // the open tail and stays through the flush
    assert(stateRows.nonEmpty, "no state-operator progress captured")
    val perUser = stateRows.head._2 // batch 0 holds exactly u1
    assert(perUser > 0, s"batch 0 should hold u1; $stateRows")
    // never all three users at once: u1 is out before u2 enters
    assert(stateRows.map(_._2).max <= 2 * perUser,
      s"state should hold <= 2 users at any batch; progress: $stateRows")
    // the flush drains every CONVERTED user; only u3's open-tail row
    // remains
    assert(stateRows.last._2 === perUser,
      s"only the unconverted open tail may remain; progress: $stateRows")
  }
}
