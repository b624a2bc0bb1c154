package graft.streaming

import graft.SparkSpec
import graft.operators.OlapD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-batch replays for the B94/B95 monoid boards — each staged so
  * the wave boundary falls INSIDE the unit the monoid must carry:
  *
  *  - B94: an ORDER's lines split across waves — pair (i, j) exists only
  *    because the set-union state joined both halves; per-batch pair
  *    counting would never see it.
  *  - B95: a channel TOUCH arrives in a later wave than the purchase it
  *    precedes in event time — the min-timestamp monoid must flip the
  *    flag without retraction.
  */
class MonoidReplaySpec extends SparkSpec with WaveStaging {

  private def staged(waves: Seq[DataFrame]): String = {
    val srcDir = java.nio.file.Files.createTempDirectory("monoid_replay")
    val t0 = System.currentTimeMillis() - 100000
    waves.zipWithIndex.foreach { case (w, i) =>
      writeWave(srcDir, w, s"w$i.parquet", t0 + i * 1000) }
    srcDir.toString
  }

  private def streamFrom(src: String, schema: org.apache.spark.sql.types
      .StructType): DataFrame =
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "w*.parquet")
      .option("maxFilesPerTrigger", 1).parquet(src)

  test("B94: an order split across two waves still yields its cross-wave " +
      "pair — set-union state, not per-batch pair counts") {
    import spark.implicits._
    def li(rows: Seq[(Long, Long, Int)]) =
      rows.toDF("l_orderkey", "l_partkey", "t")
        .select(col("l_orderkey"), col("l_partkey"),
          timestamp_seconds(lit(1704067200L) + col("t") * 3600).as("ts"))
    // order 10 = {1, 2} but item 1 lands in wave 0 and item 2 in wave 1;
    // order 11 = {1, 2} whole in wave 0 (makes the pair pass the >= 2 cut)
    val w0 = li(Seq((10L, 1L, 1), (11L, 1L, 1), (11L, 2L, 2)))
    val w1 = li(Seq((10L, 2L, 3)))
    // final wave = the far-future sentinel (bk < 0) that settles the tail
    val flush = li(Seq((-1L, -1L, 24 * 3650)))
    val src = staged(Seq(w0, w1, flush))
    val got = StreamOps.basketPairsStreamOn(spark,
        streamFrom(src, w0.schema)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map((1L, 2L) -> 2L),
      s"pair (1,2) must count BOTH baskets incl. the split one: $got")
    // drain == batch on the union of waves
    val batch = OlapD.basketPairsOn(w0.unionAll(w1), "l_orderkey",
      "l_partkey").collect().map(r => (r.getLong(0), r.getLong(1)) ->
      r.getLong(2)).toMap
    assert(got === batch)
  }

  test("B95: a touch delivered AFTER its user's purchase was processed " +
      "still flips the flag — min monoid, no retraction") {
    import spark.implicits._
    def evd(rows: Seq[(Long, Int, String)]) =
      rows.toDF("user_id", "t", "event_type")
        .select(col("user_id"),
          timestamp_seconds(lit(1704067200L) + col("t") * 3600).as("ts"),
          col("event_type"))
    // wave 0 carries user 1's PURCHASE (t=5); wave 1 delivers the CLICK
    // that happened earlier (t=2) — event time precedes, arrival follows.
    // The click arrives while the watermark (max wave-0 ts − 1 s) still
    // trails u1's conversion, so the flag flips BEFORE u1 settles; the
    // final sentinel wave (user_id < 0) then settles everyone.
    val w0 = evd(Seq((1L, 5, "purchase"), (2L, 1, "view"),
      (2L, 3, "purchase")))
    val w1 = evd(Seq((1L, 2, "click")))
    val flush = evd(Seq((-1L, 24 * 3650, "_sentinel")))
    val src = staged(Seq(w0, w1, flush))
    val got = StreamOps.shapleyStreamOn(spark,
        streamFrom(src, w0.schema)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // two converted users: u1 touched {click}, u2 touched {view} ->
    // v(C)-v(∅) = 2, each channel a symmetric single carrier: φ·6 = 6
    assert(got === Map("click" -> 6L, "signup" -> 0L, "view" -> 6L),
      s"late-arriving click must still earn credit: $got")
    val batch = OlapD.attributionShapleyOn(w0.unionAll(w1), "user_id",
      "ts", "event_type", "purchase").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === batch)
  }
}
