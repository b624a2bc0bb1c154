package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** B94 state eviction (r12 VERDICT #1): a basket settled by the
  * watermark in an EARLY wave must (a) leave the state store — state
  * rows stay bounded by the OPEN tail, never total basket history —
  * and (b) still contribute its pairs to the final board, from the
  * persisted partial-board rollup, waves later. */
class BasketEvictionSpec extends SparkSpec with WaveStaging {

  private def li(rows: Seq[(Long, Long, Int)]) = {
    import spark.implicits._
    rows.toDF("l_orderkey", "l_partkey", "t")
      .select(col("l_orderkey"), col("l_partkey"),
        timestamp_seconds(lit(1704067200L) + col("t") * 3600L).as("ts"))
  }

  test("a wave-0 basket evicts mid-stream once the watermark passes its " +
      "gap, and its pairs still land in the final board via the rollup") {
    // gap = 30 days = 720 h. Waves are hours apart EXCEPT the jump at
    // wave 1, which pushes the watermark past order 10's settle point.
    val w0 = li(Seq((10L, 1L, 1), (10L, 2L, 2)))        // order 10 {1,2}
    val w1 = li(Seq((11L, 1L, 1500), (11L, 2L, 1501)))  // jump: wm -> ~1500h
    val w2 = li(Seq((12L, 1L, 1600), (12L, 3L, 1601)))  // order 10 settles here
    // w3 also carries a beyond-watermark STRAGGLER for settled order 10
    // (item 9 at t=3h << the watermark): it must be DROPPED, not re-open
    // the basket — re-opening would emit order 10 twice and double-count
    // it in every partial board (r13 review finding)
    val w3 = li(Seq((13L, 2L, 1700), (13L, 3L, 1701), (10L, 9L, 3)))
    val flush = li(Seq((-1L, -1L, 24 * 3650)))          // far-future sentinel
    val srcDir = java.nio.file.Files.createTempDirectory("basket_evict")
    val t0 = System.currentTimeMillis() - 100000
    Seq(w0, w1, w2, w3, flush).zipWithIndex.foreach { case (w, i) =>
      writeWave(srcDir, w, s"w$i.parquet", t0 + i * 1000) }
    val raw = spark.readStream.schema(w0.schema)
      .option("pathGlobFilter", "w*.parquet")
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)

    var stateRows: Seq[(Long, Long)] = Seq.empty
    val got = StreamOps.basketPairsStreamOn(spark, raw,
      afterDrain = q => stateRows = q.recentProgress.toSeq
        .filter(_.stateOperators.nonEmpty)
        .map(p => p.batchId -> p.stateOperators.head.numRowsTotal))

    // (b) the final board: 4 baskets, pair (1,2) held by orders 10 and
    // 11 — order 10's half comes from the rollup (it settled in wave 2,
    // three waves before the drain ended)
    val rows = got.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.toSeq === Seq((1L, 2L, 2L, 3L, 3L, 4L)),
      s"expected pair (1,2) x2 over 4 baskets, got ${rows.toSeq}")

    // (a) bounded state: order 10 left the store when it settled, so no
    // batch ever held all 4 baskets, and the sentinel flush drained it
    // to zero
    assert(stateRows.nonEmpty, "no state-operator progress captured")
    // the store reports a fixed number of rows PER KEY (observed 3 —
    // state + timeout bookkeeping); calibrate on batch 0, which holds
    // exactly one open basket, so the bound survives metric internals
    val perBasket = stateRows.head._2
    assert(perBasket > 0, s"batch 0 should hold order 10; $stateRows")
    val peak = stateRows.map(_._2).max
    assert(peak <= 3 * perBasket,
      s"state should hold only the open tail (<= 3 of 4 baskets = " +
        s"${3 * perBasket} rows); progress: $stateRows")
    assert(stateRows.last._2 === 0L,
      s"flush must drain all state; progress: $stateRows")
    // drain == batch on the union of waves MINUS the dropped straggler
    // (the watermark contract: batch parity is promised only for events
    // the watermark admits)
    val admitted = Seq(w0, w1, w2, w3).reduce(_ unionAll _)
      .filter(!(col("l_orderkey") === 10L && col("l_partkey") === 9L))
    val batch = graft.operators.OlapD.basketPairsOn(
      admitted, "l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(r => (r._1, r._2, r._3)).toSeq === batch.toSeq)
  }
}
