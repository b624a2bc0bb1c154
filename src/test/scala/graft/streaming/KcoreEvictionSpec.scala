package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B113 `stream_kcore`: the settled-order partials merge to the batch
  * support multiset — including an order SPLIT across micro-batches
  * (the set-union monoid case) — the peel at read equals batch B104,
  * and settled orders leave the state store. */
class KcoreEvictionSpec extends SparkSpec with WaveStaging {

  private def li(rows: Seq[(Long, Long, Int)]) = {
    import spark.implicits._
    rows.toDF("l_orderkey", "l_partkey", "t")
      .select(col("l_orderkey"), col("l_partkey"),
        timestamp_seconds(lit(1704067200L) + col("t") * 3600L).as("ts"))
  }

  test("drain == batch peel on a K4-with-pendant graph; a split order " +
      "merges via state; settled orders evict") {
    // Orders 10 and 11 both hold {1,2,3,4} → every K4 edge reaches
    // support 2; order 11 SPLITS across waves 1 and 2 (items 1,2 then
    // 3,4 — the pair (1,3) exists only if the halves merged in state).
    // Order 12 holds {1,5}: support-1 edge, cut before the peel.
    val w0 = li(Seq((10L, 1L, 1), (10L, 2L, 2), (10L, 3L, 3), (10L, 4L, 4)))
    val w1 = li(Seq((11L, 1L, 1500), (11L, 2L, 1501))) // jump: order 10 settles
    val w2 = li(Seq((11L, 3L, 1502), (11L, 4L, 1503), (12L, 1L, 1600),
      (12L, 5L, 1601)))
    val flush = li(Seq((-1L, -1L, 24 * 3650)))
    val srcDir = java.nio.file.Files.createTempDirectory("kcore_evict")
    val t0 = System.currentTimeMillis() - 100000
    Seq(w0, w1, w2, flush).zipWithIndex.foreach { case (w, i) =>
      writeWave(srcDir, w, s"w$i.parquet", t0 + i * 1000) }
    val raw = spark.readStream.schema(w0.schema)
      .option("pathGlobFilter", "w*.parquet")
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)

    var stateRows: Seq[(Long, Long)] = Seq.empty
    val got = StreamOps.kcoreStreamOn(spark, raw,
      afterDrain = q => stateRows = q.recentProgress.toSeq
        .filter(_.stateOperators.nonEmpty)
        .map(p => p.batchId -> p.stateOperators.head.numRowsTotal))
      .collect().map(r => r.getLong(0) -> r.getLong(1))

    // the K4 survives at core_deg 3; items 5 (support-1 edge) and the
    // pendant structure are gone
    assert(got.toSeq === Seq(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))

    // drain == batch on the union of waves (the shared-oracle promise)
    val union = Seq(w0, w1, w2).reduce(_ unionAll _)
    val batch = graft.operators.OlapC.kcorePartsOn(
      graft.operators.OlapC.kcoreEdgesOn(union, "l_orderkey", "l_partkey",
        graft.operators.OlapC.KcoreSupport),
      graft.operators.OlapC.KcoreK,
      graft.operators.OlapC.KcorePeelRounds)
      .orderBy(col("node"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.toSeq === batch.toSeq)

    // bounded state: order 10 left the store at its settle point; the
    // flush drains everything
    assert(stateRows.nonEmpty, "no state-operator progress captured")
    assert(stateRows.last._2 === 0L,
      s"flush must drain all state; progress: $stateRows")
  }
}
