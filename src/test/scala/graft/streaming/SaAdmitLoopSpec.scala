package graft.streaming

import graft.SparkSpec
import graft.operators.SaIndex
import org.apache.spark.sql.functions._

/** B116 `saIndexAdmitLoop` (library API, spec-gated like B62): a
  * forced-order two-wave replay pins that a later batch detects an
  * earlier batch's passage ONLY through admission, and that a mid-loop
  * vacuum changes nothing a probe can observe. */
class SaAdmitLoopSpec extends SparkSpec with WaveStaging {

  private val P1 = (1 to 8).map(i => s"p1t$i").mkString(" ")
  private val P2 = (1 to 8).map(i => s"p2t$i").mkString(" ")

  /** Fresh base corpus (ids avoid %7 so dedupCorpus adds nothing) +
    * two staged waves; returns (indexPath, probe rows). */
  private def runLoop(vacuumEvery: Int): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    val baseDir = java.nio.file.Files.createTempDirectory("sa_loop").toString
    Seq(1L -> P1).toDF("doc_id", "text")
      .write.parquet(s"$baseDir/documents.parquet")
    val path = SaIndex.ensureWindowIndex(spark, baseDir,
      graft.operators.TextOps.SubstrW)
    val srcDir = java.nio.file.Files.createTempDirectory("sa_loop_src")
    val t0 = System.currentTimeMillis() - 100000
    // wave 0: doc 10 carries P1 (in the BASE) followed by P2 (novel)
    writeWave(srcDir, Seq(10L -> s"$P1 $P2").toDF("doc_id", "text"),
      "w0.parquet", t0)
    // wave 1: doc 20 is exactly P2 — a hit is possible ONLY through
    // wave 0's admission
    writeWave(srcDir, Seq(20L -> P2).toDF("doc_id", "text"),
      "w1.parquet", t0 + 1000)
    StreamOps.saIndexAdmitLoop(spark, srcDir.toString, "w*.parquet",
        path, graft.operators.TextOps.SubstrW, vacuumEvery)
      .collect()
      .map(r => (r.getLong(3), r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq // (batch_id, doc_id, n_windows, n_hist_windows)
  }

  test("batch 2 surfaces batch 1's passage ONLY through admission; " +
      "batch 1 hits only build-time history") {
    val rows = runLoop(vacuumEvery = 0)
    // doc 10: 16 tokens → 9 windows; exactly ONE (P1 itself) in the base
    // doc 20: 8 tokens → 1 window; its hit exists only via admission
    assert(rows === Seq((0L, 10L, 9L, 1L), (1L, 20L, 1L, 1L)),
      s"got $rows")
  }

  test("a vacuum after every batch changes nothing a probe observes") {
    val rows = runLoop(vacuumEvery = 1)
    assert(rows === Seq((0L, 10L, 9L, 1L), (1L, 20L, 1L, 1L)),
      s"got $rows")
  }
}
