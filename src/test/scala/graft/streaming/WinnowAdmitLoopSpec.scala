package graft.streaming

import graft.SparkSpec
import graft.operators.WinnowIndex
import org.apache.spark.sql.functions._

/** B117 `winnowIndexAdmitLoop` (library API, spec-gated like B62/B116):
  * a forced-order two-wave replay pins that a later batch surfaces an
  * earlier batch's copies ONLY through admission, and that a mid-loop
  * vacuum changes nothing a probe can observe. */
class WinnowAdmitLoopSpec extends SparkSpec with WaveStaging {

  // Base + Tail together fit inside the 128-sanitized-char winnow
  // slice, and each shared region is long enough (≥ 3 disjoint
  // 15-char runs) that the winnow guarantee puts ≥ MinShared=3 shared
  // fingerprints on every copy pair
  private val Base = "the quick brown fox jumps over the lazy dog " +
    "while astronauts practice today"
  private val Tail = "meanwhile submarines chart unexplored ridges"

  /** Fresh base corpus (ids avoid %7 so dedupCorpus adds nothing) + two
    * staged waves; returns (bid, batch_id, hist_id) triples. */
  private def runLoop(vacuumEvery: Int): Set[(Long, Long, Long)] = {
    import spark.implicits._
    val baseDir = java.nio.file.Files.createTempDirectory("win_loop")
      .toString
    Seq(1L -> Base,
        2L -> "completely different base content with no overlap at all")
      .toDF("doc_id", "text")
      .write.parquet(s"$baseDir/documents.parquet")
    val path = WinnowIndex.ensure(spark, baseDir)
    val srcDir = java.nio.file.Files.createTempDirectory("win_loop_src")
    val t0 = System.currentTimeMillis() - 100000
    // wave 0: doc 10 copies the BASE doc's opening and continues fresh
    writeWave(srcDir, Seq(10L -> s"$Base $Tail").toDF("doc_id", "text"),
      "w0.parquet", t0)
    // wave 1: doc 20 copies the TAIL — matched only via wave 0's
    // admission, never the build-time history
    writeWave(srcDir, Seq(20L -> Tail).toDF("doc_id", "text"),
      "w1.parquet", t0 + 1000)
    StreamOps.winnowIndexAdmitLoop(spark, srcDir.toString, "w*.parquet",
        path, vacuumEvery)
      .collect()
      .map(r => (r.getLong(3), r.getLong(0), r.getLong(1))).toSet
  }

  test("batch 2 surfaces batch 1's copy ONLY through admission; " +
      "batch 1 hits only build-time history") {
    assert(runLoop(vacuumEvery = 0) === Set((0L, 10L, 1L), (1L, 20L, 10L)))
  }

  test("a vacuum after every batch changes nothing a probe observes") {
    assert(runLoop(vacuumEvery = 1) === Set((0L, 10L, 1L), (1L, 20L, 10L)))
  }
}
