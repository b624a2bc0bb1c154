package graft.streaming

import graft.SparkSpec
import graft.operators.{GraphAnnIndex, VectorOps}
import org.apache.spark.sql.functions._

/** B125 `graphIndexAdmitLoop` (library API, spec-gated like
  * B62/B116/B117): a forced-order two-wave replay pins that a later
  * vector batch finds an earlier batch's vectors ONLY through
  * admission, and that a mid-loop vacuum changes nothing a probe can
  * observe. */
class GraphAdmitLoopSpec extends SparkSpec with WaveStaging {

  /** Fresh base graph + two staged waves; wave 0 = twins of base
    * vectors, wave 1 = twins of WAVE 0's vectors (2e6 ids) — findable
    * only via wave 0's admission. Returns (bid, query_id, rank-1
    * neighbor) triples. */
  private def runLoop(vacuumEvery: Int): Set[(Long, Long, Long)] = {
    val dir = java.nio.file.Files.createTempDirectory("gann_loop")
      .toString
    val base = VectorOps.emb(spark, sfDir).filter(col("vec_id") < 200)
      .localCheckpoint(eager = true)
    base.select(col("vec_id"),
        col("emb").cast("array<float>").as("embedding"))
      .write.parquet(s"$dir/embeddings.parquet")
    val path = GraphAnnIndex.ensure(spark, dir)
    def perturb(df: org.apache.spark.sql.DataFrame, shift: Long) =
      df.select((col("vec_id") + shift).as("vec_id"),
        transform(col("emb"),
          x => x + lit(0.01) * x * x).cast("array<float>").as("embedding"))
    val srcDir = java.nio.file.Files.createTempDirectory("gann_loop_src")
    val t0 = System.currentTimeMillis() - 100000
    val wave0 = perturb(base.filter(col("vec_id") % 20 === 0), 1000000L)
    writeWave(srcDir, wave0, "w0.parquet", t0)
    // wave 1 twins wave 0 (ids 2e6+): its nearest stored neighbor is
    // wave 0's vector, which is in the index ONLY if wave 0 admitted
    val wave1 = perturb(
      wave0.select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb")), 1000000L)
    writeWave(srcDir, wave1, "w1.parquet", t0 + 1000)
    StreamOps.graphIndexAdmitLoop(spark, srcDir.toString, "w*.parquet",
        path, k = 1, vacuumEvery = vacuumEvery)
      .collect()
      .map(r => (r.getLong(4), r.getLong(0), r.getLong(1))).toSet
  }

  private def expected: Set[(Long, Long, Long)] = {
    val ids = VectorOps.emb(spark, sfDir).filter(col("vec_id") < 200)
      .filter(col("vec_id") % 20 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    ids.map(i => (0L, i + 1000000L, i)) ++
      ids.map(i => (1L, i + 2000000L, i + 1000000L))
  }

  test("batch 2 finds batch 1's vectors ONLY through admission; " +
      "batch 1 hits only build-time history") {
    assert(runLoop(vacuumEvery = 0) === expected)
  }

  test("a vacuum after every batch changes nothing a probe observes") {
    assert(runLoop(vacuumEvery = 1) === expected)
  }
}
