package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B100 `stream_ann_lsh_stats`: the live occupancy board's per-batch
  * (table, bucket) count partials must SUM across micro-batches — a
  * bucket whose members split over two waves is one bucket with the
  * merged size, never two — and the drained board equals batch C107. */
class LshStatsReplaySpec extends SparkSpec with WaveStaging {

  test("bucket counts split across waves merge; drain == batch C107") {
    import graft.operators.VectorOps
    val corpus = VectorOps.emb(spark, sfDir)
      .limit(60).localCheckpoint(eager = true)
    // split the corpus mid-bucket: odd/even vec_ids land in the same
    // LSH buckets regardless of wave
    val w0 = corpus.filter(col("vec_id") % 2 === 0)
    val w1 = corpus.filter(col("vec_id") % 2 === 1)
    val srcDir = java.nio.file.Files.createTempDirectory("lshstats_replay")
    val t0 = System.currentTimeMillis() - 100000
    Seq(w0, w1).zipWithIndex.foreach { case (w, i) =>
      writeWave(srcDir, w, s"w$i.parquet", t0 + i * 1000) }
    val raw = spark.readStream.schema(w0.schema)
      .option("pathGlobFilter", "w*.parquet")
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
    val got = StreamOps.annLshStatsStreamOn(spark, raw).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // batch board over the union, via the same rollup the key uses
    val b = corpus.select(explode(graft.functions.vectors.lsh_sign_buckets(
        col("emb"), VectorOps.AnnTables, VectorOps.AnnBits,
        VectorOps.Dim)).as("bkt"))
      .groupBy(shiftright(col("bkt"), 24).as("tbl"), col("bkt"))
      .agg(count(lit(1)).as("sz"))
      .groupBy(col("tbl"))
      .agg(count(lit(1)).as("n_buckets"), sum(col("sz")).as("n_vectors"),
        max(col("sz")).as("max_bucket"),
        sum(col("sz") * col("sz")).as("sum_sq"))
      .orderBy(col("tbl")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === b.toSeq,
      s"wave-split buckets did not merge: ${got.toSeq} vs ${b.toSeq}")
    // the split is real: each wave alone holds fewer vectors per table
    assert(got.forall(_._2 >= 1) && got.head._3 === 60L)
  }
}
