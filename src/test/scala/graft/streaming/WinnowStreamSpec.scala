package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B115 `stream_winnow`: per-doc fingerprints are batch-local ≡ global
  * (a doc lands whole in one batch), so ANY wave split of the corpus
  * must drain to the batch overlap board. */
class WinnowStreamSpec extends SparkSpec with WaveStaging {

  test("a 2-way wave split of documents drains to the batch board") {
    val docs = graft.sources.Tables(spark, sfDir).documents
    val srcDir = java.nio.file.Files.createTempDirectory("winnow_waves")
    val t0 = System.currentTimeMillis() - 100000
    (0 until 2).foreach { i =>
      writeWave(srcDir, docs.filter(docs("doc_id") % 2 === i),
        s"documents$i.parquet", t0 + i * 1000)
    }
    // the machine reads pathGlobFilter=documents.parquet; feed the waves
    // through the same glob shape by pointing the stream at the temp dir
    val spark2 = StreamOps.streamingSession(spark)
    val raw = spark2.readStream.schema(docs.schema)
      .option("pathGlobFilter", "documents*.parquet")
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
    import graft.operators.TextOps
    val partials = StreamOps.drainViaParquetSink(spark2, raw,
      "winnow_wave_spec",
      xform = (mb, _) => TextOps.winnowHashes(
        TextOps.seededDups(mb.select(col("doc_id"), col("text"))),
        "doc_id", "text"))
    val got = TextOps.winnowOverlapFrom(
      partials.localCheckpoint(eager = true)).collect().map(_.toString)
    val batch = TextOps.winnowOverlap(spark, sfDir)
      .collect().map(_.toString)
    assert(got.toSeq === batch.toSeq,
      "wave-split drain must equal the batch overlap board")
  }
}
