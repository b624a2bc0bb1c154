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
    def seed(mb: org.apache.spark.sql.DataFrame) = {
      val d = mb.select(col("doc_id"), col("text"))
      d.unionAll(d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000000L).as("doc_id"), col("text")))
    }
    val partials = StreamOps.drainViaParquetSink(spark2, raw,
      "winnow_wave_spec",
      xform = (mb, _) => TextOps.winnowSitesOn(seed(mb), "doc_id", "text")
        .select(col("doc_id"),
          expr(s"mw div ${TextOps.WinnowChars}").as("h")).distinct())
    val hf = partials.groupBy(col("h")).agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= TextOps.WinnowMaxDf)
    val hs = partials.join(hf.select(col("h")), "h")
    val got = hs.as("a").join(hs.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= TextOps.WinnowMinShared)
      .orderBy(col("doc_a"), col("doc_b"))
      .collect().map(_.toString)
    val batch = TextOps.winnowOverlap(spark, sfDir)
      .collect().map(_.toString)
    assert(got.toSeq === batch.toSeq,
      "wave-split drain must equal the batch overlap board")
  }
}
