package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** B78b `streamScrubRefreshLoop` (r11 next-round #7): a duplicated span
  * BORN INSIDE the stream — both carriers arrive, neither is in the
  * initial census — must be detected once a refresh fires, and must
  * stay invisible under `refreshEvery = 0` (B78's frozen behavior, the
  * contrast that proves the refresh is load-bearing).
  */
class ScrubRefreshSpec extends SparkSpec with WaveStaging {

  private val span = "zig zag zap zoom whirl twirl swirl curl"  // 8 tokens

  private def stage(): (String, DataFrame) = {
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("scrub_refresh_src")
    val t0 = System.currentTimeMillis() - 100000
    // three waves, one doc each, all carrying the SAME 8-token span with
    // distinct filler — the span is new to the stream (init corpus
    // carries none of it)
    writeWave(srcDir, Seq((10L, s"alpha filler $span one two")).toDF("doc_id", "text"),
      "w0.parquet", t0)
    writeWave(srcDir, Seq((11L, s"beta padding $span three four")).toDF("doc_id", "text"),
      "w1.parquet", t0 + 1000)
    writeWave(srcDir, Seq((12L, s"gamma stuffing $span five six")).toDF("doc_id", "text"),
      "w2.parquet", t0 + 2000)
    val init = Seq(
      (1L, "one quiet document about nothing in particular at all here"),
      (2L, "another quiet document about different nothing entirely too"))
      .toDF("doc_id", "text")
    (srcDir.toString, init)
  }

  private def rows(df: DataFrame): Map[Long, (Long, Long)] =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(2), r.getAs[Long]("batch_id")))).toMap

  test("a stream-born dup span is caught at the first arrival AFTER a " +
      "refresh fires; earlier carriers stay frozen-clean") {
    val (src, init) = stage()
    val got = rows(StreamOps.streamScrubRefreshLoop(spark, src,
      "w*.parquet", init, w = 8, refreshEvery = 2))
    // batches 0 and 1 scrub against the INITIAL census (refresh fires
    // only after batch 1 completes): span unseen, nothing removed
    assert(got(10L) === ((0L, 0L)), s"batch 0 must be clean: $got")
    assert(got(11L) === ((0L, 1L)), s"batch 1 must be clean: $got")
    // the refresh after batch 1 sees docs 10+11 sharing the span ->
    // census now carries it -> batch 2's carrier is scrubbed
    val (removed12, bid12) = got(12L)
    assert(bid12 === 2L)
    assert(removed12 >= 8L,
      s"batch-2 carrier must lose the 8-token span, removed=$removed12")
  }

  test("refreshEvery = 0 reproduces B78's frozen census: the stream-born " +
      "span is never caught") {
    val (src, init) = stage()
    val got = rows(StreamOps.streamScrubRefreshLoop(spark, src,
      "w*.parquet", init, w = 8, refreshEvery = 0))
    assert(got.values.forall(_._1 === 0L),
      s"frozen census must never scrub the stream-born span: $got")
  }
}
