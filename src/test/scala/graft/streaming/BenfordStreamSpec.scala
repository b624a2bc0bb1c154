package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B109 `stream_benford`: per-batch digit partials split across waves —
  * including one digit's count split mid-wave — merge to the batch
  * board exactly. */
class BenfordStreamSpec extends SparkSpec with WaveStaging {

  test("a digit split across waves sums, and drain == batch") {
    import spark.implicits._
    // digit 1 appears in both waves; non-positive rows excluded
    val w0 = Seq(1.5, 12.0, 250.0, -3.0).toDF("amt")
    val w1 = Seq(190.0, 0.07, 0.0, 930.0).toDF("amt")
    val srcDir = java.nio.file.Files.createTempDirectory("benford_waves")
    val t0 = System.currentTimeMillis() - 100000
    Seq(w0, w1).zipWithIndex.foreach { case (w, i) =>
      writeWave(srcDir, w, s"w$i.parquet", t0 + i * 1000) }
    val raw = spark.readStream.schema(w0.schema)
      .option("pathGlobFilter", "w*.parquet")
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)

    val got = StreamOps.benfordStreamOn(spark, raw, "amt").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    val batch = graft.operators.OlapD.benfordAuditOn(
      w0.unionAll(w1), "amt").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    assert(got.toSeq === batch.toSeq)
    // hand check: digits 1×3 (1.5, 12, 190), 2×1 (250), 7×1 (0.07),
    // 9×1 (930); −3 and 0 excluded
    val byDigit = got.map(t => t._1 -> t._2).toMap
    assert(byDigit(1) === 3L && byDigit(2) === 1L && byDigit(7) === 1L &&
      byDigit(9) === 1L)
    assert(got.head._3 === 6L)
  }
}
