package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B134 `ccf_leadlag` / B135 `stream_ccf`: a known 2-day shift peaks at
  * lag +2 with ccf exactly 1; the mirror law ccf(a,b,k) == ccf(b,a,−k)
  * holds exactly (same sums); calendar gaps align by DATE, not row
  * offset; and the stream drain (a day split across waves) equals
  * batch. */
class CcfSpec extends SparkSpec with graft.streaming.WaveStaging {

  import spark.implicits._

  private def evd(rows: Seq[(Int, String, Double)]) =
    rows.toDF("d", "event_type", "value")
      .select(timestamp_seconds(lit(1704067200L) + col("d") * 86400L)
        .as("ts"), col("event_type"), col("value"))

  test("a series shifted by +2 days peaks at lag +2 with ccf == 1; " +
      "mirror law exact") {
    // a over days 0..9 with a non-constant pattern; b(d) = a(d-2)
    val a = (0 until 10).map(d => (d, "a", (d % 4 + 1) * 10.0))
    val b = (2 until 12).map(d => (d, "b", ((d - 2) % 4 + 1) * 10.0))
    val res = OlapC.ccfLeadLagOn(evd(a ++ b), "event_type", "ts", "value")
      .collect()
      .map(r => ((r.getString(0), r.getString(1), r.getInt(2)),
        (r.getLong(3), Option(r.get(4)).map(_ => r.getDouble(4)))))
      .toMap
    // b(d+k) = a(d+k-2): perfect alignment at k = 2 from the a side
    assert(res(("a", "b", 2))._2.get === 1.0,
      s"expected unit peak at +2: ${res(("a", "b", 2))}")
    assert(res(("b", "a", -2))._2.get === 1.0)
    // mirror law: identical sums, bit-identical value at mirrored lag
    res.foreach { case ((ta, tb, k), (n, v)) =>
      assert(res(((tb, ta, -k)))._1 === n)
      assert(res(((tb, ta, -k)))._2 === v, s"mirror broke at $ta,$tb,$k")
    }
    // misaligned lags on a 4-periodic pattern are strictly below 1
    assert(res(("a", "b", 0))._2.forall(_ < 1.0))
  }

  test("calendar gaps align by date: a missing day drops pairs instead " +
      "of shifting rows") {
    // b = a shifted by 1, but day 5 is missing from a — row-offset
    // alignment would smear; date alignment just loses pairs at the gap
    val a = Seq(0, 1, 2, 3, 4, 6, 7).map(d => (d, "a", (d % 3 + 1) * 5.0))
    val b = (1 to 8).map(d => (d, "b", ((d - 1) % 3 + 1) * 5.0))
    val res = OlapC.ccfLeadLagOn(evd(a ++ b), "event_type", "ts", "value")
      .filter(col("type_a") === "a" && col("lag") === 1)
      .head()
    assert(res.getLong(3) === 7L, "all 7 present a-days pair at +1")
    assert(res.getDouble(4) === 1.0)
  }

  test("stream drain == batch on a day split across waves") {
    val w0 = evd(Seq((0, "a", 10.0), (1, "a", 20.0), (0, "b", 5.0)))
      .unionAll(evd(Seq((1, "a", 15.0))))  // day 1 continues in wave 0
    val w1 = evd(Seq((2, "a", 30.0), (1, "b", 10.0), (2, "b", 20.0),
      (3, "a", 10.0), (3, "b", 30.0)))
    val flush = evd(Seq((3650, "_sentinel", 0.0)))
    val srcDir = java.nio.file.Files.createTempDirectory("ccf_evict")
    val t0 = System.currentTimeMillis() - 100000
    Seq(w0, w1, flush).zipWithIndex.foreach { case (w, i) =>
      writeWave(srcDir, w, s"w$i.parquet", t0 + i * 1000) }
    val raw = spark.readStream.schema(w0.schema)
      .option("pathGlobFilter", "w*.parquet")
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
    val got = graft.streaming.StreamOps.ccfStreamOn(spark, raw)
      .collect().map(_.toString)
    val batch = OlapC.ccfLeadLagOn(Seq(w0, w1).reduce(_ unionAll _),
      "event_type", "ts", "value").collect().map(_.toString)
    assert(got.toSeq === batch.toSeq)
  }
}
