package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B132 `ab_ttest` / B133 `stream_ab_ttest`: an independent Scala Welch
  * replay on the real corpus, the sum-monoid merge law, the n>1 /
  * zero-variance drop rules, and stream-drain parity under a
  * within-group wave split. */
class AbTtestSpec extends SparkSpec with graft.streaming.WaveStaging {

  import spark.implicits._

  test("independent Scala Welch replay agrees on the real corpus") {
    val rows = graft.sources.Tables(spark, sfDir).events
      .select(col("event_type"), (col("user_id") % 2).cast("int"),
        col("value"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    val got = OlapD.abTtest(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(5), r.getDouble(6)))).toMap
    rows.groupBy(_._1).foreach { case (tpe, g) =>
      def stats(arm: Int) = {
        val ms = g.filter(_._2 == arm)
          .map(t => math.floor(t._3 * 1000 + 0.5).toLong)
        val n = ms.length.toLong
        val s = ms.sum
        val q = ms.map(m => m * m).sum
        (n, s, q)
      }
      val ((na, sa, qa), (nb, sb, qb)) = (stats(0), stats(1))
      if (na > 1 && nb > 1) {
        def mv(n: Long, s: Long, q: Long) = {
          val mean = s.toDouble / n.toDouble / 1000.0
          val v = (q.toDouble - s.toDouble * s.toDouble / n.toDouble) /
            (n.toDouble - 1.0) / 1000000.0
          (mean, v / n.toDouble)
        }
        val ((ma, sea), (mb2, seb)) = (mv(na, sa, qa), mv(nb, sb, qb))
        if (sea + seb > 0) {
          val t = (ma - mb2) / math.sqrt(sea + seb)
          val df = (sea + seb) * (sea + seb) /
            (sea * sea / (na - 1.0) + seb * seb / (nb - 1.0))
          val (gna, gnb, gt, gdf) = got(tpe)
          assert(gna === na && gnb === nb)
          assert(math.abs(gt - t) < 1e-9, s"$tpe t: $gt vs $t")
          assert(math.abs(gdf - df) < 1e-6, s"$tpe df: $gdf vs $df")
        }
      }
    }
  }

  test("drop rules: n<=1 arms and zero pooled variance never reach the " +
      "board") {
    // type 'tiny' has one row in arm 1; type 'flat' has zero variance
    val ev = Seq(
      ("tiny", 0L, 1.0), ("tiny", 2L, 2.0), ("tiny", 1L, 3.0),
      ("flat", 0L, 5.0), ("flat", 2L, 5.0), ("flat", 1L, 5.0),
      ("flat", 3L, 5.0))
      .toDF("event_type", "user_id", "value")
    val got = OlapD.abTtestBoardOn(OlapD.abTtestPartialsOn(ev))
    assert(got.count() === 0)
  }

  test("sum-monoid merge: partials from a 3-way split merge to the " +
      "direct board; stream drain == batch") {
    val ev = graft.sources.Tables(spark, sfDir).events
    val parts = (0 until 3).map(i =>
      OlapD.abTtestPartialsOn(ev.filter(col("event_id") % 3 === i)))
    val merged = OlapD.abTtestBoardOn(parts.reduce(_ unionAll _))
      .collect().map(_.toString)
    val direct = OlapD.abTtest(spark, sfDir).collect().map(_.toString)
    assert(merged.toSeq === direct.toSeq)
    // stream drain over the same 3-way wave split
    val d = java.nio.file.Files.createTempDirectory("ttest_waves")
    val t0 = System.currentTimeMillis() - 100000
    (0 until 3).foreach { i =>
      writeWave(d, ev.filter(col("event_id") % 3 === i),
        s"w$i.parquet", t0 + i * 1000)
    }
    val schema = spark.read.option("pathGlobFilter", "w*.parquet")
      .parquet(d.toString).schema
    val src = spark.readStream.schema(schema)
      .option("pathGlobFilter", "w*.parquet")
      .option("maxFilesPerTrigger", 1).parquet(d.toString)
    val got = OlapD.abTtestBoardOn(
      graft.streaming.StreamOps.drainViaParquetSink(spark, src,
        "spec_ab_ttest_drain",
        xform = (mb, _) => OlapD.abTtestPartialsOn(mb)))
      .collect().map(_.toString)
    assert(got.toSeq === direct.toSeq)
  }
}
