package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C104 `score_calibrate` + B96 `forecast_snaive`: hand-checked rank
  * maps and season errors, plus the structural properties each operator
  * exists for (per-source uniformity; calendar-true lags). */
class CalibrateForecastSpec extends SparkSpec {

  test("score_calibrate: per-source ranks map to a uniform [0,1] grid, " +
      "monotone in score, singleton source pinned to 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", "x x x x"), (2L, "a", "the the of of"),
      (3L, "a", "one two three four five six seven"),
      (4L, "b", "solo doc here"),
      (5L, "c", "alpha beta"), (6L, "c", "gamma delta the"))
      .toDF("doc_id", "source", "text")
    val got = TextOps.scoreCalibrateOn(docs, "doc_id", "source", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // source a: 3 docs -> calibrated grid {0, 1/2, 1}; source c: {0, 1}
    assert(got.values.filter(_._1 == "a").map(_._5).toSeq.sorted ===
      Seq(0.0, 0.5, 1.0))
    assert(got.values.filter(_._1 == "c").map(_._5).toSeq.sorted ===
      Seq(0.0, 1.0))
    // singleton source: cal_den 0, calibrated pinned to 0.0
    assert(got(4L)._4 === 0L && got(4L)._5 === 0.0)
    // monotone: within a source, higher raw score => higher calibrated
    got.values.groupBy(_._1).values.foreach { g =>
      val sorted = g.toSeq.sortBy(_._2)
      assert(sorted.map(_._5) === sorted.map(_._5).sorted)
    }
  }

  test("score_calibrate real corpus: every source's calibrated set is " +
      "the exact uniform grid — a global threshold takes the same " +
      "fraction from each source") {
    val rows = TextOps.scoreCalibrate(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (src, g) =>
      val den = g.head._3
      assert(g.forall(_._3 == den))
      assert(g.map(_._2).sorted.toSeq === (0L to den).toSeq,
        s"source $src ranks are not the full grid")
    }
  }

  test("forecast_snaive: hand series — season lag is calendar-true, " +
      "gaps score nothing, errors land in exact micros") {
    import spark.implicits._
    // group g: value 10.5 on days 0..2, value 13.0 on days 7 and 9
    // (day 8 missing). Scored: day 7 (pred from day 0, err 2.5), day 9
    // (pred from day 2, err 2.5). Day 8 has no day-1... it does: day 1
    // exists -> but day 8 itself is MISSING, so nothing to score there.
    val ev = Seq((0, 10.5), (1, 10.5), (2, 10.5), (7, 13.0), (9, 13.0))
      .toDF("dd", "value")
      .select(lit("g").as("event_type"),
        (lit("2024-03-01").cast("date")
          .cast("timestamp") + make_dt_interval(days = col("dd"))).as("ts"),
        col("value"))
    val got = OlapC.forecastSnaiveOn(ev, "event_type", "ts", "value")
      .collect()
    assert(got.length === 1)
    val r = got(0)
    assert(r.getLong(1) === 5L, "n_days")
    assert(r.getLong(2) === 2L, "n_scored: only days 7 and 9 have a D-7")
    assert(r.getLong(3) === 5000000L, "2 x 2.5 in micros")
    assert(r.getDouble(4) === 5000000.0 / 2 / 1000000.0)
  }

  test("forecast_snaive real corpus: every group scores at most its day " +
      "count, errors are non-negative, and mae is the exact quotient") {
    val rows = OlapC.forecastSnaive(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.exists(_.getLong(2) > 0))
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(3) >= 0L)
      if (r.getLong(2) > 0)
        assert(r.getDouble(4) ===
          r.getLong(3).toDouble / r.getLong(2) / 1000000.0)
      else assert(r.isNullAt(4))
    }
  }
}
