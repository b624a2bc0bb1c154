package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B110 `seasonal_detrend`: hand-checked centered-MA decomposition, the
  * edge-null convention, and the exact 7·v = trend + detrended identity
  * on the real corpus. */
class SeasonalDetrendSpec extends SparkSpec {

  private def series(vals: Double*) = {
    import spark.implicits._
    vals.zipWithIndex.map { case (v, i) =>
      ("g", f"2024-01-${i + 1}%02d", v) }
      .toDF("event_type", "ts", "value")
  }

  test("fixture: a pure weekly pattern detrends to itself around a flat " +
      "trend") {
    // period-7 pattern summing to 70 over any full window → trend = 10
    val pat = Seq(3.0, 7.0, 10.0, 13.0, 17.0, 12.0, 8.0)
    val rows = OlapC.seasonalDetrendOn(series(pat ++ pat: _*),
      "event_type", "ts", "value").collect()
    assert(rows.length === 14)
    // first and last 3 days: no full window
    assert(rows.take(3).forall(_.isNullAt(3)))
    assert(rows.takeRight(3).forall(_.isNullAt(3)))
    rows.drop(3).dropRight(3).foreach { r =>
      assert(r.getLong(3) === 70000000L, s"trend_x7 at ${r.getDate(1)}")
      assert(r.getDouble(5) === 10.0)
      // detrended_x7 = 7·v − 70e6 exactly
      assert(r.getLong(4) === 7 * r.getLong(2) - 70000000L)
    }
  }

  test("fixture: a constant series detrends to zero") {
    val rows = OlapC.seasonalDetrendOn(series(Seq.fill(9)(5.0): _*),
      "event_type", "ts", "value").collect()
    rows.filter(!_.isNullAt(3)).foreach { r =>
      assert(r.getLong(4) === 0L)
      assert(r.getDouble(5) === 5.0)
    }
  }

  test("real corpus: one row per (group, day), and the identity " +
      "7·v ≡ trend + detrended holds exactly on every full window") {
    val t = graft.sources.Tables(spark, sfDir)
    val rows = OlapC.seasonalDetrend(spark, sfDir).collect()
    val nDays = t.events
      .groupBy(col("event_type"), to_date(col("ts"))).count().count()
    assert(rows.length.toLong === nDays)
    rows.filter(!_.isNullAt(3)).foreach { r =>
      assert(7 * r.getLong(2) === r.getLong(3) + r.getLong(4))
    }
    assert(rows.exists(!_.isNullAt(3)), "no full window in the corpus?")
  }
}
