package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B102 `acf_lags`: exact rationals on a hand series, the constant-series
  * null guard, and estimator invariants on the real corpus. */
class AcfLagsSpec extends SparkSpec {

  test("fixture: alternating series — acf(1) = −5/6, acf(2) = 2/3, " +
      "pair counts n−k, sxy exact") {
    import spark.implicits._
    // 0,10,0,10,0,10 over six consecutive days
    val ev = (1 to 6).map(i =>
      ("a", s"2024-01-0$i", if (i % 2 == 0) 10.0 else 0.0))
      .toDF("event_type", "ts", "value")
    val rows = OlapC.acfLagsOn(ev, "event_type", "ts", "value", maxLag = 3)
      .collect().map(r => r.getInt(1) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rows(1)._1 === 5L && rows(2)._1 === 4L && rows(3)._1 === 3L)
    assert(rows(1)._2 === 0L)    // x·y alternates against a zero
    assert(rows(2)._2 === 200L)  // (10·10)×2
    assert(rows(1)._3 === -5.0 / 6.0)
    assert(rows(2)._3 === 2.0 / 3.0)
  }

  test("fixture: a constant series nulls acf instead of dividing by zero") {
    import spark.implicits._
    val ev = (1 to 5).map(i => ("a", s"2024-01-0$i", 7.0))
      .toDF("event_type", "ts", "value")
    val rows = OlapC.acfLagsOn(ev, "event_type", "ts", "value", maxLag = 2)
      .collect()
    assert(rows.length === 2)
    assert(rows.forall(_.isNullAt(4)), "den = nΣx²−S² = 0 must null acf")
  }

  test("real corpus: per group, n_pairs = n_days − lag and |acf| bounded") {
    val t = graft.sources.Tables(spark, sfDir)
    val nDays = t.events
      .groupBy(col("event_type"), to_date(col("ts"))).count()
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = OlapC.acfLags(spark, sfDir).collect()
    assert(rows.length === nDays.size * OlapC.AcfMaxLag)
    rows.foreach { r =>
      val (g, k, np) = (r.getString(0), r.getInt(1), r.getLong(2))
      assert(np === nDays(g) - k, s"$g lag $k")
      // the common-denominator estimator is not hard-bounded by 1 but
      // stays near it on any real series
      assert(math.abs(r.getDouble(4)) <= 1.5, s"$g lag $k: ${r.getDouble(4)}")
    }
  }
}
