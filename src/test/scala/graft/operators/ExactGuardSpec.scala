package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The shared overflow guard (r13 verdict #5 — one definition replacing
  * the per-operator copies): loud on genuine overflow, NULL-passthrough
  * on NULL input (r13 ADVICE — an all-NULL group's SUM is NULL in both
  * engines, not an overflow). */
class ExactGuardSpec extends SparkSpec {

  test("genuine overflow raises with the uniform message") {
    import spark.implicits._
    val wide = Seq("12345678901234567890").toDF("s")
      .select(col("s").cast("decimal(25,0)").as("v"))
    val ex = intercept[Exception] {
      wide.select(Exact.guardedLong("some_op")(col("v"), "the sum"))
        .collect()
    }
    assert(ex.getMessage.contains(
      "some_op: the sum overflowed BIGINT — re-scale the unit"))
  }

  test("NULL input passes through as NULL, never firing the guard") {
    import spark.implicits._
    val nulls = Seq("x").toDF("s")
      .select(lit(null).cast("decimal(25,0)").as("v"))
    val r = nulls.select(
      Exact.guardedLong("some_op")(col("v"), "a").as("l"),
      Exact.guardedMicro("some_op")(col("v") * 1000000, "b").as("m"))
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("changepoint: an all-NULL series does not fire the overflow " +
      "guard spuriously (the r13 ADVICE cross-engine fork)") {
    import spark.implicits._
    val ev = Seq(
      ("dead", "2024-01-01", Option.empty[java.lang.Double]),
      ("dead", "2024-01-02", Some(Double.box(5.0))),
      ("live", "2024-01-01", Some(Double.box(10.0))),
      ("live", "2024-01-02", Some(Double.box(40.0))))
      .toDF("event_type", "ts", "value")
    val rows = OlapC.changepointCusumOn(ev, "event_type", "ts", "value")
      .collect().map(r => r.getString(0) -> r).toMap
    // the NULL day flows through as the engines' shared SUM-of-NULL
    // semantics: d_stat at t=1 is NULL (prefix sum over only-NULL), not
    // a raised "overflow"
    assert(rows("dead").isNullAt(3))
    // and a clean series on the same frame is untouched
    // D_1 = n·P_1 − 1·S = 2·10e6 − 50e6 in micro-units
    assert(rows("live").getString(3) === "-30000000")
  }
}
