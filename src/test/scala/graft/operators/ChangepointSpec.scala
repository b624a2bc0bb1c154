package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B101 `changepoint_cusum`: hand-checked CUSUM split on a fixture with a
  * known level shift, the earliest-day tie-break, and invariants on the
  * real corpus. */
class ChangepointSpec extends SparkSpec {

  test("fixture: a clean level shift lands the argmax on the boundary " +
      "with exact micro d_stat and the two segment means") {
    import spark.implicits._
    // 10,10,10 | 40,40,40 — D_t = n·P_t − t·S peaks (in |·|) at t=3
    val ev = (1 to 6).map(i =>
      ("a", s"2024-01-0$i", if (i <= 3) 10.0 else 40.0))
      .toDF("event_type", "ts", "value")
    val r = OlapC.changepointCusumOn(ev, "event_type", "ts", "value")
      .collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getLong(1) === 6L)
    assert(row.getDate(2).toString === "2024-01-03")
    // D_3 = 6·30 − 3·150 = −270 units = −270e6 micro (canonical digit
    // string — the driver-hashable spelling of the signed exact value)
    assert(row.getString(3) === "-270000000")
    assert(row.getDouble(4) === 10.0 && row.getDouble(5) === 40.0)
  }

  test("fixture: |D| ties break to the earliest day") {
    import spark.implicits._
    // 10,20,20,10: D = −20, 0, +20 → |D| ties at t=1 and t=3 → day 1
    val ev = Seq(("a", "2024-01-01", 10.0), ("a", "2024-01-02", 20.0),
      ("a", "2024-01-03", 20.0), ("a", "2024-01-04", 10.0))
      .toDF("event_type", "ts", "value")
    val row = OlapC.changepointCusumOn(ev, "event_type", "ts", "value")
      .collect().head
    assert(row.getDate(2).toString === "2024-01-01")
    assert(row.getString(3) === "-20000000")
  }

  test("real corpus: one row per series, change_day strictly inside the " +
      "series, and d_stat replays from the daily rollup") {
    val t = graft.sources.Tables(spark, sfDir)
    val rows = OlapC.changepointCusum(spark, sfDir).collect()
    val nGroups = t.events.select("event_type").distinct().count()
    assert(rows.length.toLong === nGroups)
    // independent replay of one group's D sweep in plain Scala
    val g = rows.head.getString(0)
    val daily = t.events.filter(col("event_type") === g)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(col("value").cast("decimal(25,6)")).as("v"))
      .orderBy(col("d")).collect()
      .map(r => (r.getDate(0).toString,
        r.getDecimal(1).multiply(new java.math.BigDecimal(1000000))
          .longValueExact()))
    val n = daily.length
    val s = daily.map(_._2).sum
    val sweep = daily.scanLeft(0L)(_ + _._2).drop(1).zipWithIndex
      .take(n - 1)
      .map { case (p, i) =>
        (daily(i)._1, BigInt(n) * BigInt(p) - BigInt(i + 1) * BigInt(s)) }
    val best = sweep.minBy { case (d, dv) => (-dv.abs, d) }
    assert(rows.head.getDate(2).toString === best._1)
    assert(BigInt(rows.head.getString(3)) === best._2)
  }
}
