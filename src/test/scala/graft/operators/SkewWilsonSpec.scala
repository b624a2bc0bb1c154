package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B111 `skew_audit` + B112 `rate_wilson`: independent replays of the
  * census arithmetic, the salt-policy flag on the deliberately hot key,
  * and hand-checked Wilson bounds. */
class SkewWilsonSpec extends SparkSpec {

  test("skew_audit: per-candidate counts replay, the tiny-alphabet key " +
      "flags for salting and the near-uniform FK does not") {
    val t = graft.sources.Tables(spark, sfDir)
    val rows = OlapD.skewAudit(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(6),
          r.getInt(7), r.getInt(8)))).toMap
    assert(rows.keySet === OlapD.SkewCandidates.toSet)
    // independent replay of one candidate
    val ev = t.events.groupBy(col("event_type")).count()
      .collect().map(_.getLong(1))
    val (nR, nK, mx, ratio, _, lowCard) = rows(("events", "event_type"))
    assert(nR === ev.sum && nK === ev.length.toLong && mx === ev.max)
    assert(ratio === mx.toDouble * nK.toDouble / nR.toDouble)
    // the two FAILURE MODES are orthogonal: event_type's 5 near-uniform
    // groups have ratio ≈ 1 (no salt) but cap a shuffle at 5 tasks
    // (low_cardinality flags); the FK keys have thousands of keys
    assert(lowCard === 1)
    assert(rows(("lineitem", "l_orderkey"))._6 === 0)
    assert(rows.values.forall(_._4 >= 1.0))
    // policy columns are pure functions of the measured numbers
    rows.values.foreach { case (_, k, _, r, f, lc) =>
      assert(f === (if (r > OlapD.SkewSaltRatio) 1 else 0))
      assert(lc === (if (k < OlapD.SkewMinKeys) 1 else 0))
    }
  }

  test("rate_wilson: bounds replay the Wilson formula exactly, bracket " +
      "the rate, and stay inside [0, 1]") {
    val rows = OlapD.rateWilson(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val z = OlapD.WilsonZ
    rows.foreach { case (nation, n, k, rate, lo, hi) =>
      assert(k <= n, nation)
      val nD = n.toDouble; val p = k.toDouble / nD
      assert(rate === p)
      val center = p + z * z / (2.0 * nD)
      val margin = z * math.sqrt(p * (1.0 - p) / nD +
        z * z / (4.0 * nD * nD))
      val denom = 1.0 + z * z / nD
      assert(lo === math.max(0.0, (center - margin) / denom), nation)
      assert(hi === math.min(1.0, (center + margin) / denom), nation)
      assert(lo >= 0.0 && hi <= 1.0 && lo <= rate + 1e-12 &&
        rate <= hi + 1e-12, s"$nation: $lo $rate $hi")
    }
  }
}
