package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B107 `benford_audit`: hand-checked digit extraction and χ², the
  * zero-count digit contribution, and board invariants on the real
  * corpus. */
class BenfordSpec extends SparkSpec {

  test("fixture: micro-grid first digits, zero-count digits still " +
      "contribute n·p to χ²") {
    import spark.implicits._
    // values 1.5, 19.99, 0.002, 900 → first digits 1, 1, 2, 9
    val df = Seq(1.5, 19.99, 0.002, 900.0, -5.0, 0.0).toDF("v")
    val rows = OlapD.benfordAuditOn(df, "v").collect()
    assert(rows.length === 9)
    val byDigit = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byDigit === Map(1 -> 2L, 2 -> 1L, 3 -> 0L, 4 -> 0L, 5 -> 0L,
      6 -> 0L, 7 -> 0L, 8 -> 0L, 9 -> 1L), "non-positive values excluded")
    assert(rows.forall(_.getLong(2) === 4L))
    // independent χ² replay in plain Scala, same fixed-order chain
    val n = 4.0
    val counts = (1 to 9).map(d => byDigit(d).toDouble)
    val chi2 = (1 to 9).map { d =>
      val e = n * OlapD.BenfordP(d - 1)
      val o = counts(d - 1)
      (o - e) * (o - e) / e
    }.reduce(_ + _)
    assert(rows.head.getDouble(5) === chi2)
  }

  test("fixture: a perfectly Benford sample scores a tiny χ²") {
    import spark.implicits._
    // counts proportional to Benford over n=10000: expected ≈ observed
    val vals = (1 to 9).flatMap { d =>
      val n = math.round(OlapD.BenfordP(d - 1) * 10000).toInt
      Seq.fill(n)(d.toDouble)
    }
    val rows = OlapD.benfordAuditOn(vals.toDF("v"), "v").collect()
    assert(rows.head.getDouble(5) < 1.0, s"chi2=${rows.head.getDouble(5)}")
  }

  test("real corpus: 9-row board, counts conserve the positive rows, " +
      "frequencies sum to 1") {
    val t = graft.sources.Tables(spark, sfDir)
    val rows = OlapD.benfordAudit(spark, sfDir).collect()
    assert(rows.length === 9)
    val nPos = t.lineitem.filter(col("l_extendedprice") > 0).count()
    assert(rows.map(_.getLong(1)).sum === nPos)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    assert(rows.forall(_.getDouble(5) === rows.head.getDouble(5)))
  }
}
