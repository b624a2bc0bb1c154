package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C108 `langid_agreement`: hand-checked kappa on perfect / independent /
  * degenerate label boards, plus conservation on the real corpus. */
class AgreementSpec extends SparkSpec {

  private def pairs(rows: (String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("label", "pred")
  }

  test("fixture: perfect agreement gives kappa 1") {
    val got = TextOps.agreementBoardOn(
      pairs(("en", "en"), ("en", "en"), ("de", "de")), "label", "pred")
      .collect()
    assert(got.forall(_.getDouble(7) === 1.0))
    assert(got.forall(_.getDouble(6) === 1.0)) // accuracy
  }

  test("fixture: hand confusion matrix — kappa from the cleared formula") {
    // 2x2: label a: 3 pred a, 1 pred b; label b: 1 pred a, 3 pred b
    // n=8, agree=6, marginals r=(4,4), c=(4,4), sum_rc=32
    // kappa = (8·6 − 32)/(64 − 32) = 16/32 = 0.5
    val got = TextOps.agreementBoardOn(
      pairs(Seq.fill(3)(("a", "a")) ++ Seq(("a", "b")) ++
        Seq(("b", "a")) ++ Seq.fill(3)(("b", "b")): _*), "label", "pred")
      .collect()
    assert(got.length === 4)
    val r = got.head
    assert(r.getLong(3) === 8L && r.getLong(4) === 6L &&
      r.getLong(5) === 32L)
    assert(r.getDouble(7) === 0.5)
  }

  test("fixture: a degenerate one-class board nulls kappa (pe = 1)") {
    val got = TextOps.agreementBoardOn(
      pairs(("a", "a"), ("a", "a")), "label", "pred").collect()
    assert(got.length === 1 && got.head.isNullAt(7))
  }

  test("fixture: a never-predicted label still counts in the marginal " +
      "product via the full-outer join") {
    // label c never predicted; pred d never labeled: r·c pairs with a
    // missing side contribute 0, but both marginals must be present
    val got = TextOps.agreementBoardOn(
      pairs(("a", "a"), ("c", "a"), ("a", "d")), "label", "pred")
      .collect()
    // n=3, agree=1; r = (a:2, c:1), c = (a:2, d:1); sum_rc over the
    // lang union {a, c, d} = 2·2 + 1·0 + 0·1 = 4
    assert(got.head.getLong(5) === 4L)
    // kappa = (3·1 − 4)/(9 − 4) = −0.2
    assert(got.head.getDouble(7) === -0.2)
  }

  test("real corpus: confusion cells conserve the doc count and kappa " +
      "replays from the cells") {
    val t = graft.sources.Tables(spark, sfDir)
    val rows = TextOps.langidAgreement(spark, sfDir).collect()
    val nDocs = t.documents.count()
    assert(rows.map(_.getLong(2)).sum === nDocs)
    assert(rows.forall(_.getLong(3) === nDocs))
    // independent kappa replay in plain Scala
    val cells = rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val agree = cells.collect { case ((l, p), n) if l == p => n }.sum
    val langs = cells.keySet.flatMap { case (l, p) => Set(l, p) }
    val rc = langs.toSeq.map { g =>
      val r = cells.collect { case ((l, _), n) if l == g => n }.sum
      val c = cells.collect { case ((_, p), n) if p == g => n }.sum
      r * c
    }.sum
    assert(rows.head.getLong(4) === agree && rows.head.getLong(5) === rc)
    val kappa = (nDocs.toDouble * agree.toDouble - rc.toDouble) /
      (nDocs.toDouble * nDocs.toDouble - rc.toDouble)
    assert(rows.head.getDouble(7) === kappa)
  }
}
