package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C106 `dup_spans_sa`: the suffix-array span extraction must reproduce
  * the window-census span product exactly — including MAXIMAL spans far
  * longer than the window width w (the Lee et al. ExactSubstr product:
  * a length-M ≥ w cross-doc repeat merges into ONE span of length M,
  * because its M−w+1 duplicated w-windows tile it with gaps ≤ w). */
class DupSpansSaSpec extends SparkSpec {

  private def spans(df: org.apache.spark.sql.DataFrame, w: Int,
      sa: Boolean) = {
    val out =
      if (sa) CorpusOps.dupSpansSaOn(df, "doc_id", "text", w)
      else Dedup.dupSpansWithDupWindows(
        Dedup.dupWindowsOf(df, "doc_id", "text", w), df, "doc_id", "text", w)
    out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("a 20-token shared passage at w=8 emits ONE maximal span of " +
      "length 20 from BOTH paths — spans exceed the window width") {
    import spark.implicits._
    val passage = (1 to 20).map(i => s"p$i").mkString(" ")
    // doc 1 carries the passage at token 4 (after 3 unique tokens);
    // doc 2 carries it at token 1 then unique tail; doc 3 is clean
    val df = Seq(
      (1L, s"a1 a2 a3 $passage z1 z2"),
      (2L, s"$passage b1 b2 b3 b4"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")).toDF("doc_id", "text")
    val w = 8
    val exact = spans(df, w, sa = false)
    val viaSa = spans(df, w, sa = true)
    assert(viaSa === exact, "SA path diverged from the census path")
    assert(viaSa === Seq((1L, 4L, 20L), (2L, 1L, 20L)),
      s"expected one maximal 20-token span per carrier, got $viaSa")
  }

  test("non-power-of-two width (w=5, exercises the doubling overlap " +
      "step) and an in-doc repeat: every start site is covered") {
    import spark.implicits._
    val rep = "r1 r2 r3 r4 r5"
    // doc 1 holds the repeat TWICE (both sites must be spanned); doc 2
    // holds it once; the two sites in doc 1 are separated by > w unique
    // tokens so they stay distinct islands
    val df = Seq(
      (1L, s"$rep x1 x2 x3 x4 x5 x6 $rep"),
      (2L, s"y1 $rep y2")).toDF("doc_id", "text")
    val w = 5
    val exact = spans(df, w, sa = false)
    val viaSa = spans(df, w, sa = true)
    assert(viaSa === exact, "SA path diverged from the census path")
    assert(viaSa === Seq((1L, 1L, 5L), (1L, 12L, 5L), (2L, 2L, 5L)),
      s"got $viaSa")
  }

  test("real corpus at the gate width: SA spans == census spans frame-" +
      "for-frame, and the conservation law vs the scrub holds") {
    val corpus = TextOps.dedupCorpus(spark, sfDir)
    val w = TextOps.SubstrW
    val exact = spans(corpus, w, sa = false)
    val viaSa = spans(corpus, w, sa = true)
    assert(viaSa === exact)
    assert(viaSa.nonEmpty, "degenerate corpus: no duplicated spans")
    // Σ span_len per doc == the scrub's n_removed (C105's conservation
    // law, inherited by the SA path)
    val removed = Dedup.scrubDuplicatedWindows(corpus, "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    viaSa.groupBy(_._1).foreach { case (doc, ss) =>
      assert(ss.map(_._3).sum === removed(doc),
        s"doc $doc: span mass ${ss.map(_._3).sum} != scrub ${removed(doc)}")
    }
  }
}
