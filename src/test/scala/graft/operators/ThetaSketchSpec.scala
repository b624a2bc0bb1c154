package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** B122 `distinct_theta_ops`: KMV (bottom-k theta) sketches with set
  * algebra. Four contracts:
  *
  *  - EXACT below k: a sketch that never filled holds every hash, so
  *    size, union, and intersection answers are exact by construction;
  *  - the bottom-k MERGE LAW: sketching a union of feeds == re-slicing
  *    the union of the individual sketches (what makes the union
  *    estimate well-defined);
  *  - estimator accuracy on seeded large segments (k=128 → σ ≈ 9%);
  *  - degenerate pairs: disjoint segments estimate ≈ 0 intersection,
  *    identical segments estimate intersection == union.
  */
class ThetaSketchSpec extends SparkSpec {

  private def eventsOf(pairs: Seq[(String, Long)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("event_type", "user_id")
  }

  private def sketches(pairs: Seq[(String, Long)]): DataFrame =
    OlapC.kmvSketchesOn(eventsOf(pairs), "event_type", "user_id")

  private def board(pairs: Seq[(String, Long)]) =
    OlapC.thetaPairBoardOn(sketches(pairs))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap

  test("below k every answer is exact: sizes, union, and intersection") {
    // |A| = 80, |B| = 60, |A ∩ B| = 40 — all sketches hold every value
    val a = (0L until 80L).map(("a", _))
    val b = (40L until 100L).map(("b", _))
    // duplicates must not count twice
    val got = board(a ++ a ++ b)(("a", "b"))
    assert(got == ((80L, 60L, 100L, 40L)),
      s"exact regime must return exact set sizes, got $got")
  }

  test("bottom-k merge law: sketch(feed1 ∪ feed2) == re-slice of " +
      "sketch(feed1) ∪ sketch(feed2)") {
    val f1 = (0L until 600L).map(("t", _))
    val f2 = (300L until 900L).map(("t", _))
    val whole = sketches(f1 ++ f2).select(col("sk")).head().getSeq[Long](0)
    val s1 = sketches(f1).select(col("sk")).head().getSeq[Long](0)
    val s2 = sketches(f2).select(col("sk")).head().getSeq[Long](0)
    val resliced = (s1 ++ s2).distinct.sorted.take(OlapC.KmvK)
    assert(whole == resliced, "bottom-k must be a semilattice re-slice")
  }

  test("seeded 5000-member segments with 50% overlap: every estimate " +
      "within 3σ of truth") {
    val nA = 5000L
    val a = (0L until nA).map(("a", _))
    val b = (2500L until 7500L).map(("b", _))
    val (estA, estB, estU, estI) = board(a ++ b)(("a", "b"))
    val sigma = 1.0 / math.sqrt(OlapC.KmvK - 2) // ≈ 0.089
    def within(est: Long, truth: Double, mult: Double = 3.0): Boolean =
      math.abs(est - truth) <= mult * sigma * truth
    assert(within(estA, 5000), s"est_a $estA vs 5000")
    assert(within(estB, 5000), s"est_b $estB vs 5000")
    assert(within(estU, 7500), s"est_union $estU vs 7500")
    // intersection compounds union noise with the ρ binomial — allow 5σ
    assert(within(estI, 2500, 5.0), s"est_intersect $estI vs 2500")
  }

  test("degenerate pairs: disjoint segments intersect near zero; " +
      "identical segments intersect at their union") {
    val a = (0L until 3000L).map(("a", _))
    val b = (10000L until 13000L).map(("b", _))
    val (_, _, _, estDisjoint) = board(a ++ b)(("a", "b"))
    // ρ = 0 exactly: no hash can sit in both sketches
    assert(estDisjoint == 0L, s"disjoint est_intersect $estDisjoint")
    val c = (0L until 3000L).map(("c", _))
    val (ea, _, eu, ei) = board(a ++ c)(("a", "c"))
    assert(ei == eu && eu == ea,
      s"identical segments must estimate intersect == union ($ei, $eu)")
  }

  test("driver key at sf0.001 runs the exact regime end to end: every " +
      "estimate equals the true set size") {
    val ev = graft.sources.Tables(spark, sfDir).events
      .select(col("event_type"), col("user_id")).distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val sets = ev.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rows = OlapC.distinctThetaOps(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sa, sb) = (sets(r.getString(0)), sets(r.getString(1)))
      assert(sa.size < OlapC.KmvK, "sf0.001 must exercise the exact path")
      assert(r.getLong(2) == sa.size && r.getLong(3) == sb.size,
        s"exact sizes: got (${r.getLong(2)}, ${r.getLong(3)})")
      assert(r.getLong(4) == (sa ++ sb).size, "exact union size")
      assert(r.getLong(5) == (sa intersect sb).size, "exact intersection")
    }
  }
}
