package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The RFM deploy path (r11 VERDICT #1): `rfmTailOn(exact = false)`
  * swaps the three exact single-partition `ntile(4)` sorts for ONE
  * bounded `approx_percentile` agg whose 1-row threshold board
  * broadcasts back onto the user rollup, banding map-side. Pins the
  * C95 t-digest discipline: the two paths may disagree only at
  * quartile boundaries (ntile balances bucket sizes; thresholds cut by
  * value), and that disagreement stays ≤ 5 % per metric — plus the
  * plan-shape guarantee the flag exists for: NO window operator and no
  * single-partition exchange over anything bigger than a partial-agg
  * board.
  */
class RfmApproxSpec extends SparkSpec {

  private def both() = {
    val evs = graft.sources.Tables(spark, sfDir).events
    val exact = OlapD.rfmSegmentsOn(evs, "user_id", "ts", "event_type",
      "value", "purchase")
    val approx = OlapD.rfmSegmentsOn(evs, "user_id", "ts", "event_type",
      "value", "purchase", exact = false)
    (exact, approx)
  }

  test("approx banding disagrees with exact ntile on <= 5% of users " +
      "per metric, and only ever by one bucket at a boundary") {
    import spark.implicits._
    // a deterministic 4000-user rollup with realistic tie mass (~1% of
    // the corpus per tied value: 90/97/1000 distinct values) — ntile
    // tie-splits and threshold cuts then disagree only on the tie
    // groups straddling the three cuts, which is what the 5% bound
    // means. (A PATHOLOGICAL tie regime — e.g. 7 distinct frequencies,
    // 14% of users per value — makes the two definitions diverge on
    // whole tie groups by construction; that is a property of quartiles
    // over near-constant data, not of the approx path.) The sf corpora
    // carry too few users for a 5% statistic, hence synthetic.
    val perUser = spark.range(1, 4001).select(
      col("id").as("user_id"),
      date_add(lit("2024-01-01").cast("date"),
        (col("id") % 90).cast("int")).as("last_d"),
      (col("id") % 97 + 1).as("frequency"),
      ((col("id") * 37 % 1000).cast("decimal(25,6)") / 10)
        .cast("decimal(25,6)").as("monetary_dec"))
    val anchor = perUser.agg(max(col("last_d")).as("anchor_d"))
    val exactDf = OlapD.rfmTailOn(perUser, anchor)
    val approxDf = OlapD.rfmTailOn(perUser, anchor, exact = false)
    val e = exactDf.collect()
      .map(r => r.getLong(0) -> ((r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val a = approxDf.collect()
      .map(r => r.getLong(0) -> ((r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(e.keySet === a.keySet, "the two paths must score the same users")
    assert(e.size > 100, s"corpus too small to make 5% meaningful: ${e.size}")
    // every approx band is a valid quartile
    a.values.foreach { case (r, f, m) =>
      Seq(r, f, m).foreach(q => assert(1L <= q && q <= 4L)) }
    val (rd, fd, md) = e.keysIterator.foldLeft((0, 0, 0)) {
      case ((nr, nf, nm), u) =>
        val (er, ef, em, _, _, _) = e(u)
        val (ar, af, am) = a(u)
        // disagreement is a tie straddling a cut: never more than one
        // bucket apart
        Seq((er, ar), (ef, af), (em, am)).foreach { case (x, y) =>
          assert(math.abs(x - y) <= 1, s"user $u bands $x vs $y") }
        (nr + (if (er != ar) 1 else 0), nf + (if (ef != af) 1 else 0),
          nm + (if (em != am) 1 else 0))
    }
    val n = e.size.toDouble
    Seq("recency" -> rd, "frequency" -> fd, "monetary" -> md).foreach {
      case (metric, d) =>
        assert(d / n <= 0.05,
          s"$metric banding disagreement ${d / n} > 5% ($d of ${e.size})")
    }
  }

  test("approx band respects each metric's order on the shared rollup " +
      "(threshold cuts are monotone even where ntile tie-splits are not)") {
    val (_, approxDf) = both()
    val rows = approxDf.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5),
      r.getLong(6)))
    def monotone(sorted: Seq[Long]): Boolean =
      sorted.zip(sorted.tail).forall { case (x, y) => x <= y }
    assert(monotone(rows.sortBy(u => -u._2).map(_._5).toSeq)) // r_q
    assert(monotone(rows.sortBy(u => u._3).map(_._6).toSeq)) // f_q
    assert(monotone(rows.sortBy(u => u._4).map(_._7).toSeq)) // m_q
    // unlike ntile, equal metric values ALWAYS band together
    rows.groupBy(_._2).values.foreach(g => assert(g.map(_._5).distinct.size == 1))
    rows.groupBy(_._3).values.foreach(g => assert(g.map(_._6).distinct.size == 1))
    rows.groupBy(_._4).values.foreach(g => assert(g.map(_._7).distinct.size == 1))
  }

  test("plan guard: the approx plan has no window operator, and its only " +
      "single-partition exchanges feed partial-agg boards (bounded rows)") {
    val (exactDf, approxDf) = both()
    val exactPlan = exactDf.queryExecution.executedPlan.toString
    val approxPlan = approxDf.queryExecution.executedPlan.toString
    // positive control: the gate path really does pay the ntile sorts
    // ("ntile(" not "ntile" — percentile_approx matches the bare word)
    assert(exactPlan.contains("ntile("),
      "exact path lost its ntile windows — this guard is stale")
    assert(!approxPlan.contains("ntile(") && !approxPlan.contains("Window"),
      "approx path must not plan any window")
    // every SinglePartition exchange must sit directly on a partial
    // aggregate (one row per upstream partition — the 1-row threshold /
    // anchor boards), never on the O(users) rollup or a sort
    val lines = approxPlan.linesIterator.toVector
    lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
      .foreach { case (_, i) =>
        assert(i + 1 < lines.size && lines(i + 1).contains("HashAggregate") &&
          lines(i + 1).contains("partial"),
          s"SinglePartition exchange at plan line $i is not a bounded " +
            s"partial-agg board:\n${lines.slice(i, i + 2).mkString("\n")}")
      }
  }
}
