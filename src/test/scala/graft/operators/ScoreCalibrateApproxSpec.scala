package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The C104 deploy path (r12 VERDICT #3): `scoreCalibrateOn(exact =
  * false)` swaps the per-source rank window — whose hash(source)
  * partitions a skewed mega-source hot-spots — for per-source
  * approx-quantile cut points (one partial-agg exchange to an
  * O(sources) board), broadcast, banded MAP-SIDE. Pins the B80
  * discipline: bounded disagreement against the exact rank map, and
  * the plan-shape guarantee the flag exists for — no window operator,
  * no per-source sort over the corpus. */
class ScoreCalibrateApproxSpec extends SparkSpec {

  private def both() = {
    val docs = graft.sources.Tables(spark, sfDir).documents
    (TextOps.scoreCalibrateOn(docs, "doc_id", "source", "text"),
      TextOps.scoreCalibrateOn(docs, "doc_id", "source", "text",
        exact = false))
  }

  test("approx banding tracks the exact rank map: both are uniform-izing " +
      "CDF estimates, close except on tie mass straddling a cut") {
    val (exactDf, approxDf) = both()
    val e = exactDf.collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    val a = approxDf.collect().map(r => r.getLong(0) ->
      ((r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(e.keySet === a.keySet, "the two paths must score the same docs")
    assert(e.size >= 500, s"corpus too small to be meaningful: ${e.size}")
    // the band rational is coherent and in range
    a.values.foreach { case (num, den, cal) =>
      assert(den === TextOps.ScoreCalibrateBands.toLong)
      assert(num >= 0 && num <= den)
      assert(cal === num.toDouble / den)
    }
    val diffs = e.keysIterator.map(d => math.abs(e(d) - a(d)._3)).toVector
    // measured 0.0216 at sf0.001 (~50 docs/source: percentile estimation
    // on small n plus tie mass dominates the 1/(2k) banding floor)
    val mean = diffs.sum / diffs.size
    assert(mean <= 0.03, s"mean |approx - exact| = $mean > 0.03")
    val p99 = diffs.sorted.apply((diffs.size * 99) / 100)
    assert(p99 <= 0.10, s"p99 |approx - exact| = $p99 > 0.10")
  }

  test("NULL source is its own group in BOTH paths — the approx join is " +
      "null-safe, no doc is silently dropped (r13 review finding)") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i,
      if (i % 4 == 0) null else s"s${i % 3}",
      s"some document text number $i with enough words to score"))
      .toDF("doc_id", "source", "text")
    val e = TextOps.scoreCalibrateOn(docs, "doc_id", "source", "text")
      .collect().map(r => r.getLong(0)).toSet
    val a = TextOps.scoreCalibrateOn(docs, "doc_id", "source", "text",
        exact = false)
      .collect().map(r => r.getLong(0)).toSet
    assert(e === (1L to 40L).toSet, "exact path lost docs")
    assert(a === e, s"approx path dropped ${e -- a} (null-source docs?)")
  }

  test("plan guard: the approx plan has no window and no per-source sort " +
      "over the corpus — the mega-source hot spot cannot exist") {
    val (exactDf, approxDf) = both()
    val exactPlan = exactDf.queryExecution.executedPlan.toString
    val approxPlan = approxDf.queryExecution.executedPlan.toString
    // positive control: the gate path really does pay the rank window
    assert(exactPlan.contains("row_number()"),
      "exact path lost its rank window — this guard is stale")
    assert(!approxPlan.contains("Window") &&
      !approxPlan.contains("row_number()"),
      "approx path must not plan any window")
    // the threshold board broadcasts; the corpus is never hash(source)-
    // exchanged (the gate orderBy(doc_id) range exchange remains)
    assert(approxPlan.contains("BroadcastExchange"),
      "threshold board must broadcast")
    val srcExchanges = approxPlan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(source"))
    assert(srcExchanges <= 1, // the partial-agg board build only
      s"approx path hash(source)-exchanges the corpus $srcExchanges times")
  }
}
