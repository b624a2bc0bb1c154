package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C110/C111 winnowed fingerprints: the selection replays from an
  * independent per-doc JVM winnower, the coverage guarantee holds
  * (every full window carries a selected site), exact-copy twins share
  * their whole fingerprint, and the overlap board surfaces them. */
class WinnowSpec extends SparkSpec {

  /** Straight-line reference winnower over one sanitized string —
    * the same md5-prefix hash, combined key, and rightmost-min
    * tie-break, written independently of the Column spelling. */
  private def reference(text: String, k: Int, w: Int,
      chars: Int): Set[Long] = {
    val s = text.toLowerCase.replaceAll("[^a-z0-9 ]", "").take(chars)
    if (s.length < k + w - 1) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val grams = (0 to s.length - k).map { p =>
      val hex = md.digest(s.substring(p, p + k).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16) * chars + (chars - 1 - p)
    }
    (0 to grams.length - w).map(i => grams.slice(i, i + w).min).toSet
  }

  test("selection == the independent JVM winnower on real documents") {
    val docs = graft.sources.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text")).limit(25).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextOps.winnowSitesOn(
      graft.sources.Tables(spark, sfDir).documents
        .filter(col("doc_id").isin(docs.keys.toSeq: _*)),
      "doc_id", "text")
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(2)).toSet }
    assert(got.nonEmpty)
    got.foreach { case (id, mws) =>
      assert(mws === reference(docs(id), TextOps.WinnowK, TextOps.WinnowW,
        TextOps.WinnowChars), s"doc $id selection diverged")
    }
  }

  test("the winnowing guarantee: every full window contains a selected " +
      "site, and density is in (1/w, 1]") {
    val rows = TextOps.winnowSitesOn(TextOps.dedupCorpus(spark, sfDir),
      "doc_id", "text").collect()
      .groupBy(_.getLong(0))
    rows.foreach { case (id, rs) =>
      val n = rs.head.getInt(1)
      val sel = rs.map { r =>
        (TextOps.WinnowChars - 1) - (r.getLong(2) % TextOps.WinnowChars)
      }.toSet
      (0 to n - TextOps.WinnowW).foreach { start =>
        assert(sel.exists(p => p >= start && p < start + TextOps.WinnowW),
          s"doc $id: window at $start has no selected site")
      }
    }
    val board = TextOps.winnowFingerprint(spark, sfDir).collect()
    board.foreach { r =>
      val d = r.getAs[Double]("density")
      assert(d > 1.0 / TextOps.WinnowW && d <= 1.0,
        s"doc ${r.getLong(0)}: density $d outside (1/w, 1]")
    }
  }

  test("winnow_spans: exact-copy twins report IDENTICAL span lists on " +
      "both sides, and every pair's spans are disjoint, ordered, ≥ k") {
    val spans = TextOps.winnowSpans(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getString(2)),
        (r.getLong(3), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(spans.nonEmpty)
    // per (pair, side): ascending, non-overlapping, each at least a gram
    spans.foreach { case (k, ss) =>
      ss.foreach { case (_, len) => assert(len >= TextOps.WinnowK, s"$k") }
      ss.sliding(2).foreach {
        case Seq((s0, l0), (s1, _)) =>
          assert(s0 + l0 <= s1, s"$k: overlapping spans")
        case _ => ()
      }
    }
    // a seeded exact-copy pair: the copy's text is byte-identical, so
    // side a and side b must report the SAME intervals
    val twin = spans.keys.find { case (a, b, _) => b == a + 100000000L }
    assert(twin.isDefined, "no exact-copy pair on the span board")
    val (a, b, _) = twin.get
    assert(spans((a, b, "a")) === spans((a, b, "b")),
      "twin pair's sides diverged")
  }

  test("exact-copy twins share their whole fingerprint and surface on " +
      "the overlap board") {
    val fp = TextOps.winnowFingerprint(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(4), r.getLong(6)))).toMap
    val twins = fp.keys.filter(id => id >= 100000000L &&
      fp.contains(id - 100000000L)).toSeq.sorted
    assert(twins.nonEmpty, "seeded copies missing from the board")
    twins.foreach { c =>
      assert(fp(c) === fp(c - 100000000L),
        s"copy $c's fingerprint differs from its original")
    }
    val pairs = TextOps.winnowOverlap(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    twins.foreach { c =>
      assert(pairs.contains((c - 100000000L, c)),
        s"overlap board misses the exact-copy pair for $c")
    }
  }
}
