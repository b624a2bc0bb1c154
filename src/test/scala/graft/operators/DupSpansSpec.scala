package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C105 `dup_spans`: hand-checked interval merging (overlap, adjacency,
  * separation) and the conservation law vs C96's scrub — Σ span_len per
  * doc must equal the scrub's n_removed exactly. */
class DupSpansSpec extends SparkSpec {

  test("hand corpus: overlapping starts merge, gap > w splits, both " +
      "carriers report the span") {
    import spark.implicits._
    val span = "q w e r t y u i o p" // 10 tokens -> dup starts at 2 positions
    val docs = Seq(
      (1L, s"a b $span c d"),          // span at tokens 3..12
      (2L, s"$span x $span"),          // two carriers of the span, gap 1
      (3L, "n o t h i n g s h a r e d x")).toDF("doc_id", "text")
    val got = Dedup.dupSpansWithDupWindows(
        Dedup.dupWindowsOf(docs, "doc_id", "text", 8),
        docs, "doc_id", "text", 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // w=8 over a 10-token shared span: dup starts are the positions of
    // the 8-windows lying wholly inside the span; doc2's two copies sit
    // 11 apart (gap 9 > ... within w? start gap = 11 > 8 -> SPLIT)
    val byDoc = got.groupBy(_._1)
    assert(byDoc(1L).map(t => (t._2, t._3)).toSeq === Seq((3L, 10L)))
    assert(byDoc(2L).map(t => (t._2, t._3)).toSeq.sorted ===
      Seq((1L, 10L), (12L, 10L)), s"doc2 spans: ${byDoc(2L).toSeq}")
    assert(!byDoc.contains(3L))
  }

  test("conservation: per doc, Σ span_len == the scrub's n_removed on " +
      "the seeded corpus") {
    val corpus = TextOps.dedupCorpus(spark, sfDir)
    val wins = Dedup.dupWindowsOf(corpus, "doc_id", "text", TextOps.SubstrW)
      .localCheckpoint(eager = true)
    val spans = Dedup.dupSpansWithDupWindows(wins, corpus, "doc_id",
        "text", TextOps.SubstrW)
      .groupBy(col("doc_id")).agg(sum(col("span_len")).as("masked"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val removed = Dedup.scrubWithDupWindows(wins, corpus, "doc_id",
        "text", TextOps.SubstrW)
      .select(col("doc_id"), col("n_removed")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).filter(_._2 > 0).toMap
    assert(spans === removed,
      "span mass must equal scrub removal mass doc-for-doc")
    assert(spans.nonEmpty)
  }
}
