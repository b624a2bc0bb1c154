package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C103 `substring_dedup_sa`: the C44 window census computed through a
  * w-truncated generalized suffix array (token-level prefix doubling,
  * distributed dense-rank boards) must be ROW-IDENTICAL to
  * `Dedup.duplicatedWindowStats` — the hash-equality-as-algorithm-
  * equivalence discipline, here asserted frame-to-frame in addition to
  * the shared DuckDB oracle. Also pins the C99/C101 gate-slice
  * parameter lift (r11 next-round #2b).
  */
class SuffixDedupSaSpec extends SparkSpec {

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

  test("SA census == window-hash census on the seeded-dup corpus (w = 8)") {
    val corpus = TextOps.dedupCorpus(spark, sfDir)
    val sa = asMap(CorpusOps.substringDedupSaOn(corpus, "doc_id", "text",
      TextOps.SubstrW))
    val hash = asMap(Dedup.duplicatedWindowStats(corpus, "doc_id", "text",
      TextOps.SubstrW))
    assert(sa === hash)
    assert(sa.nonEmpty && sa.values.exists(_._2 > 0),
      "seeded dups must produce duplicated windows")
  }

  test("SA census == window-hash census at a non-power-of-two width " +
      "(w = 5 exercises the overlapping doubling step k = w - len)") {
    val corpus = TextOps.dedupCorpus(spark, sfDir).filter(col("doc_id") % 3 === 0)
    val sa = asMap(CorpusOps.substringDedupSaOn(corpus, "doc_id", "text", 5))
    val hash = asMap(Dedup.duplicatedWindowStats(corpus, "doc_id", "text", 5))
    assert(sa === hash)
  }

  test("hand corpus: shared span flagged in both carriers, unique doc clean, " +
      "short doc absent") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (1L, s"alpha beta $shared gamma"),
      (2L, s"$shared delta epsilon zeta"),
      (3L, "one two three four five six seven eight nine ten eleven"),
      (4L, "too short for any window")).toDF("doc_id", "text")
    val got = asMap(CorpusOps.substringDedupSaOn(docs, "doc_id", "text", 10))
    // the shared 10-token span: doc1 embeds it at pos 2, doc2 at pos 0
    // (13 tokens each -> 4 windows, 1 duplicated); doc3 has 11 tokens
    // -> 2 windows, none duplicated
    assert(got === Map(
      1L -> ((4L, 1L, 0.25)),
      2L -> ((4L, 1L, 0.25)),
      3L -> ((2L, 0L, 0.0))))
    assert(!got.contains(4L), "a doc below w tokens carries no windows")
  }

  test("suffixArrayOn parameter lift: docMod=1/window=16 on 'banana' " +
      "reproduces the textbook suffix array") {
    import spark.implicits._
    val df = Seq((1L, "banana")).toDF("doc_id", "text")
    val got = CorpusOps.suffixArrayOn(df, "doc_id", "text",
        docMod = 1, window = 16)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // suffixes sorted: a(5) ana(3) anana(1) banana(0) na(4) nana(2)
    assert(got === Map(5L -> 1L, 3L -> 2L, 1L -> 3L, 0L -> 4L,
      4L -> 5L, 2L -> 6L))
  }
}
