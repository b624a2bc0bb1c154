package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted winnow-fingerprint lifecycle: no rebuild on re-query,
  * probe == from-scratch selection, append-only admission merging to
  * the union products, and a content-preserving vacuum. */
class WinnowIndexSpec extends SparkSpec {

  private def strs(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString)

  test("probe path: re-query and sibling products never rebuild; every " +
      "product equals the from-scratch selection") {
    val a = strs(TextOps.winnowFingerprint(spark, sfDir))
    val builds = WinnowIndex.buildsPerformed.get()
    val b = strs(TextOps.winnowFingerprint(spark, sfDir))
    val overlap = strs(TextOps.winnowOverlap(spark, sfDir))
    val spans = strs(TextOps.winnowSpans(spark, sfDir))
    assert(WinnowIndex.buildsPerformed.get() === builds,
      "a probe re-ran the selection chain")
    assert(a === b)
    // from-scratch replays
    val fresh = TextOps.winnowSitesOn(TextOps.dedupCorpus(spark, sfDir),
      "doc_id", "text").localCheckpoint(eager = true)
    assert(a === strs(TextOps.winnowFingerprintFrom(fresh)))
    assert(overlap ===
      strs(TextOps.winnowOverlapFrom(TextOps.winnowHashesFrom(fresh))))
    assert(spans === strs(TextOps.winnowSpansFrom(fresh)))
  }

  test("admission appends a batch's content-derived sites (no " +
      "re-keying); double-admit is a no-op; vacuum preserves content") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("winnow_admit")
      .toString
    // ids avoid %7 — dedupCorpus adds nothing; base shares a 15-char
    // run with the batch so cross-segment overlap must surface
    val shared = "the quick brown fox jumps over the lazy dog again"
    Seq(1L -> s"$shared and some base only tail words here now",
        2L -> "completely different base content with no overlap at all x")
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val path = WinnowIndex.ensure(spark, dir)
    val batch = Seq(10L -> s"$shared plus novel batch tail words")
      .toDF("doc_id", "text")
    assert(WinnowIndex.admit(spark, path, "b1", batch, "doc_id", "text"))
    assert(!WinnowIndex.admit(spark, path, "b1", batch, "doc_id", "text"),
      "replayed admission must be a no-op")
    // union parity: every product off the admitted index equals the
    // from-scratch selection over base ∪ batch
    val union = TextOps.seededDups(
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))).unionByName(batch)
    val fresh = TextOps.winnowSitesOn(union, "doc_id", "text")
      .localCheckpoint(eager = true)
    def allProducts(sites: org.apache.spark.sql.DataFrame) = (
      strs(TextOps.winnowFingerprintFrom(sites)),
      strs(TextOps.winnowOverlapFrom(TextOps.winnowHashesFrom(sites))),
      strs(TextOps.winnowSpansFrom(sites)))
    val stored = WinnowIndex.sites(spark, path)
    val before = allProducts(stored)
    assert(before === allProducts(fresh))
    // the cross-segment pair (1, 10) must be on the overlap board
    assert(before._2.exists(_.contains("[1,10,")),
      s"cross-segment overlap missing: ${before._2}")
    // vacuum: fewer-or-equal files, identical products
    val (fb, fa) = WinnowIndex.vacuum(spark, path)
    assert(fa <= fb)
    assert(allProducts(WinnowIndex.sites(spark, path)) === before)
  }
}
