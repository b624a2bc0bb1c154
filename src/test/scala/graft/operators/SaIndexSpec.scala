package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted SA lifecycle (r13 verdict #3): probe-many without
  * rebuild, probe == from-scratch chain, stored scrub census == window
  * census, and batch admission merging to the union census. */
class SaIndexSpec extends SparkSpec {

  private def strs(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString)

  test("probe path: a re-query and the sibling products never rebuild, " +
      "and the probe equals the from-scratch doubling chain") {
    val a = strs(CorpusOps.substringDedupSa(spark, sfDir))
    val builds = SaIndex.buildsPerformed.get()
    // re-query + every sibling product off the same index: zero builds
    val b = strs(CorpusOps.substringDedupSa(spark, sfDir))
    val spans = strs(CorpusOps.dupSpansSa(spark, sfDir))
    val scrubBoard = SaIndex.dupWindows(spark,
      SaIndex.ensureWindowIndex(spark, sfDir, TextOps.SubstrW))
      .collect().map(_.getString(0)).toSet
    assert(SaIndex.buildsPerformed.get() === builds,
      "a probe re-ran the doubling chain")
    assert(a === b)
    // the stored index answers exactly what the from-scratch chain does
    assert(a === strs(CorpusOps.substringDedupSaOn(
      TextOps.dedupCorpus(spark, sfDir), "doc_id", "text",
      TextOps.SubstrW)))
    assert(spans === strs(CorpusOps.dupSpansSaOn(
      TextOps.dedupCorpus(spark, sfDir), "doc_id", "text",
      TextOps.SubstrW)))
    // and the stored group board IS the window census (the B78/B99
    // frozen scrub source)
    val winCensus = Dedup.dupWindowsOf(TextOps.dedupCorpus(spark, sfDir),
      "doc_id", "text", TextOps.SubstrW)
      .collect().map(_.getString(0)).toSet
    assert(scrubBoard === winCensus)
  }

  test("char-SA probe: stored ranks equal the chain and re-query " +
      "does not rebuild") {
    val a = strs(CorpusOps.suffixArray(spark, sfDir))
    val builds = SaIndex.buildsPerformed.get()
    val b = strs(CorpusOps.suffixArray(spark, sfDir))
    val lcp = strs(CorpusOps.suffixLcp(spark, sfDir))
    assert(SaIndex.buildsPerformed.get() === builds)
    assert(a === b)
    assert(a === strs(CorpusOps.suffixArrayOn(
      graft.sources.Tables(spark, sfDir).documents, "doc_id", "text")))
    assert(lcp === strs(CorpusOps.suffixLcpOn(
      graft.sources.Tables(spark, sfDir).documents, "doc_id", "text")))
  }

  test("admission: a batch segment merges into the union census " +
      "(cross-segment window identity), double-admit is a no-op") {
    import spark.implicits._
    val w = TextOps.SubstrW
    val dir = java.nio.file.Files.createTempDirectory("sa_admit").toString
    // ids avoid %7==0 so dedupCorpus adds no shifted copies — the spec
    // controls the corpus exactly
    val base = Seq(
      1L -> "a b c d e f g h i j",
      2L -> "a b c d e f g h x y",
      3L -> "p q r s t u v wv z1 z2").toDF("doc_id", "text")
    base.write.parquet(s"$dir/documents.parquet")
    val path = SaIndex.ensureWindowIndex(spark, dir, w)
    // the batch's first window equals docs 1/2's — duplication must be
    // detected ACROSS segments, where the rank key spaces are disjoint
    val batch = Seq(10L -> "a b c d e f g h only new tail")
      .toDF("doc_id", "text")
    assert(SaIndex.admitWindowBatch(spark, path, "b1", batch,
      "doc_id", "text", w), "first admit must append")
    assert(!SaIndex.admitWindowBatch(spark, path, "b1", batch,
      "doc_id", "text", w), "second admit of the same tag must be a no-op")
    val union = base.unionByName(batch)
    assert(strs(SaIndex.substringCensus(spark, path)) ===
      strs(CorpusOps.substringDedupSaOn(union, "doc_id", "text", w)))
    assert(strs(SaIndex.dupSpans(spark, path, w)) ===
      strs(CorpusOps.dupSpansSaOn(union, "doc_id", "text", w)))
    assert(SaIndex.dupWindows(spark, path)
      .collect().map(_.getString(0)).toSet ===
      Dedup.dupWindowsOf(union, "doc_id", "text", w)
        .collect().map(_.getString(0)).toSet)
    // the load-bearing assertion: duplication visible ONLY across
    // segments (doc 10's window lives in the batch, its twins in the
    // base) is detected through the boards' window-key merge
    val census = SaIndex.substringCensus(spark, path).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(census(10L) >= 1L, "cross-segment duplicate window missed")

    // ---- VACUUM: the fourth verb — fold segments into one fresh base
    val preCensus = strs(SaIndex.substringCensus(spark, path))
    val preSpans = strs(SaIndex.dupSpans(spark, path, w))
    val preBoard = SaIndex.dupWindows(spark, path)
      .collect().map(_.getString(0)).toSet
    val (nSegs, _, _) = SaIndex.vacuum(spark, path)
    assert(nSegs === 2, "vacuum should have folded base + one segment")
    // content-preserving: every probe product identical post-vacuum
    assert(strs(SaIndex.substringCensus(spark, path)) === preCensus)
    assert(strs(SaIndex.dupSpans(spark, path, w)) === preSpans)
    assert(SaIndex.dupWindows(spark, path)
      .collect().map(_.getString(0)).toSet === preBoard)
    // segments folded away; the admission marker SURVIVES, so a replayed
    // ingest of the folded batch stays a no-op (its docs live in the base)
    assert(!new java.io.File(s"$path/positions_b1").exists())
    assert(!SaIndex.admitWindowBatch(spark, path, "b1", batch,
      "doc_id", "text", w),
      "vacuum must not reopen the admitted tag — double-ingest corruption")
    // idempotent on a single segment
    val again = SaIndex.vacuum(spark, path)
    assert(again._1 === 1 && again._2 === again._3)
  }
}
