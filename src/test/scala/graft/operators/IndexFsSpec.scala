package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r14 verdict #2/#3 + ADVICE hardening, all four pinned:
  *  - the index lifecycles resolve segments/markers through the Hadoop
  *    FS abstraction — the whole SA lifecycle runs under a `file:` URI
  *    root that `java.io.File` cannot even see;
  *  - duplicate-id admission fails LOUDLY (SA df and winnow site counts
  *    would silently double otherwise);
  *  - a winnow admit replayed over a crashed partial segment overwrites
  *    it (idempotent), never double-appends;
  *  - a vacuum rerun over crashed pre-commit staging self-heals instead
  *    of dying on ErrorIfExists. */
class IndexFsSpec extends SparkSpec {

  import spark.implicits._

  private def strs(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString)

  private val W = TextOps.SubstrW

  private def mkDocs(rows: (Long, String)*): org.apache.spark.sql.DataFrame =
    rows.toDF("doc_id", "text")

  test("SA lifecycle under a file: URI root — build, admit, probe, " +
      "vacuum all through the FS abstraction") {
    val local = java.nio.file.Files.createTempDirectory("sa_fsuri").toString
    val root = s"file://$local/idx"
    // a java.io.File on the URI spelling sees nothing — the lifecycle
    // must be running on the Hadoop FS API for any of this to work
    assert(!new java.io.File(root).exists())
    val base = mkDocs(
      1L -> (1 to 10).map(i => s"base$i").mkString(" "),
      2L -> (1 to 10).map(i => s"other$i").mkString(" "))
    SaIndex.buildWindowSegment(base, "doc_id", "text", W, root)
    val census0 = strs(SaIndex.substringCensus(spark, root))
    assert(census0.nonEmpty)
    // admit a sibling segment carrying a base window → cross-segment df
    val batch = mkDocs(10L -> (1 to 10).map(i => s"base$i").mkString(" "))
    assert(SaIndex.admitWindowBatch(spark, root, "b1", batch,
      "doc_id", "text", W))
    assert(!SaIndex.admitWindowBatch(spark, root, "b1", batch,
      "doc_id", "text", W), "replayed admission must be a no-op")
    val union = base.unionByName(batch)
    val expect = strs(CorpusOps.substringDedupSaOn(union,
      "doc_id", "text", W))
    assert(strs(SaIndex.substringCensus(spark, root)) === expect)
    // vacuum folds the segment; probe unchanged
    val (segs, _, _) = SaIndex.vacuum(spark, root)
    assert(segs === 2)
    assert(strs(SaIndex.substringCensus(spark, root)) === expect)
  }

  test("SA admission of already-indexed doc ids fails loudly " +
      "(df would double-count)") {
    val root = java.nio.file.Files.createTempDirectory("sa_dup").toString
    val base = mkDocs(1L -> (1 to 10).map(i => s"tok$i").mkString(" "))
    SaIndex.buildWindowSegment(base, "doc_id", "text", W, root)
    val e = intercept[IllegalArgumentException] {
      SaIndex.admitWindowBatch(spark, root, "dup1", base,
        "doc_id", "text", W)
    }
    assert(e.getMessage.contains("already indexed"))
    // the refused admit must not have left a marker or a segment: a
    // RE-KEYED batch under the same tag admits cleanly afterwards
    val fresh = mkDocs(20L -> (1 to 10).map(i => s"tok$i").mkString(" "))
    assert(SaIndex.admitWindowBatch(spark, root, "dup1", fresh,
      "doc_id", "text", W))
  }

  test("winnow admission: duplicate ids fail loudly; a replay over a " +
      "crashed partial segment overwrites (no double-append)") {
    val shared = "the quick brown fox jumps over the lazy dog again and " +
      "then some more shared words follow here"
    val dir = java.nio.file.Files.createTempDirectory("win_dup").toString
    mkDocs(1L -> s"$shared base tail", 2L -> "unrelated base words only x")
      .write.parquet(s"$dir/documents.parquet")
    val path = WinnowIndex.ensure(spark, dir)
    val batch = mkDocs(10L -> s"$shared novel batch tail")
    // duplicate-id guard
    val e = intercept[IllegalArgumentException] {
      WinnowIndex.admit(spark, path,
        "dup1", mkDocs(1L -> "whatever text this is does not matter"),
        "doc_id", "text")
    }
    assert(e.getMessage.contains("already indexed"))
    // crash simulation: a PARTIAL sites_b1 segment landed but the
    // admission marker never did — the replayed admit must OVERWRITE
    // the segment, leaving products equal to the from-scratch selection
    TextOps.winnowSitesOn(batch, "doc_id", "text").limit(1)
      .write.parquet(s"$path/sites_b1")
    assert(WinnowIndex.admit(spark, path, "b1", batch, "doc_id", "text"))
    val fresh = TextOps.winnowSitesOn(
      TextOps.dedupCorpus(spark, dir).unionByName(batch), "doc_id", "text")
      .localCheckpoint(eager = true)
    assert(strs(TextOps.winnowFingerprintFrom(
        WinnowIndex.sites(spark, path))) ===
      strs(TextOps.winnowFingerprintFrom(fresh)))
  }

  test("vacuum reruns self-heal over crashed pre-commit staging " +
      "(leftover .vacuum dirs, no inflight marker)") {
    val shared = "the quick brown fox jumps over the lazy dog again and " +
      "then some more shared words follow here"
    val dir = java.nio.file.Files.createTempDirectory("win_heal").toString
    mkDocs(1L -> s"$shared base tail", 2L -> "unrelated base words only x")
      .write.parquet(s"$dir/documents.parquet")
    val path = WinnowIndex.ensure(spark, dir)
    WinnowIndex.admit(spark, path,
      "b1", mkDocs(10L -> s"$shared novel tail"), "doc_id", "text")
    val before = strs(TextOps.winnowFingerprintFrom(
      WinnowIndex.sites(spark, path)))
    // a prior vacuum crashed after staging, before the marker
    WinnowIndex.sites(spark, path).limit(1)
      .write.parquet(s"$path/sites.vacuum")
    val (_, _) = WinnowIndex.vacuum(spark, path)
    assert(strs(TextOps.winnowFingerprintFrom(
      WinnowIndex.sites(spark, path))) === before)
    // same class for the SA vacuum staging
    val root = java.nio.file.Files.createTempDirectory("sa_heal").toString
    val base = mkDocs(1L -> (1 to 10).map(i => s"tok$i").mkString(" "))
    SaIndex.buildWindowSegment(base, "doc_id", "text", W, root)
    SaIndex.admitWindowBatch(spark, root, "b1",
      mkDocs(20L -> (1 to 10).map(i => s"tok$i").mkString(" ")),
      "doc_id", "text", W)
    val censusBefore = strs(SaIndex.substringCensus(spark, root))
    spark.read.parquet(s"$root/groups").limit(1)
      .write.parquet(s"$root/groups.vacuum")
    SaIndex.vacuum(spark, root)
    assert(strs(SaIndex.substringCensus(spark, root)) === censusBefore)
  }
}
