package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.IndexScratch

/** Persisted winnow-fingerprint index (the C110 family's stored form):
  * parquet tables of winnow SITES — (doc_id, n_grams, mw), the packed
  * (hash, position) selections — from which every product derives
  * (C110 board, C111 overlap, C114 spans, the B115 ingest gate's
  * history side). Unlike the SA index, admission needs NO cross-segment
  * identity resolution: the site key is content-derived (an md5-prefix
  * hash of the gram itself), so a new batch's sites simply land as a
  * SIBLING SEGMENT and reads union — the monoid the B115 stream twin
  * already proves. Lifecycle verbs match the repo's index discipline:
  * ensure (build once per corpus state) → admit (a NEW doc batch under
  * a replay-proof tag) → probe (the three products + the ingest gate's
  * batch-vs-history read) → vacuum (fold segments into one base;
  * content-preserving).
  *
  * Admission is CRASH-IDEMPOTENT (r14 ADVICE): each batch writes its
  * own `sites_<tag>` directory with mode=overwrite — SaIndex's
  * sibling-segment pattern — so a replayed admit after a crash between
  * a partial append and the marker write overwrites its own segment
  * instead of double-appending into a shared dir (the blind-append
  * design would silently duplicate site rows, corrupting the count(*)
  * rollups n_fp_sites and density).
  *
  * Scale shape: build = one gram explode + ONE doc-key window over the
  * corpus, paid once; the stored table is ≈2/(w+1) of the gram stream;
  * every probe is a rollup/join over that sparse table. Segment
  * discovery rides the Hadoop FS abstraction (r14 verdict #2 — a
  * `java.io.File` walk over an object-store root would silently see
  * zero segments). */
object WinnowIndex {

  /** Build invocations this JVM — the no-rebuild spec witness. */
  private[graft] val buildsPerformed =
    new java.util.concurrent.atomic.AtomicInteger(0)

  def indexPath(dir: String): String =
    IndexScratch.path(s"winnow${TextOps.WinnowK}x${TextOps.WinnowW}", dir)

  /** Ensure the base sites table for `dir`'s dedup corpus; returns the
    * path. */
  def ensure(spark: SparkSession, dir: String): String = {
    val path = indexPath(dir)
    IndexScratch.ensure(path) { tmp =>
      buildsPerformed.incrementAndGet()
      TextOps.winnowSitesOn(TextOps.dedupCorpus(spark, dir),
          "doc_id", "text")
        .write.parquet(s"$tmp/sites")
    }
    path
  }

  /** Admit a NEW batch of documents (exactly once per tag): the batch
    * fingerprints map-side into its OWN `sites_<tag>` segment with
    * mode=overwrite, so a replayed admit (crash after a partial write,
    * before the marker) is idempotent. Batch doc ids must be new —
    * guarded like [[SaIndex.admitWindowBatch]]: duplicate ids would
    * inflate the per-doc site counts every product rolls up. */
  def admit(spark: SparkSession, path: String, tag: String,
      docs: DataFrame, idCol: String, textCol: String): Boolean =
    IndexScratch.admitOnce(path, tag) {
      // doc-disjointness guard, EXCLUDING the tag's own segment — a
      // crashed admit can leave a committed sites_<tag> with no marker,
      // and the replay must overwrite it, not be refused for colliding
      // with itself (see [[SaIndex.admitWindowBatch]])
      val others = s"$path/sites" +: segmentTags(path).filter(_ != tag)
        .map(t => s"$path/sites_$t")
      val stored = others.map(spark.read.parquet(_).select(col("doc_id")))
        .reduce(_ unionByName _).distinct()
      val dup = docs.select(col(idCol).cast("long").as("doc_id")).distinct()
        .join(stored, Seq("doc_id"), "left_semi")
      require(dup.isEmpty, s"winnow admit '$tag' into $path: batch " +
        "carries doc ids already indexed — site counts would " +
        "double-count; vacuum/rebuild or re-key the batch")
      TextOps.winnowSitesOn(docs, idCol, textCol)
        .write.mode("overwrite").parquet(s"$path/sites_$tag")
    }

  /** LIVE segment tags = tags whose `sites_<tag>` directory still
    * exists (markers outlive vacuumed segments, exactly like
    * [[SaIndex]]). */
  private def segmentTags(path: String): Seq[String] =
    IndexScratch.fsListSubdirs(path)
      .filter(_.startsWith("sites_"))
      .map(_.stripPrefix("sites_")).sorted

  /** A crashed vacuum COMMIT leaves this marker: the swap and the
    * segment deletions are not jointly atomic, so a probe in that
    * window could double-count folded segments — fail loudly instead. */
  private def requireClean(path: String): Unit =
    require(!IndexScratch.fsExists(s"$path/_vacuum_inflight"),
      s"winnow index at $path has a half-committed vacuum — restore " +
        "sites.old (rename-aside kept it) or rebuild the index")

  /** The stored sites: base ∪ live segments. */
  def sites(spark: SparkSession, path: String): DataFrame = {
    requireClean(path)
    (s"$path/sites" +: segmentTags(path).map(t => s"$path/sites_$t"))
      .map(spark.read.parquet(_)).reduce(_ unionByName _)
  }

  /** Probe an ARRIVING batch against the stored fingerprints — the
    * copy-detection read an ingest gate runs BEFORE admitting: the
    * batch winnows map-side (C110's per-doc selection), history's
    * hash board is df-capped exactly like C111 (corpus-hot hashes are
    * boilerplate, and the cap bounds the join at MaxDf × |hashes|),
    * and a pair surfaces when the two sides share ≥ `minShared`
    * distinct winnowed hashes. Output: (batch_id, hist_id, n_shared).
    */
  def probeBatch(spark: SparkSession, path: String, docs: DataFrame,
      idCol: String, textCol: String,
      minShared: Int = TextOps.WinnowMinShared): DataFrame = {
    val hist0 = TextOps.winnowHashesFrom(sites(spark, path))
      .localCheckpoint(eager = true) // feeds the df census AND the join
    val hf = hist0.groupBy(col("h")).agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= TextOps.WinnowMaxDf).select(col("h"))
    val hist = hist0.join(hf, "h")
    TextOps.winnowHashes(docs.select(col(idCol).as("doc_id"),
        col(textCol).as("text")), "doc_id", "text")
      .select(col("doc_id").as("batch_id"), col("h"))
      .join(hist.select(col("doc_id").as("hist_id"), col("h")), "h")
      .groupBy(col("batch_id"), col("hist_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** VACUUM: fold base + segments into ONE fresh base — content-derived
    * keys need no re-keying, so this is a pure row-preserving rewrite
    * (probe-after-vacuum ≡ probe-before by construction). The commit —
    * one swap + the segment deletions — is bracketed by an inflight
    * marker (a crash between swap and deletes would otherwise
    * double-count the folded segments on the next read); the staging
    * write is mode=overwrite so a pre-commit crash self-heals (r14
    * ADVICE). Single-writer, like every vacuum. Returns
    * (files_before, files_after). */
  def vacuum(spark: SparkSession, path: String): (Long, Long) = {
    requireClean(path)
    val tags = segmentTags(path)
    val dir = s"$path/sites"
    val before = (dir +: tags.map(t => s"${dir}_$t"))
      .map(Dedup.parquetFileCount(spark, _)).sum
    sites(spark, path).repartition(col("doc_id"))
      .write.mode("overwrite").parquet(s"$dir.vacuum")
    val inflight = s"$path/_vacuum_inflight"
    IndexScratch.fsMkdirs(inflight)
    Dedup.swapDir(spark, s"$dir.vacuum", dir)
    tags.foreach(t => IndexScratch.fsDeleteRec(s"${dir}_$t"))
    IndexScratch.fsDeleteRec(inflight)
    (before, Dedup.parquetFileCount(spark, dir))
  }
}
