package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.IndexScratch

/** Persisted winnow-fingerprint index (the C110 family's stored form):
  * ONE parquet table of winnow SITES — (doc_id, n_grams, mw), the
  * packed (hash, position) selections — from which every product
  * derives (C110 board, C111 overlap, C114 spans, the B115 ingest
  * gate's history side). Unlike the SA index, admission needs NO
  * cross-segment identity resolution: the site key is content-derived
  * (an md5-prefix hash of the gram itself), so a new batch's sites
  * simply APPEND — the monoid the B115 stream twin already proves.
  * Lifecycle verbs match the repo's index discipline:
  * ensure (build once per corpus state) → admit (append a NEW doc
  * batch under a replay-proof tag) → probe (the three products) →
  * vacuum (compact the append fragments; content-preserving).
  *
  * Scale shape: build = one gram explode + ONE doc-key window over the
  * corpus, paid once; the stored table is ≈2/(w+1) of the gram stream;
  * every probe is a rollup/join over that sparse table. */
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
    * fingerprints map-side and its sites append — content-derived keys
    * need no re-keying against the base. */
  def admit(spark: SparkSession, path: String, tag: String,
      docs: DataFrame, idCol: String, textCol: String): Boolean =
    IndexScratch.admitOnce(path, tag) {
      TextOps.winnowSitesOn(docs, idCol, textCol)
        .write.mode("append").parquet(s"$path/sites")
    }

  /** The stored sites. */
  def sites(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/sites")

  /** VACUUM: compact the append fragments into a fresh single-write
    * layout — pure file-count maintenance; rows are untouched, so
    * probe-after-vacuum ≡ probe-before by construction. Returns
    * (files_before, files_after). Single-writer, like every vacuum. */
  def vacuum(spark: SparkSession, path: String): (Long, Long) = {
    val dir = s"$path/sites"
    val before = Dedup.parquetFileCount(spark, dir)
    spark.read.parquet(dir).repartition(col("doc_id"))
      .write.parquet(s"$dir.vacuum")
    Dedup.swapDir(spark, s"$dir.vacuum", dir)
    (before, Dedup.parquetFileCount(spark, dir))
  }
}
