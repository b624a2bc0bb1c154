package graft.sources

/** Scratch-path derivation + build-once memoization for the persisted-index
  * bench wrappers (C50/C54/C56).
  *
  * The cache key is the md5 of the FULL data-dir path plus a metadata
  * fingerprint of every file under it (relative name, length, mtime — no
  * data scan), so unlike a 32-bit `String.hashCode` two dirs can never
  * alias one index, and a changed corpus under the same path derives a NEW
  * scratch path instead of silently probing a stale index.
  *
  * Builds land in a process-scoped temp dir and move into place with a
  * rename, so a second concurrent JVM either wins the rename or adopts the
  * completed index — it can never read a partial one (the destination path
  * only ever appears complete).
  */
object IndexScratch {

  /** Paths already ensured in THIS JVM — repeat calls skip even the
    * directory existence check (the amortized steady state the persisted
    * indexes exist for). */
  private val built = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Metadata fingerprint of the source data: (relative path, length,
    * mtime) of every file under `dir`, sorted — changes when any data file
    * is added, removed, resized, or rewritten. Walks through the Hadoop
    * FS abstraction (r15 verdict #4: the previous `java.io.File` walk was
    * the last lifecycle entry point that threw on an object-store data
    * dir); on a local path the (rel, length, mtime) triples — and hence
    * the derived scratch paths — are identical to the old walk. */
  def fingerprint(dir: String): String = {
    val (fs, root) = fsFor(dir)
    require(fs.exists(root), s"data dir does not exist: $dir")
    val rootPath = fs.getFileStatus(root).getPath.toUri.getPath
    def walk(st: org.apache.hadoop.fs.FileStatus)
        : Seq[org.apache.hadoop.fs.FileStatus] =
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq
          .sortBy(_.getPath.getName).flatMap(walk)
      else Seq(st)
    md5hex(walk(fs.getFileStatus(root)).map { st =>
      val rel = st.getPath.toUri.getPath.stripPrefix(rootPath)
      s"$rel:${st.getLen}:${st.getModificationTime}"
    }.mkString("\n"))
  }

  /** Stable scratch path for (index kind, data dir, corpus state). */
  def path(kind: String, dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_${kind}_" +
      md5hex(dir + "\u0000" + fingerprint(dir))

  private[graft] def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(): Unit
  }

  // ---- Hadoop-FS primitives (r14 verdict #2) --------------------------------
  // Index lifecycle state — segment directories, admission markers, vacuum
  // inflight markers — must resolve through the SAME FS abstraction the
  // index DATA is written with: a `java.io.File` walk over an object-store
  // root sees zero segments and silently returns base-only probe results.
  // The hadoopConf comes from the active session (these verbs are
  // driver-side); with no session (unit scaffolding) the default conf still
  // resolves `file:` and bare local paths identically to java.io.File.

  private def hadoopConf: org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  private[graft] def fsFor(path: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(hadoopConf), p)
  }

  private[graft] def fsExists(path: String): Boolean = {
    val (fs, p) = fsFor(path); fs.exists(p)
  }

  /** Create a marker directory, loudly: a silently missing marker is the
    * double-admit / half-vacuum corruption the markers exist to prevent. */
  private[graft] def fsMkdirs(path: String): Unit = {
    val (fs, p) = fsFor(path)
    require(fs.mkdirs(p) || fs.exists(p), s"marker creation failed: $path")
  }

  /** Recursive delete through the FS abstraction (no-op if absent). */
  private[graft] def fsDeleteRec(path: String): Unit = {
    val (fs, p) = fsFor(path)
    if (fs.exists(p)) fs.delete(p, true): Unit
  }

  /** Names of the immediate child DIRECTORIES of `path` — the segment
    * discovery primitive (SaIndex/WinnowIndex sibling segments). */
  private[graft] def fsListSubdirs(path: String): Seq[String] = {
    val (fs, p) = fsFor(path)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
  }

  /** Has `tag` already been admitted into the index at `path`? The
    * replay-safe ingest loops consult this BEFORE probing: a re-delivered
    * micro-batch whose admission already committed must not re-probe (its
    * own rows are in the index now — the probe would emit self-hits) nor
    * re-append to the sink (r14 ADVICE). */
  def isAdmitted(path: String, tag: String): Boolean =
    fsExists(s"$path/_admitted_$tag")

  /** Per-path build locks: two same-JVM threads racing ensure() must not
    * write into the SAME pid-keyed temp dir (mode=overwrite would clobber
    * the sibling's in-flight output and rename a mixed partial index). */
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Admit exactly once per (index path, batch tag): the third verb of the
    * build-once / probe-many index lifecycle (ensure → admit → probe). The
    * caller's `append` writes the admitted batch's rows into the existing
    * index layout; a marker directory inside the index records the tag, so
    * a replayed ingest (same JVM or a later one over the same scratch
    * path) can NEVER double-admit — without the marker every rerun would
    * grow the stored index and corrupt occupancy/counts. Returns true iff
    * this call performed the append.
    *
    * Same-JVM racers serialize on a per-(path, tag) lock like [[ensure]];
    * concurrent-PROCESS admission of the same tag is the ingest
    * pipeline's single-writer responsibility (append-then-mark is not
    * cross-process atomic), matching how production table formats treat
    * concurrent blind appends. */
  def admitOnce(path: String, tag: String)(append: => Unit): Boolean = {
    require(tag.matches("[A-Za-z0-9_-]+"), s"unsafe admission tag: $tag")
    val marker = s"$path/_admitted_$tag"
    if (fsExists(marker)) return false
    locks.computeIfAbsent(s"$path#admit#$tag", _ => new Object).synchronized {
      if (fsExists(marker)) return false
      append
      // a failed marker write must fail LOUDLY: returning normally with no
      // marker would let a later rerun double-admit the batch — exactly
      // the corruption the marker exists to prevent
      fsMkdirs(marker)
      true
    }
  }

  /** Build the index at `path` exactly once per JVM: `build` writes into a
    * process-scoped temp dir which is renamed into place atomically.
    * Same-JVM callers serialize on a per-path lock; if a concurrent
    * PROCESS completed the index first, its (deterministic, hence
    * identical) build is adopted and ours is discarded. */
  def ensure(path: String)(build: String => Unit): Unit = {
    if (built.contains(path)) return
    locks.computeIfAbsent(path, _ => new Object).synchronized {
      if (built.contains(path)) return
      val (fs, dest) = fsFor(path)
      if (!fs.exists(dest)) {
        val tmp = path + ".build." + java.lang.ProcessHandle.current().pid()
        // A failed build must not orphan its partial temp dir in tmpdir
        // (r6 ADVICE): each new JVM derives a fresh pid suffix, so leaks
        // would accumulate across retries.
        try build(tmp)
        catch { case e: Throwable => fsDeleteRec(tmp); throw e }
        if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), dest)) {
          if (!fs.exists(dest))
            throw new IllegalStateException(
              s"index build rename failed: $tmp -> $dest")
          fsDeleteRec(tmp) // lost the race to an identical completed build
        }
      }
      built.add(path): Unit
    }
  }
}
