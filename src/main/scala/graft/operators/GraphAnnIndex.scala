package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.IndexScratch

/** Persisted kNN-graph ANN index (C117's stored form) — the FOURTH index
  * family carrying the repo's full lifecycle discipline (after the
  * minhash band index, the suffix-array index, and the winnow index):
  * ensure (build once per corpus state) → admit (a NEW vector batch as a
  * sibling segment) → probe (beam search over the merged graph) → vacuum
  * (fold segments into one base; probe-preserving).
  *
  * Stored layout:
  *   - `cents/`   (cent_id, cent): the 1e-6 integer-grid coarse centroids,
  *     FROZEN at ensure — admission posts new vectors to the SAME router
  *     (the IVF-PQ admit discipline), so the posting of any vector is a
  *     pure function of (vector, index), independent of arrival order.
  *   - `medoids/` (cent_id, entry): per-list entry points, frozen with the
  *     centroids (an entry point only needs to be NEAR its list, not
  *     optimal — beam expansion does the rest).
  *   - `post/` (+ `post_<tag>`) (vec_id, emb, cid, rv): each vector's
  *     top-[[Ann.GraphReplicas]] list posting WITH its embedding — the
  *     candidate-generation side of admission and the vector store the
  *     probe scores against.
  *   - `edges/` (+ `edges_<tag>`) (src, dst, score): SCORED directed
  *     edges. Segments may give a vertex more than M stored out-edges
  *     (each admit can add reverse edges old→new); the READ re-cuts
  *     per-src top-M by (score desc, dst) — the bounded heap — so the
  *     probe always searches a degree-M graph. Vacuum materializes
  *     exactly that read view, which is why it is probe-preserving by
  *     construction.
  *
  * Admission work is bounded: a batch scores only against stored posting
  * rows in the lists IT posts to (O(batch × bucket)), appends its own
  * `post_<tag>`/`edges_<tag>` segments with mode=overwrite (crash-
  * idempotent — the WinnowIndex sibling-segment pattern), and the
  * old→new reverse edges are cut to M per source before storing, so a
  * vertex's stored overage grows by ≤ M rows per admit and the read-side
  * re-cut stays cheap. This is HNSW's insert shape (bidirectional links,
  * prune to M) re-expressed as append-only segments + a merge-at-read
  * law, which is what makes replay/crash idempotence provable.
  *
  * All discovery rides the Hadoop FS abstraction (r14 verdict #2). */
object GraphAnnIndex {

  /** Build invocations this JVM — the no-rebuild spec witness. */
  private[graft] val buildsPerformed =
    new java.util.concurrent.atomic.AtomicInteger(0)

  def indexPath(dir: String): String =
    IndexScratch.path(
      s"gann${VectorOps.GraphM}x${VectorOps.IvfLists}v1", dir)

  /** Ensure the base graph for `dir`'s embeddings corpus; returns the
    * path. The stored frames are [[Ann.graphBuildScored]]'s — the SAME
    * spelling the in-query C117 key runs, so `probe` over a fresh index
    * is bit-identical to `ann_graph_topk` (they share the DuckDB
    * oracle). */
  def ensure(spark: SparkSession, dir: String): String = {
    val path = indexPath(dir)
    IndexScratch.ensure(path) { tmp =>
      buildsPerformed.incrementAndGet()
      val (cents, ranked, medoids, edges) = Ann.graphBuildScored(
        VectorOps.emb(spark, dir), "vec_id", "emb",
        m = VectorOps.GraphM, nLists = VectorOps.IvfLists)
      cents.select(col("_cent_id").as("cent_id"), col("_cent").as("cent"))
        .coalesce(1).write.parquet(s"$tmp/cents")
      medoids.select(col("_cent_id").as("cent_id"), col("_entry").as("entry"))
        .coalesce(1).write.parquet(s"$tmp/medoids")
      ranked.select(col("_nid").as("vec_id"), col("_e").as("emb"),
          col("_cent_id").as("cid"), col("_rv").as("rv"))
        .repartition(col("cid")).write.parquet(s"$tmp/post")
      edges.select(col("src"), col("dst"), col("_s").as("score"))
        .repartition(col("src")).write.parquet(s"$tmp/edges")
    }
    path
  }

  /** LIVE segment tags (markers outlive vacuumed segments). */
  private def segmentTags(path: String): Seq[String] =
    IndexScratch.fsListSubdirs(path)
      .filter(_.startsWith("post_"))
      .map(_.stripPrefix("post_")).sorted

  private def requireClean(path: String): Unit =
    require(!IndexScratch.fsExists(s"$path/_vacuum_inflight"),
      s"graph index at $path has a half-committed vacuum — restore the " +
        ".old dirs (rename-aside kept them) or rebuild the index")

  private def postDirs(path: String, tags: Seq[String]): Seq[String] =
    s"$path/post" +: tags.map(t => s"$path/post_$t")

  /** The stored posting: base ∪ live segments. */
  def posting(spark: SparkSession, path: String): DataFrame = {
    requireClean(path)
    postDirs(path, segmentTags(path)).map(spark.read.parquet(_))
      .reduce(_ unionByName _)
  }

  /** The searchable degree-M graph: base ∪ segments, re-cut per-src
    * top-M by (score desc, dst) — the merge-at-read law that keeps
    * segment appends from inflating any vertex's degree. */
  def edgesView(spark: SparkSession, path: String): DataFrame = {
    requireClean(path)
    val all = (s"$path/edges" +: segmentTags(path)
        .map(t => s"$path/edges_$t"))
      .map(spark.read.parquet(_)).reduce(_ unionByName _)
    Ann.graphEdgeCut(all.select(col("src"), col("dst"),
        col("score").as("_s")), VectorOps.GraphM)
      .select(col("src"), col("dst"))
  }

  /** Admit a NEW batch of vectors (exactly once per tag): post the batch
    * to the FROZEN centroids, score it against stored posting rows in
    * the lists it touches (plus itself), cut new→* and old→new edges to
    * M per source, and land both as sibling segments with
    * mode=overwrite. Batch vector ids must be new — duplicate ids would
    * give one vertex two embeddings and the probe two score rows. */
  def admit(spark: SparkSession, path: String, tag: String,
      batch: DataFrame, idCol: String, embCol: String): Boolean =
    IndexScratch.admitOnce(path, tag) {
      requireClean(path)
      // doc-disjointness guard, EXCLUDING the tag's own segment (a
      // crashed admit's replay must overwrite itself, not be refused)
      val others = postDirs(path, segmentTags(path).filter(_ != tag))
      val stored = others.map(spark.read.parquet(_)
        .select(col("vec_id"))).reduce(_ unionByName _).distinct()
      val dup = batch.select(col(idCol).cast("long").as("vec_id"))
        .distinct().join(stored, Seq("vec_id"), "left_semi")
      require(dup.isEmpty, s"graph admit '$tag' into $path: batch " +
        "carries vec ids already indexed — the probe would score " +
        "duplicate vertices; vacuum/rebuild or re-key the batch")
      // r15 ADVICE: the stored-segment guard above cannot see duplicate
      // ids WITHIN the batch itself — those would give one vertex two
      // embeddings and duplicate probe score rows just the same, so
      // refuse them with the same loudness (one 2-column aggregate over
      // the batch; the admit path is not hot)
      val batchDup = batch.groupBy(col(idCol).cast("long").as("vec_id"))
        .agg(count(lit(1)).as("_n")).filter(col("_n") > 1)
      require(batchDup.isEmpty, s"graph admit '$tag' into $path: batch " +
        "carries DUPLICATE vec ids within itself — one vertex would get " +
        "two embeddings; de-duplicate the batch before admission")
      val cents = spark.read.parquet(s"$path/cents")
        .select(col("cent_id").as("_cent_id"), col("cent").as("_cent"))
      val rankedNew = Ann.graphPost(cents, batch, idCol, embCol)
        .localCheckpoint(eager = true)
      // candidate side: stored posting restricted to the batch's lists
      val touched = rankedNew.select(col("_cent_id")).distinct()
      val storedTouched = others.map(spark.read.parquet(_))
        .reduce(_ unionByName _)
        .select(col("vec_id").as("_nid"), col("emb").as("_e"),
          col("cid").as("_cent_id"))
        .join(broadcast(touched), "_cent_id")
      val candSide = storedTouched.unionByName(
        rankedNew.select(col("_nid"), col("_e"), col("_cent_id")))
      val newOut = Ann.graphEdgeCut(
        Ann.graphBucketPairs(rankedNew, candSide), VectorOps.GraphM)
      val oldIn = Ann.graphEdgeCut(
        Ann.graphBucketPairs(storedTouched, rankedNew), VectorOps.GraphM)
      // WRITE ORDER IS LOAD-BEARING (session self-review): segment
      // liveness is keyed on post_<tag>, so edges land FIRST — a crash
      // between the two writes leaves only a stray edges_<tag> that no
      // read consults (invisible, replay overwrites it), whereas the
      // reverse order would leave a LIVE post segment whose missing
      // edge dir fails every probe until the replay arrives
      newOut.unionByName(oldIn)
        .select(col("src"), col("dst"), col("_s").as("score"))
        .write.mode("overwrite").parquet(s"$path/edges_$tag")
      rankedNew.select(col("_nid").as("vec_id"), col("_e").as("emb"),
          col("_cent_id").as("cid"), col("_rv").as("rv"))
        .write.mode("overwrite").parquet(s"$path/post_$tag")
    }

  /** Beam-search the stored graph: C117's fixed-hop search over the
    * merged (re-cut) edge view, entering at the frozen medoids, scoring
    * candidates against the stored vector store (posting rows rv=1 —
    * each vector exactly once). Over a fresh (un-admitted) index this
    * is bit-identical to `ann_graph_topk`. */
  def probe(spark: SparkSession, path: String, queries: DataFrame,
      idCol: String, embCol: String, k: Int = VectorOps.TopK,
      beam: Int = VectorOps.GraphBeam, hops: Int = VectorOps.GraphHops,
      entries: Int = VectorOps.GraphEntries): DataFrame = {
    requireClean(path)
    val cents = spark.read.parquet(s"$path/cents")
      .select(col("cent_id").as("_cent_id"), col("cent").as("_cent"))
    val medoids = spark.read.parquet(s"$path/medoids")
      .select(col("cent_id").as("_cent_id"), col("entry").as("_entry"))
    val vectors = posting(spark, path).filter(col("rv") === 1)
      .select(col("vec_id"), col("emb"))
    // the re-cut view is referenced once per hop — materialize it once
    val ev = edgesView(spark, path).localCheckpoint(eager = true)
    Ann.graphTopK(Ann.GraphIndex(cents, ev, medoids, VectorOps.GraphM),
      vectors, queries, idCol, embCol, k, beam, hops, entries)
  }

  /** VACUUM: fold posting segments into one base and MATERIALIZE the
    * edge read view as the new edge base — per-src top-M is already the
    * law every probe reads through, so probe-after ≡ probe-before by
    * construction. Commit is bracketed by an inflight marker (two swaps
    * + segment deletes are not jointly atomic); staging writes are
    * mode=overwrite so a pre-commit crash self-heals. Single-writer.
    * Returns (files_before, files_after) over both stored tables. */
  def vacuum(spark: SparkSession, path: String): (Long, Long) = {
    requireClean(path)
    val tags = segmentTags(path)
    val dirs = postDirs(path, tags) ++
      (s"$path/edges" +: tags.map(t => s"$path/edges_$t"))
    val before = dirs.map(Dedup.parquetFileCount(spark, _)).sum
    // re-score the view: the stored segments carry scores, the re-cut
    // drops none that the read view keeps (same heap, same ties)
    val allEdges = (s"$path/edges" +: tags.map(t => s"$path/edges_$t"))
      .map(spark.read.parquet(_)).reduce(_ unionByName _)
    Ann.graphEdgeCut(allEdges.select(col("src"), col("dst"),
        col("score").as("_s")), VectorOps.GraphM)
      .select(col("src"), col("dst"), col("_s").as("score"))
      .repartition(col("src"))
      .write.mode("overwrite").parquet(s"$path/edges.vacuum")
    posting(spark, path).repartition(col("cid"))
      .write.mode("overwrite").parquet(s"$path/post.vacuum")
    val inflight = s"$path/_vacuum_inflight"
    IndexScratch.fsMkdirs(inflight)
    Dedup.swapDir(spark, s"$path/edges.vacuum", s"$path/edges")
    Dedup.swapDir(spark, s"$path/post.vacuum", s"$path/post")
    // sweep ALL segment dirs, not just live tags: a crashed half-admit
    // leaves a stray edges_<tag> no read consults — vacuum is where it
    // gets collected
    IndexScratch.fsListSubdirs(path)
      .filter(d => d.startsWith("post_") || d.startsWith("edges_"))
      .foreach(d => IndexScratch.fsDeleteRec(s"$path/$d"))
    IndexScratch.fsDeleteRec(inflight)
    (before, (Seq(s"$path/post", s"$path/edges"))
      .map(Dedup.parquetFileCount(spark, _)).sum)
  }
}
