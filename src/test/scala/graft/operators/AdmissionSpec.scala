package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The persisted-index ADMISSION lifecycle (ensure → admit → probe), for
  * every index family: probe-after-admit must equal probe-against-a-full-
  * rebuild (sketch/fingerprint indexes, where the stored rows are
  * deterministic functions of the content), split-admission must equal
  * one-shot admission (IVF×PQ, where codebooks are frozen at build time),
  * admission must be idempotent per tag, and the admitted rows must
  * actually be FINDABLE by a probe — the property a build-once index loses
  * on the second ingest day.
  */
class AdmissionSpec extends SparkSpec {

  private def tmpIdx(name: String): String =
    new java.io.File(
      java.nio.file.Files.createTempDirectory(s"graft_adm_$name").toFile,
      "idx").getPath

  private def docs = Tables(spark, sfDir).documents
    .select(col("doc_id"), col("text"))

  test("minhash index: probe-after-admit == probe-against-full-rebuild") {
    val hist = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 500000000L).as("doc_id"), col("text"))
    // probes near-duplicate BATCH docs (one-token suffix), so hits on
    // admitted ids are guaranteed, plus history via shared-source overlap
    val probe = docs.filter(col("doc_id") % 6 === 0)
      .select((col("doc_id") + 600000000L).as("doc_id"),
        concat(col("text"), lit(" probing")).as("text"))
    val p1 = tmpIdx("mh1"); val p2 = tmpIdx("mh2")
    Dedup.dedupIndexBuild(hist, "doc_id", "text", p1)
    assert(Dedup.dedupIndexAdmit(p1, "t1", batch, "doc_id", "text"))
    Dedup.dedupIndexBuild(hist.unionAll(batch), "doc_id", "text", p2)
    def probeOf(p: String) =
      Dedup.dedupIndexProbe(spark, p, probe, "doc_id", "text")
        .orderBy(col("batch_id"), col("hist_id")).collect().toSeq
    val r1 = probeOf(p1)
    assert(r1.nonEmpty)
    assert(r1.exists(_.getLong(1) >= 500000000L),
      "no admitted doc surfaced — admission did not reach the index")
    assert(r1 === probeOf(p2))
    // idempotency: a replayed admission of the same tag is a no-op
    assert(!Dedup.dedupIndexAdmit(p1, "t1", batch, "doc_id", "text"))
    assert(probeOf(p1) === r1)
  }

  test("simhash index: probe-after-admit == probe-against-full-rebuild") {
    val hist = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 500000000L).as("doc_id"), col("text"))
    val probe = docs.filter(col("doc_id") % 6 === 0)
      .select((col("doc_id") + 600000000L).as("doc_id"),
        concat(col("text"), lit(" leaked")).as("text"))
    val p1 = tmpIdx("sh1"); val p2 = tmpIdx("sh2")
    Dedup.simhashIndexBuild(hist, "doc_id", "text", p1)
    assert(Dedup.simhashIndexAdmit(p1, "t1", batch, "doc_id", "text"))
    Dedup.simhashIndexBuild(hist.unionAll(batch), "doc_id", "text", p2)
    def probeOf(p: String) =
      Dedup.simhashIndexProbe(spark, p, probe, "doc_id", "text")
        .orderBy(col("batch_id"), col("hist_id")).collect().toSeq
    val r1 = probeOf(p1)
    assert(r1.nonEmpty)
    assert(r1.exists(_.getLong(1) >= 500000000L))
    assert(r1 === probeOf(p2))
    assert(!Dedup.simhashIndexAdmit(p1, "t1", batch, "doc_id", "text"))
    // C83 generalizes: the one band layout spelling means ONE vacuum
    // serves this family too — census shrinks, probe unchanged
    val (fb, fa) = Dedup.dedupIndexVacuum(spark, p1)
    assert(fa < fb, s"simhash vacuum did not compact: $fb -> $fa")
    assert(probeOf(p1) === r1, "simhash vacuum changed the probe")
  }

  test("phash index: probe-after-admit == probe-against-full-rebuild") {
    val hist = Multimodal.mediaTableOf(docs.filter(col("doc_id") % 3 =!= 0))
    val batch = Multimodal.mediaTableOf(docs.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 500000000L).as("doc_id"), col("text")))
    // sub-region suffix: most frame fingerprints survive, so probes must
    // surface their admitted sources through the banded index
    val probe = Multimodal.mediaTableOf(docs.filter(col("doc_id") % 6 === 0)
      .select((col("doc_id") + 600000000L).as("doc_id"),
        concat(col("text"), lit(" leaked")).as("text")))
    val p1 = tmpIdx("ph1"); val p2 = tmpIdx("ph2")
    Multimodal.phashIndexBuild(hist, p1)
    assert(Multimodal.phashIndexAdmit(p1, "t1", batch))
    Multimodal.phashIndexBuild(hist.unionAll(batch), p2)
    def probeOf(p: String) =
      Multimodal.phashIndexProbe(spark, p, probe)
        .orderBy(col("batch_id"), col("hist_id")).collect().toSeq
    val r1 = probeOf(p1)
    assert(r1.nonEmpty)
    assert(r1.exists(_.getLong(1) >= 500000000L))
    assert(r1 === probeOf(p2))
    assert(!Multimodal.phashIndexAdmit(p1, "t1", batch))
    // C83 generalizes to the media family through the same band layout
    val (fb, fa) = Dedup.dedupIndexVacuum(spark, p1)
    assert(fa < fb, s"phash vacuum did not compact: $fb -> $fa")
    assert(probeOf(p1) === r1, "phash vacuum changed the probe")
  }

  test("ivfpq index: frozen-codebook admission — split == one-shot, " +
      "occupancy accounts for admitted rows, admitted vectors findable") {
    import spark.implicits._
    val corpus = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val hist = corpus.filter(col("vec_id") % 4 =!= 0)
    val b1 = corpus.filter(col("vec_id") % 8 === 0)
    val b2 = corpus.filter(col("vec_id") % 4 === 0 && col("vec_id") % 8 =!= 0)
    val p1 = tmpIdx("pq1"); val p2 = tmpIdx("pq2")
    // identical build inputs → identical frozen centroids/codebooks
    Ann.ivfPqBuild(hist, "vec_id", "emb", 64, nLists = 16, p1)
    Ann.ivfPqBuild(hist, "vec_id", "emb", 64, nLists = 16, p2)
    assert(Ann.ivfPqAdmit(spark, p1, "b1", b1, "vec_id", "emb", 64))
    assert(Ann.ivfPqAdmit(spark, p1, "b2", b2, "vec_id", "emb", 64))
    assert(Ann.ivfPqAdmit(spark, p2, "all", b1.unionAll(b2),
      "vec_id", "emb", 64))
    val queries = corpus.filter(col("vec_id") % 50 === 0)
    def topOf(p: String) =
      Ann.ivfPqTopK(spark, p, queries, "vec_id", "emb", 64, 10, nProbe = 4)
        .orderBy(col("query_id"), col("rank")).collect().toSeq
    val r1 = topOf(p1)
    assert(r1.nonEmpty)
    assert(r1 === topOf(p2), "split admission diverged from one-shot")
    // the C68 occupancy invariants re-checked over the ADMITTED index:
    // every vector (history + both batches) in exactly one list
    val lists = spark.read.parquet(s"$p1/lists")
    val total = corpus.count()
    assert(lists.count() === total)
    assert(lists.select("neighbor_id").distinct().count() === total)
    // a just-admitted vector is findable: probing with its own embedding
    // ranks it first (exact quantized self-cosine = 1, the max)
    val adm = b1.orderBy(col("vec_id")).limit(1).collect()(0)
    val qdf = Seq((-1L, adm.getSeq[Double](1)))
      .toDF("vec_id", "emb")
    val top = Ann.ivfPqTopK(spark, p1, qdf, "vec_id", "emb", 64, 1,
      nProbe = 4).collect()
    assert(top.nonEmpty && top.head.getLong(1) === adm.getLong(0),
      "admitted vector not retrieved by its own embedding")
    // idempotency: replayed tag appends nothing
    assert(!Ann.ivfPqAdmit(spark, p1, "b1", b1, "vec_id", "emb", 64))
    assert(spark.read.parquet(s"$p1/lists").count() === total)

    // --- C83: VACUUM the admitted index (the maintenance verb) ---
    // two admits fragmented the lists; vacuum must strictly shrink the
    // file census, leave every row in place, and change NO ranking
    val (fb, fa) = Ann.ivfPqVacuum(spark, p1)
    assert(fa < fb, s"vacuum did not compact: $fb -> $fa files")
    val lv = spark.read.parquet(s"$p1/lists")
    assert(lv.count() === total)
    assert(lv.select("neighbor_id").distinct().count() === total)
    assert(topOf(p1) === r1, "vacuum changed the ranking")
    // one file per list — the writeKeyBinned-style contract
    assert(fa === lv.select("list_id").distinct().count())
  }

  test("minhash index: vacuum compacts the admitted bands, probe unchanged (C83)") {
    val hist = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 500000000L).as("doc_id"), col("text"))
    val probe = docs.filter(col("doc_id") % 6 === 0)
      .select((col("doc_id") + 600000000L).as("doc_id"),
        concat(col("text"), lit(" probing")).as("text"))
    val p = tmpIdx("vac")
    Dedup.dedupIndexBuild(hist, "doc_id", "text", p)
    assert(Dedup.dedupIndexAdmit(p, "t1", batch, "doc_id", "text"))
    def probeOf = Dedup.dedupIndexProbe(spark, p, probe, "doc_id", "text")
      .orderBy(col("batch_id"), col("hist_id")).collect().toSeq
    def bandRows = spark.read.parquet(s"$p/bands")
      .select(col("_id"), col("_bkt")).collect()
      .map(_.toString).sorted.toSeq
    val (before, rows0) = (probeOf, bandRows)
    val (fb, fa) = Dedup.dedupIndexVacuum(spark, p)
    assert(fa < fb, s"vacuum did not compact: $fb -> $fa files")
    // content-preserving: same band rows, same probe result
    assert(bandRows === rows0)
    assert(probeOf === before)
    // admission markers survive vacuum (a replay still cannot double-admit)
    assert(!Dedup.dedupIndexAdmit(p, "t1", batch, "doc_id", "text"))
  }
}
