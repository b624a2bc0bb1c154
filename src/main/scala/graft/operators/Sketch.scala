package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** SURVEY §2 C2/C3: sketch-based near-duplicate detection — the 100 TB
  * candidate-generation path where exact pairwise comparison (TextOps C4)
  * is no longer feasible.
  *
  * Both sketches are computed per-row (MinHash) or with one partial-agg
  * shuffle (SimHash); candidate pairing is a hash self-join keyed by band
  * bucket, so all-pairs cost never materializes. These are rows-only for
  * the driver (their outputs depend on sketch parameters); their quality
  * contracts — minhash estimates Jaccard, near-dups collide, hamming
  * bounds — are pinned by SketchSpec.
  */
object Sketch {

  // --- C2: MinHash + LSH banding ------------------------------------------
  val NumHashes = 64
  val Bands = 16 // 16 bands × 4 rows
  val RowsPerBand: Int = NumHashes / Bands
  val MinEstJaccard = 0.35

  /** 64-permutation MinHash signature of the shingle set — computed fully
    * map-side (no shuffle) by a single-pass custom expression: one byte
    * hash per shingle + 64 splitmix derivations (one-permutation MinHash
    * family). */
  def minhashSig(sh: Column): Column =
    graft.functions.textsketch.minhash_signature(sh, NumHashes)

  /** Band keys: hash RowsPerBand consecutive signature slots per band and
    * tag the band index into the high bits (disjoint bucket key spaces). */
  def bandKeys(sig: Column): Column =
    array((0 until Bands).map { b =>
      val slots = (0 until RowsPerBand).map(r => element_at(sig, b * RowsPerBand + r + 1))
      xxhash64(lit(b) +: slots: _*)
    }: _*)

  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sigs = Tables(spark, dir).documents
      .select(col("doc_id"), TextOps.shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), minhashSig(col("sh")).as("sig"))
    val bucketed = sigs.select(col("doc_id"), col("sig"),
      explode(bandKeys(col("sig"))).as("bkt"))
    val cands = bucketed.as("a").join(bucketed.as("b"),
        col("a.bkt") === col("b.bkt") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
    cands
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / NumHashes)
      .filter(col("est_jaccard") >= MinEstJaccard)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // --- C3: SimHash 64-bit fingerprints ------------------------------------
  // 8 bands × 8 bits: any pair within hamming distance 7 leaves at least
  // one band untouched (pigeonhole), so recall at MaxHamming=6 is GUARANTEED,
  // not probabilistic. Band width is the recall/candidate-volume knob at
  // scale: fewer, wider bands cut candidates but cap the recallable radius.
  val SimhashBands = 8
  val SimhashBandBits = 8
  val MaxHamming = 6

  /** Per-document 64-bit SimHash: token hash sign-sums per bit position.
    * Fully map-side via the Simhash64 expression — no explode, no shuffle:
    * the sign-sum loop runs inside one per-row eval. */
  def simhashes(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"),
        graft.functions.textsketch.simhash64(TextOps.tokens(col("text"))).as("simhash"))

  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val fps = simhashes(spark, dir)
    // band the 64-bit fingerprint into 8 × 8-bit chunks (see SimhashBands)
    val bucketed = fps.select(col("doc_id"), col("simhash"),
      explode(array((0 until SimhashBands).map { j =>
        lit(j.toLong << 16).bitwiseOR(
          shiftrightunsigned(col("simhash"), j * SimhashBandBits)
            .bitwiseAND((1L << SimhashBandBits) - 1))
      }: _*)).as("bkt"))
    // The hamming filter runs BEFORE pair dedup: candidate volume is
    // quadratic in bucket size (skewed fingerprint distributions produce hot
    // buckets), but the filter is a codegen'd map over the join output, so
    // only the few true near-dups ever reach a shuffle. At corpus scale,
    // oversized buckets additionally get salted/length-capped upstream.
    bucketed.as("a").join(bucketed.as("b"),
        col("a.bkt") === col("b.bkt") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= MaxHamming)
      .dropDuplicates("doc_a", "doc_b")
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Registry for SparkEntry — both rows-only (see SketchSpec). */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_minhash_lsh" -> (dedupMinhashLsh _),
    "dedup_simhash" -> (dedupSimhash _)
  )
}
