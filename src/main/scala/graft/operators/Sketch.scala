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

  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(Tables(spark, dir).documents, "doc_id", "text",
        shingleN = 3, numHashes = NumHashes, bands = Bands,
        minEstJaccard = MinEstJaccard)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("est_jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))

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
    Dedup.simhashPairs(Tables(spark, dir).documents, "doc_id", "text",
        bandBits = SimhashBandBits, maxHamming = MaxHamming)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Registry for SparkEntry — both rows-only (see SketchSpec). */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_minhash_lsh" -> (dedupMinhashLsh _),
    "dedup_simhash" -> (dedupSimhash _)
  )
}
