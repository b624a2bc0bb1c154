package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions._

/** Session extensions: registers graft's custom Catalyst expressions as SQL
  * functions, so `spark.sql(...)` users get the same surface as the Scala
  * `Column` API (graft.functions.vectors / textsketch).
  *
  * Usage: SparkSession.builder().withExtensions(new GraftExtensions) — done
  * by GraftSession.tune, or via
  * `spark.sql.extensions=graft.GraftExtensions` on a deployed cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo("graft", null, name, usage, "")

    ext.injectFunction((FunctionIdentifier("quantized_cosine"),
      info("quantized_cosine",
        "quantized_cosine(a, b) - engine-portable cosine over 1e-6-quantized array<double>"),
      (es: Seq[Expression]) => QuantizedCosine(es(0), es(1))))

    ext.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(a, b) - cosine over array<double>"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))))

    ext.injectFunction((FunctionIdentifier("quantized_l2sq"),
      info("quantized_l2sq",
        "quantized_l2sq(vec, qcentroid) - exact integer squared L2 vs a pre-quantized vector"),
      (es: Seq[Expression]) => QuantizedL2Sq(es(0), es(1))))

    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, n) - distinct word n-gram shingles"),
      (es: Seq[Expression]) => WordShingles(es(0), intArg(es(1), "n"))))

    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(shingles, k) - k-wide MinHash signature"),
      (es: Seq[Expression]) => MinHashSignature(es(0), intArg(es(1), "k"))))

    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash fingerprint"),
      (es: Seq[Expression]) => Simhash64(es(0))))

    ext.injectFunction((FunctionIdentifier("lsh_sign_buckets"),
      info("lsh_sign_buckets",
        "lsh_sign_buckets(vec, tables, bits, dim) - random-hyperplane LSH bucket ids"),
      (es: Seq[Expression]) => LshSignBuckets(es(0), intArg(es(1), "tables"),
        intArg(es(2), "bits"), intArg(es(3), "dim"), 42L)))

    ext.injectFunction((FunctionIdentifier("repetition_stats"),
      info("repetition_stats",
        "repetition_stats(text) - word/2-gram repetition counters (Gopher-style signals)"),
      (es: Seq[Expression]) => RepetitionStats(es(0))))

    ext.injectFunction((FunctionIdentifier("compress_ratio"),
      info("compress_ratio",
        "compress_ratio(text) - deflate compressed/raw size (redundancy signal)"),
      (es: Seq[Expression]) => CompressRatio(es(0))))

    ext.injectFunction((FunctionIdentifier("nfkd_fold"),
      info("nfkd_fold",
        "nfkd_fold(text) - NFKD decompose, strip combining marks, ROOT " +
          "lowercase (Unicode fold for normalization-aware dedup)"),
      (es: Seq[Expression]) => NfkdFold(es(0))))

    ext.injectFunction((FunctionIdentifier("top_k_by_score"),
      info("top_k_by_score",
        "top_k_by_score(score, id, k) - per-group best-k (score desc) via bounded heap"),
      (es: Seq[Expression]) => TopKByScore(es(0), es(1), intArg(es(2), "k"))
        .toAggregateExpression()))

    ext.injectFunction((FunctionIdentifier("hilbert_index"),
      info("hilbert_index",
        "hilbert_index(x, y, bits) - Hilbert-curve position of a normalized 2-D point"),
      (es: Seq[Expression]) => HilbertIndex(es(0), es(1), intArg(es(2), "bits"))))

    ext.injectFunction((FunctionIdentifier("hilbert_index3"),
      info("hilbert_index3",
        "hilbert_index3(x, y, z, bits) - Hilbert-curve position of a normalized 3-D point (Skilling walk)"),
      (es: Seq[Expression]) =>
        HilbertIndex3(es(0), es(1), es(2), intArg(es(3), "bits"))))

    ext.injectFunction((FunctionIdentifier("hilbert_index4"),
      info("hilbert_index4",
        "hilbert_index4(x, y, z, w, bits) - Hilbert-curve position of a normalized 4-D point (Skilling walk)"),
      (es: Seq[Expression]) =>
        HilbertIndex4(es(0), es(1), es(2), es(3), intArg(es(4), "bits"))))

    ext.injectFunction((FunctionIdentifier("common_prefix_length_at"),
      info("common_prefix_length_at",
        "common_prefix_length_at(w, pa, pb) - common-prefix length of the " +
          "suffixes of w at 0-based positions pa and pb (byte compare)"),
      (es: Seq[Expression]) => CommonPrefixLengthAt(es(0), es(1), es(2))))

    ext.injectFunction((FunctionIdentifier("heavy_hitters"),
      info("heavy_hitters",
        "heavy_hitters(item, k) - Misra-Gries top items with k counters"),
      (es: Seq[Expression]) => HeavyHitters(es(0), intArg(es(1), "k"))
        .toAggregateExpression()))

    // optimizer rule: band the unbanded Levenshtein filter (the O(k·n)
    // kernel + the free length lower bound, C97's hand discipline as a
    // plan rewrite — see graft.plans.BandedLevenshteinRewrite)
    ext.injectOptimizerRule(_ => graft.plans.BandedLevenshteinRewrite)
  }
}
