package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** SURVEY §2 block C (text): dedup + text-analysis operators over the
  * `documents` table — the training-data-pipeline surface.
  *
  * Scale notes (100 TB):
  *  - Everything here is either a pure map stage (C8–C11) or a single
  *    hash shuffle on a content-derived key (C1 hash groups, C4 shingle
  *    inverted index). No driver-side collection anywhere.
  *  - C4's shingle self-join is the exact-verification path; its cost is
  *    bounded by shingle document frequency. At corpus scale the candidate
  *    generation moves to MinHash-LSH (see Sketch.dedupMinhashLsh) and this
  *    operator verifies candidates only.
  *  - All rules are `Column` algebra (no UDFs) → WholeStageCodegen.
  */
object TextOps {

  /** Whitespace tokens of the trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct word n-gram shingles (default 3) — a row-granular custom
    * expression (see WordShingles): one tight-loop eval per document beats
    * the transform/array_distinct HOF chain, which interprets every
    * element lambda. */
  def shingles(text: Column, n: Int = 3): Column =
    graft.functions.textsketch.word_shingles(text, n)

  /** The dedup corpus: documents plus seeded EXACT duplicates (every 7th doc
    * re-inserted under a shifted id). The synthetic table has no exact dups,
    * so the operator's positive path is exercised deterministically.
    */
  /** The %7 exact-copy seeding over ANY (doc_id, text) frame — ONE
    * spelling shared by [[dedupCorpus]] and the streaming twins'
    * per-batch seeds (r14 self-review: the inline copies could
    * desynchronize a drain from the oracle it shares). */
  private[graft] def seededDups(d: DataFrame): DataFrame =
    d.unionAll(
      d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000000L).as("doc_id"), col("text")))

  def dedupCorpus(spark: SparkSession, dir: String): DataFrame =
    seededDups(
      Tables(spark, dir).documents.select(col("doc_id"), col("text")))

  private val dedupCorpusSql =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000000, text FROM documents WHERE doc_id % 7 = 0
      |)""".stripMargin

  // --- C1: exact dedup via content hash -----------------------------------
  /** One shuffle on the 256-bit content hash; partial aggregation does the
    * map-side combine, so at 100 TB each executor emits one row per local
    * distinct hash. Keeper = min(doc_id) is the deterministic survivor. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(dedupCorpus(spark, dir), "doc_id", "text")
      .orderBy(col("content_hash"))

  val dedupExactSql: String =
    s"""WITH $dedupCorpusSql
       |SELECT sha256(text) AS content_hash, COUNT(*) AS n_copies,
       |       MIN(doc_id) AS keeper_id
       |FROM corpus GROUP BY 1 ORDER BY 1""".stripMargin

  // --- C86: normalization-aware dedup --------------------------------------
  /** CCNet/RefinedWeb's normalize-BEFORE-dedup step as its own key: a
    * case-flipped or punctuation-noised copy is byte-distinct (C1's
    * sha256 groups miss it) but identical text to a reader; dedup must
    * run on the NORMALIZED form. Normalization = lowercase → strip
    * non-alphanumerics to spaces → collapse whitespace → trim (ASCII
    * spelling — both engines' lower/regexp agree; Unicode folding is a
    * locale-dependent deploy knob, out of oracle scope). The synthetic
    * corpus has no case/punct variants, so every doc_id % 11 == 0 doc
    * re-enters UPPERCASED with trailing punctuation noise (the C13/C1
    * injection discipline) — byte-distinct, normalization-equal: the
    * positive path is exercised and oracle-checked at every sf.
    *
    * Output per normalized group: md5 of the normal form, total
    * variants, how many are byte-DISTINCT (>1 = the rows C1 cannot
    * group), deterministic keeper. One shuffle on the normal-form hash
    * with map-side partials — C1's scale shape with a codegen'd
    * normalize in front; the count-distinct adds its two-phase partial
    * agg (3-exchange budget pinned). */
  private[graft] def normExpr(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** The normal form with the Unicode deploy knob IMPLEMENTED (r11
    * next-round #5): `unicode = true` runs the JDK NFKD fold
    * ([[graft.functions.NfkdFold]] — width/ligature decomposition,
    * combining-mark strip, ROOT lowercase) and then a UNICODE-aware
    * tail (`\p{L}\p{N}` instead of `a-z0-9`, so CJK/Cyrillic text keeps
    * its letters rather than normalizing to empty-string — which would
    * alias every non-Latin doc into one "duplicate" group). `Ｃafé!`
    * and `cafe` normalize equal. Spec-gated (DuckDB has no NFKD — the
    * oracle key stays on the ASCII form); NormFoldSpec pins the
    * variants the ASCII form misses. */
  def normFormOf(text: Column, unicode: Boolean = false): Column =
    if (unicode)
      trim(regexp_replace(regexp_replace(
        graft.functions.textsketch.nfkd_fold(text),
        "[^\\p{L}\\p{N}\\s]", " "), "\\s+", " "))
    else normExpr(text)

  def normCorpus(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents.select(col("doc_id"), col("text"))
    d.unionAll(
      d.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 700000000L).as("doc_id"),
          concat(upper(col("text")), lit(" !!")).as("text")))
  }

  def normDedup(spark: SparkSession, dir: String): DataFrame =
    normCorpus(spark, dir)
      .groupBy(md5(normExpr(col("text"))).as("norm_hash"))
      .agg(count(lit(1)).as("n_variants"),
        countDistinct(col("text")).as("n_byte_distinct"),
        min(col("doc_id")).as("keeper_id"))
      .orderBy(col("norm_hash"))

  /** The normalization spelling as SQL — shared by the C86 twin and the
    * C88 board so the normal form cannot fork. */
  private[operators] def normSqlExpr(c: String): String =
    s"trim(regexp_replace(regexp_replace(lower($c), " +
      "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"

  /** The %11 case/punct variant arm — ONE injection spelling shared by
    * the C86 twin and the C88 board corpus. */
  private[operators] val normVariantArmSql: String =
    """SELECT doc_id + 700000000, upper(text) || ' !!'
      |  FROM documents WHERE doc_id % 11 = 0""".stripMargin

  val normDedupSql: String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  $normVariantArmSql
       |)
       |SELECT md5(${normSqlExpr("text")}) AS norm_hash,
       |  COUNT(*) AS n_variants,
       |  COUNT(DISTINCT text) AS n_byte_distinct,
       |  MIN(doc_id) AS keeper_id
       |FROM corpus GROUP BY 1 ORDER BY 1""".stripMargin

  // --- C4: n-gram Jaccard near-dup pairs ----------------------------------
  val JaccardThreshold = 0.4

  /** The documents' exact Jaccard pairs, computed once per (session, sf):
    * C4 reports them and C17 consumes them as the survivorship edge list —
    * the similarity graph is a staging product, not a per-query
    * recomputation. */
  private val pairsCache = new graft.etl.CachedView((spark, dir) =>
    Dedup.ngramJaccardPairs(Tables(spark, dir).documents, "doc_id", "text",
      n = 3, threshold = JaccardThreshold))

  def jaccardPairs(spark: SparkSession, dir: String): DataFrame =
    pairsCache(spark, dir)

  /** Inverted-index exact Jaccard: explode distinct shingles, self-join on
    * the shingle (one shuffle keyed by shingle), count intersections, then
    * |A∪B| = |A|+|B|−|A∩B|. Integer-exact until the final division, so the
    * score is bit-identical across engines and partitionings. */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    jaccardPairs(spark, dir)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        col("intersection").as("inter"), col("size_a").as("na"),
        col("size_b").as("nb"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** The C4 pair chain over ANY (doc_id, text) table — shared by the C4
    * twin and the C88 board (one exact-Jaccard spelling). `bFilter`
    * mirrors Dedup.ngramJaccardPairs's sampleDenomB: an extra predicate
    * on the larger pair member (e.g. " AND b.doc_id % 4 = 0") for the
    * sampled C88b census twin. */
  def ngramJaccardSqlOver(sourceTable: String, bFilter: String = ""): String =
    s"""WITH sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks)-1),
       |         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
       |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
       |        FROM $sourceTable)
       |), sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id$bFilter
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, inter, CAST(sa.n AS INT) AS na, CAST(sb.n AS INT) AS nb,
       |       CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
       |FROM pairs
       |JOIN sizes sa ON doc_a = sa.doc_id
       |JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= $JaccardThreshold
       |ORDER BY doc_a, doc_b""".stripMargin

  val dedupNgramJaccardSql: String = ngramJaccardSqlOver("documents")

  // --- C113: exact Jaccard via prefix filtering ------------------------------
  /** [[JaccardThreshold]] as the exact rational the prefix bound needs
    * (float ⌈0.4·n⌉ can land one too high — an unsound shorter prefix). */
  val JaccardTNum = 2
  val JaccardTDen = 5

  /** C4's exact pair list through the SSJoin/PPJoin prefix filter
    * ([[Dedup.ngramJaccardPrefixPairs]]) — same output, same oracle
    * (the C94 hash-equality-as-algorithm-equivalence trick), strictly
    * smaller candidate set at scale: candidates key on each doc's
    * rare-first prefix shingles only, and verification joins by ID. */
  def dedupJaccardPrefix(spark: SparkSession, dir: String): DataFrame = {
    require(JaccardTNum.toDouble / JaccardTDen == JaccardThreshold,
      "prefix rational must equal the C4 threshold")
    Dedup.ngramJaccardPrefixPairs(Tables(spark, dir).documents,
        "doc_id", "text", n = 3, JaccardTNum, JaccardTDen)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        col("intersection").as("inter"), col("size_a").as("na"),
        col("size_b").as("nb"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // --- C44: exact-substring duplication stats ------------------------------
  /** Window width: long enough that a shared window means shared PASSAGES
    * (not a common phrase), short enough that the synthetic docs carry
    * many windows. Lee et al. use 50 BPE tokens on web text. */
  val SubstrW = 8

  /** Per-document duplicated-substring fraction over the seeded-dup corpus
    * (exact copies guarantee the positive path; natural near-dups add
    * partial overlaps). See [[Dedup.duplicatedWindowStats]]. */
  def substringDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.duplicatedWindowStats(dedupCorpus(spark, dir), "doc_id", "text",
        SubstrW)
      .orderBy(col("doc_id"))

  val substringDedupSql: String =
    s"""WITH $dedupCorpusSql,
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |         range(1, len(toks) - ${SubstrW - 2}),
       |         i -> array_to_string(toks[i:i+${SubstrW - 1}], ' ')))) AS s
       |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
       |        FROM corpus)
       |), df AS (SELECT s, COUNT(*) AS c FROM sh GROUP BY 1),
       |perdoc AS (
       |  SELECT sh.doc_id, COUNT(*) AS n_windows,
       |         SUM(CASE WHEN df.c > 1 THEN 1 ELSE 0 END) AS dup_windows
       |  FROM sh JOIN df USING (s) GROUP BY 1)
       |SELECT doc_id, n_windows, CAST(dup_windows AS BIGINT) AS dup_windows,
       |  CAST(dup_windows AS DOUBLE) / n_windows AS dup_frac
       |FROM perdoc ORDER BY doc_id""".stripMargin

  // --- C96: exact-substring SCRUB (the C44 removal companion) --------------
  /** Lee et al.'s ExactSubstr applied: every token covered by a
    * cross-document duplicated [[SubstrW]]-window is REMOVED from every
    * carrier over the same seeded-dup corpus as C44 (exact copies make
    * both members fully scrubbed — the deterministic positive path).
    * Output per doc: token counts and the scrubbed text itself, so the
    * oracle proves WHICH tokens survive, not just how many. */
  /** Driver key: the dup-window census PROBES the persisted SA index
    * (`SaIndex.dupWindows` — set-identical to `Dedup.dupWindowsOf`,
    * SaIndexSpec-pinned); only the scrub half runs per query. The
    * from-scratch census path stays exercised by C44's own key and the
    * On-operators' specs. */
  def substringScrub(spark: SparkSession, dir: String): DataFrame =
    Dedup.scrubWithDupWindows(
      SaIndex.dupWindows(spark,
        SaIndex.ensureWindowIndex(spark, dir, SubstrW)),
      dedupCorpus(spark, dir), "doc_id", "text", SubstrW)
      .orderBy(col("doc_id"))

  val substringScrubSql: String =
    s"""WITH $dedupCorpusSql,
       |tk AS (
       |  -- empties filtered after a raw split == Java trim-then-split
       |  -- for every whitespace edge (the Spark side's spelling)
       |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'),
       |           x -> x <> '') AS toks
       |  FROM corpus
       |), pw AS (
       |  SELECT doc_id, i, array_to_string(toks[i:i+${SubstrW - 1}], ' ') AS s
       |  FROM tk, unnest(range(1, len(toks) - ${SubstrW - 2})) t(i)
       |  WHERE len(toks) >= $SubstrW
       |), dfreq AS (
       |  SELECT s, COUNT(*) AS c
       |  FROM (SELECT DISTINCT doc_id, s FROM pw) GROUP BY 1
       |), starts AS (
       |  SELECT doc_id, list_sort(list(i)) AS ss
       |  FROM pw JOIN dfreq USING (s) WHERE c > 1 GROUP BY 1
       |), scrubbed AS (
       |  SELECT tk.doc_id, toks,
       |    list_transform(
       |      list_filter(range(1, len(toks) + 1),
       |        p -> len(list_filter(COALESCE(ss, []),
       |               s -> s <= p AND p <= s + ${SubstrW - 1})) = 0),
       |      p -> toks[p]) AS kept
       |  FROM tk LEFT JOIN starts USING (doc_id))
       |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(len(toks) - len(kept) AS BIGINT) AS n_removed,
       |  -- duckdb array_to_string([]) is NULL where Spark array_join
       |  -- gives '' — a fully-scrubbed doc must compare as empty text
       |  COALESCE(array_to_string(kept, ' '), '') AS scrubbed_text
       |FROM scrubbed ORDER BY doc_id""".stripMargin

  // --- C105: duplicated-span extraction --------------------------------------
  /** The merged duplicated-span intervals per document — C96's removal
    * plan made a first-class product (see
    * [[Dedup.dupSpansWithDupWindows]]); the per-corpus span list is what
    * an ExactSubstr deploy ships downstream so consumers can mask
    * without re-running the census. */
  /** Driver key: same probe-the-stored-census discipline as C96. */
  def dupSpans(spark: SparkSession, dir: String): DataFrame =
    Dedup.dupSpansWithDupWindows(
      SaIndex.dupWindows(spark,
        SaIndex.ensureWindowIndex(spark, dir, SubstrW)),
      dedupCorpus(spark, dir), "doc_id", "text", SubstrW)

  /** Twin: the C96 census CTEs + the gaps-and-islands merge. */
  val dupSpansSql: String =
    s"""WITH $dedupCorpusSql,
       |tk AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'),
       |           x -> x <> '') AS toks
       |  FROM corpus
       |), pw AS (
       |  SELECT doc_id, i, array_to_string(toks[i:i+${SubstrW - 1}], ' ') AS s
       |  FROM tk, unnest(range(1, len(toks) - ${SubstrW - 2})) t(i)
       |  WHERE len(toks) >= $SubstrW
       |), dfreq AS (
       |  SELECT s, COUNT(*) AS c
       |  FROM (SELECT DISTINCT doc_id, s FROM pw) GROUP BY 1
       |), st AS (
       |  SELECT pw.doc_id, pw.i FROM pw JOIN dfreq USING (s) WHERE c > 1
       |), isl AS (
       |  SELECT doc_id, i,
       |    SUM(CASE WHEN prev IS NULL OR i - prev > $SubstrW
       |        THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY i) AS island
       |  FROM (SELECT doc_id, i,
       |          LAG(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev
       |        FROM st))
       |SELECT doc_id, CAST(MIN(i) AS BIGINT) AS span_start,
       |  CAST(MAX(i) - MIN(i) + $SubstrW AS BIGINT) AS span_len
       |FROM isl GROUP BY doc_id, island
       |ORDER BY doc_id, span_start""".stripMargin

  // --- C8: token counting --------------------------------------------------
  /** Whitespace tokens + a BPE-ish regex segmentation (letter runs, digit
    * runs, punctuation runs). Pure map stage, codegen'd regex. */
  def textTokens(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents.select(
      col("doc_id"),
      length(col("text")).as("n_chars_measured"),
      size(tokens(col("text"))).as("ws_tokens"),
      TextAnalysis.regexTokenCount(col("text")).as("re_tokens"))
      .orderBy(col("doc_id"))

  val textTokensSql: String =
    """SELECT doc_id, CAST(LENGTH(text) AS INT) AS n_chars_measured,
      |  CAST(LEN(regexp_split_to_array(TRIM(text), '\s+')) AS INT) AS ws_tokens,
      |  CAST(LEN(regexp_extract_all(LOWER(text), '[a-z]+|[0-9]+|[^a-z0-9\s]+')) AS INT) AS re_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  // --- C9: quality scoring -------------------------------------------------
  val Stopwords = Seq("the", "a", "and", "of", "to", "in")

  /** C9's composite quality score over a text column — ONE spelling
    * shared by `text_quality` and C104's calibration (the normal-form
    * discipline: the two keys cannot fork the score). */
  private[operators] def qualityScoreExpr(text: Column): Column = {
    val t = tokens(text)
    val nWords = size(t)
    val stopRatio =
      TextAnalysis.stopwordCount(t, Stopwords).cast("double") / nWords
    least(nWords.cast("double") / 100.0, lit(1.0)) *
      (lit(1.0) - stopRatio * 0.5)
  }

  /** The same score as SQL over a (doc_id, text, …) table expression —
    * the twin spelling C104 composes into its calibration CTE. */
  private[operators] def qualityScoreSqlExpr: String = {
    val in = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""LEAST(CAST(LEN(regexp_split_to_array(TRIM(text), '\\s+')) AS DOUBLE)
       | / 100.0, 1.0) * (1.0 -
       | (CAST(LEN(list_filter(regexp_split_to_array(TRIM(text), '\\s+'),
       |   w -> w IN ($in))) AS DOUBLE)
       |  / LEN(regexp_split_to_array(TRIM(text), '\\s+'))) * 0.5)"""
      .stripMargin.replace("\n", "")
  }

  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val nWords = size(t)
    val nStop = TextAnalysis.stopwordCount(t, Stopwords)
    val nNonSpace = length(regexp_replace(col("text"), "\\s", ""))
    // All ratios are a single IEEE division of exact integers → identical
    // across engines; the composite score is a fixed chain of rounded ops.
    val stopRatio = nStop.cast("double") / nWords
    val awl = nNonSpace.cast("double") / nWords
    Tables(spark, dir).documents.select(
      col("doc_id"),
      nWords.as("n_words"),
      nStop.as("n_stopwords"),
      stopRatio.as("stop_ratio"),
      awl.as("avg_word_len"),
      qualityScoreExpr(col("text")).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  val textQualitySql: String = {
    val in = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""SELECT doc_id, CAST(n_words AS INT) AS n_words,
       |  CAST(n_stopwords AS INT) AS n_stopwords,
       |  CAST(n_stopwords AS DOUBLE) / n_words AS stop_ratio,
       |  CAST(n_nonspace AS DOUBLE) / n_words AS avg_word_len,
       |  LEAST(CAST(n_words AS DOUBLE) / 100.0, 1.0)
       |    * (1.0 - (CAST(n_stopwords AS DOUBLE) / n_words) * 0.5) AS quality_score
       |FROM (
       |  SELECT doc_id,
       |    LEN(toks) AS n_words,
       |    LEN(list_filter(toks, w -> w IN ($in))) AS n_stopwords,
       |    LENGTH(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace
       |  FROM (SELECT doc_id, text,
       |          regexp_split_to_array(TRIM(text), '\\s+') AS toks
       |        FROM documents))
       |ORDER BY doc_id""".stripMargin
  }

  // --- C104: cross-source score calibration ---------------------------------
  /** Rank-based calibration of quality scores ACROSS sources — the
    * mixing-time correction CCNet-style pipelines need: raw score
    * distributions differ per source (a "0.7" from a clean wiki dump and
    * a "0.7" from common crawl are not the same quality), so selecting a
    * global top-X% on raw scores silently reweights sources by their
    * scale. Calibrated score = the doc's rank WITHIN its source mapped
    * to [0, 1] ((rank−1)/(n−1), ties broken by doc_id for a total
    * order) — after calibration every source's distribution is uniform,
    * and a global threshold takes the same fraction from each. Emits the
    * exact rank rational (cal_num, cal_den) next to the IEEE quotient.
    *
    * Scale shape (exact gate path): the score is a codegen map; ONE
    * per-source window exchange (rank + count over hash(source)
    * partitions) + the gate sort. A skewed mega-source hot-spots that
    * window partition — `exact = false` is the deploy path (the B80
    * discipline): per-source approx-quantile thresholds
    * ([[ScoreCalibrateBands]] − 1 cut points, one partial-agg exchange
    * to an O(sources) board), broadcast, and a MAP-SIDE band lookup —
    * no per-source sort anywhere, so one mega-source costs the same per
    * row as every other source. The approx path emits the band rational
    * (band / [[ScoreCalibrateBands]]) in the same cal_num/cal_den/
    * calibrated columns; ScoreCalibrateApproxSpec pins its disagreement
    * against the exact rank map. */
  def scoreCalibrateOn(docs: DataFrame, idCol: String, srcCol: String,
      textCol: String, exact: Boolean = true): DataFrame = {
    val scored = docs.select(col(idCol).as("doc_id"),
      col(srcCol).as("source"),
      qualityScoreExpr(col(textCol)).as("quality_score"))
    if (exact) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
      scored
        .withColumn("rk", row_number().over(
          w.orderBy(col("quality_score"), col("doc_id"))))
        .withColumn("n", count(lit(1)).over(w))
        .select(col("doc_id"), col("source"), col("quality_score"),
          (col("rk") - 1).cast("long").as("cal_num"),
          (col("n") - 1).cast("long").as("cal_den"),
          when(col("n") === 1, lit(0.0))
            .otherwise((col("rk") - 1).cast("double") / (col("n") - 1))
            .as("calibrated"))
        .orderBy(col("doc_id"))
    } else {
      val k = ScoreCalibrateBands
      val th = scored.groupBy(col("source"))
        .agg(percentile_approx(col("quality_score"),
          array((1 until k).map(i => lit(i.toDouble / k)): _*),
          lit(10000)).as("_th"))
        .withColumnRenamed("source", "_src")
      // null-safe join: a NULL source is its own group in the exact
      // path's window, so the threshold board must serve it too — a
      // plain equi-join would silently drop every NULL-source doc
      scored.join(broadcast(th), col("source") <=> col("_src"))
        .drop("_src")
        // band = #cut points at or below the score — empirical-CDF
        // granularity 1/k, computed per row against the broadcast board
        .withColumn("_b",
          size(filter(col("_th"), t => t <= col("quality_score")))
            .cast("long"))
        .select(col("doc_id"), col("source"), col("quality_score"),
          col("_b").as("cal_num"), lit(k.toLong).as("cal_den"),
          (col("_b").cast("double") / k).as("calibrated"))
        .orderBy(col("doc_id"))
    }
  }

  /** Bands for the approx calibration path: 1/100 rank granularity,
    * matching the "global top-X%" selections the calibration feeds. */
  val ScoreCalibrateBands = 100

  def scoreCalibrate(spark: SparkSession, dir: String): DataFrame =
    scoreCalibrateOn(Tables(spark, dir).documents, "doc_id", "source",
      "text")

  /** Twin: the same score spelling (shared SQL builder) + the same
    * totally-ordered per-source rank map. */
  val scoreCalibrateSql: String =
    s"""WITH q AS (
       |  SELECT doc_id, source, $qualityScoreSqlExpr AS quality_score
       |  FROM documents
       |), r AS (
       |  SELECT doc_id, source, quality_score,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY quality_score, doc_id) AS rk,
       |    COUNT(*) OVER (PARTITION BY source) AS n
       |  FROM q)
       |SELECT doc_id, source, quality_score,
       |  CAST(rk - 1 AS BIGINT) AS cal_num,
       |  CAST(n - 1 AS BIGINT) AS cal_den,
       |  CASE WHEN n = 1 THEN 0.0
       |       ELSE CAST(rk - 1 AS DOUBLE) / (n - 1) END AS calibrated
       |FROM r ORDER BY doc_id""".stripMargin

  // --- C63: character-entropy quality signal -------------------------------
  /** Character-level Shannon entropy per document — the gibberish /
    * boilerplate detector quality filters pair with C21's compression
    * ratio (low entropy = repeated boilerplate; implausibly high =
    * random noise). One codegen'd pass per doc via the native
    * [[graft.functions.CharEntropyStats]] expression — a pure map stage,
    * zero shuffles before the gate sort, no per-char explode (the naive
    * spelling shuffles one row PER CHARACTER — terabytes of exchange at
    * corpus scale; the kernel keeps the histogram row-local).
    *
    * Parity: the kernel emits entropy as exact integer micro-nats
    * (`floor(n·ln n·1e6) − Σ floor(cnt·ln cnt·1e6)`, the LM quantization
    * discipline) so no raw libm double ever reaches the output; the final
    * value is one IEEE division chain over exact ints. */
  /** The per-doc entropy columns over any documents frame — a stateless
    * codegen map stage, so the SAME definition runs over a batch scan or
    * a streaming source (see StreamOps.streamEntropyGate). */
  def textEntropyOn(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"),
        graft.functions.textsketch.char_entropy_stats(col("text")).as("_e"))
      // empty text: the oracle's unnest yields no rows for it, and
      // 0/0 would emit NaN — drop it on this side too (parity)
      .filter(col("_e.n_chars") > 0)
      .select(col("doc_id"),
        col("_e.n_chars").as("n_chars"),
        col("_e.distinct_chars").as("distinct_chars"),
        (col("_e.hq").cast("double") / lit(1e6) /
          col("_e.n_chars").cast("double")).as("entropy_nats"))

  def textEntropy(spark: SparkSession, dir: String): DataFrame =
    textEntropyOn(Tables(spark, dir).documents).orderBy(col("doc_id"))

  val textEntropySql: String =
    """WITH c AS (
      |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
      |), g AS (
      |  SELECT doc_id, ch, COUNT(*) AS cnt FROM c GROUP BY 1, 2
      |), s AS (
      |  SELECT doc_id, SUM(cnt) AS n, COUNT(*) AS d,
      |    SUM(CAST(floor(CAST(cnt AS DOUBLE) * ln(CAST(cnt AS DOUBLE)) * 1e6)
      |        AS BIGINT)) AS sq
      |  FROM g GROUP BY 1)
      |SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
      |  CAST(d AS INT) AS distinct_chars,
      |  CAST(CAST(floor(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)) * 1e6)
      |       AS BIGINT) - sq AS DOUBLE) / 1e6 / CAST(n AS DOUBLE) AS entropy_nats
      |FROM s ORDER BY doc_id""".stripMargin

  // --- C10: language-ID heuristic ------------------------------------------
  /** Marker-token score matrix. The synthetic corpus shares one vocabulary,
    * so this pins the MECHANISM (per-language marker scoring + deterministic
    * argmax), not real-world language detection accuracy. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow"),
    "es" -> Seq("data", "row", "table"),
    "de" -> Seq("join", "merge", "group"),
    "fr" -> Seq("query", "filter", "sort"))

  /** The scored frame behind C10 — shared with C108's agreement board so
    * the two keys cannot fork the classifier. */
  private[graft] def langidScored(spark: SparkSession,
      dir: String): DataFrame = {
    val t = tokens(col("text"))
    val scores = LangMarkers.map { case (lang, ms) =>
      lang -> size(filter(t, w => w.isin(ms: _*)))
    }
    // deterministic argmax: fixed precedence order on ties
    val pred = scores.tail.foldLeft(
      (when(lit(true), scores.head._1), scores.head._2)) {
      case ((acc, best), (lang, s)) => (when(s > best, lang).otherwise(acc), greatest(best, s))
    }._1
    Tables(spark, dir).documents.select(
      Seq(col("doc_id"), col("lang").as("labeled_lang")) ++
        scores.map { case (l, s) => s.as(s"score_$l") } :+
        pred.as("pred_lang"): _*)
  }

  def textLangid(spark: SparkSession, dir: String): DataFrame =
    langidScored(spark, dir).orderBy(col("doc_id"))

  /** The classifier's SQL spelling — ONE builder shared by C10's and
    * C108's twins (the SQL mirror of the langidScored refactor: the two
    * oracles cannot fork the scoring either; self-review finding). */
  private lazy val langidScoreColsSql: String =
    LangMarkers.map { case (l, ms) =>
      s"CAST(LEN(list_filter(toks, w -> w IN (${ms.map(m => s"'$m'").mkString(", ")}))) AS INT) AS score_$l"
    }.mkString(",\n    ")

  /** Same fold as the Scala side: later language wins only on strictly
    * greater score. */
  private lazy val langidPredSql: String =
    LangMarkers.tail.foldLeft("'" + LangMarkers.head._1 + "'" -> s"score_${LangMarkers.head._1}") {
      case ((acc, best), (lang, _)) =>
        (s"CASE WHEN score_$lang > $best THEN '$lang' ELSE $acc END",
          s"GREATEST($best, score_$lang)")
    }._1

  val textLangidSql: String = {
    val scoreCols = langidScoreColsSql
    val pred = langidPredSql
    s"""SELECT doc_id, labeled_lang, ${LangMarkers.map(m => s"score_${m._1}").mkString(", ")},
       |  $pred AS pred_lang
       |FROM (
       |  SELECT doc_id, lang AS labeled_lang,
       |    $scoreCols
       |  FROM (SELECT doc_id, lang,
       |          regexp_split_to_array(TRIM(text), '\\s+') AS toks
       |        FROM documents))
       |ORDER BY doc_id""".stripMargin
  }

  // --- C108: classifier agreement board (Cohen's kappa) ---------------------
  /** Chance-corrected agreement between C10's predicted language and the
    * declared label — the classifier-eval board (confusion matrix +
    * Cohen's kappa) every curation pipeline needs before trusting a
    * heuristic scorer at 100 TB (raw accuracy lies when one class
    * dominates; kappa = (p_o − p_e)/(1 − p_e) corrects for the agreement
    * chance alone would produce; Cohen 1960). All counts and the
    * Σ row·col marginal product are EXACT guarded integers; accuracy and
    * kappa are one IEEE chain over them, spelled division-cleared:
    * kappa = (n·Σdiag − Σr·c)/(n² − Σr·c).
    *
    * Scale shape: one label-key partial agg to the O(langs²) confusion
    * board; marginals and totals are rollups OF the board; the two 1-row
    * summary frames broadcast back onto it — the corpus is scanned
    * once. */
  def agreementBoardOn(pairs: DataFrame, labelCol: String,
      predCol: String): DataFrame = {
    val conf = pairs
      .groupBy(col(labelCol).as("labeled_lang"), col(predCol).as("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .localCheckpoint(eager = true) // O(langs²) board, consumed 4×
    val rowM = conf.groupBy(col("labeled_lang").as("_l"))
      .agg(sum(col("n_docs")).as("_r"))
    val colM = conf.groupBy(col("pred_lang").as("_p"))
      .agg(sum(col("n_docs")).as("_c"))
    val rc = rowM.join(colM, col("_l") === col("_p"), "full_outer")
      .select((coalesce(col("_r"), lit(0L)).cast("decimal(18,0)") *
        coalesce(col("_c"), lit(0L)).cast("decimal(18,0)")).as("_rc"))
      .agg(graft.operators.Exact.guardedLong("langid_agreement")(
        sum(col("_rc")), "sum_rc").as("sum_rc"))
    val tot = conf.agg(sum(col("n_docs")).as("n_total"),
      sum(when(col("labeled_lang") === col("pred_lang"), col("n_docs"))
        .otherwise(0L)).as("n_agree"))
    val ntD = col("n_total").cast("double")
    val naD = col("n_agree").cast("double")
    val rcD = col("sum_rc").cast("double")
    conf.crossJoin(broadcast(tot)).crossJoin(broadcast(rc))
      .select(col("labeled_lang"), col("pred_lang"), col("n_docs"),
        col("n_total"), col("n_agree"), col("sum_rc"),
        (naD / ntD).as("accuracy"),
        when(ntD * ntD - rcD === 0.0, lit(null).cast("double"))
          .otherwise((ntD * naD - rcD) / (ntD * ntD - rcD)).as("kappa"))
      .orderBy(col("labeled_lang"), col("pred_lang"))
  }

  def langidAgreement(spark: SparkSession, dir: String): DataFrame =
    agreementBoardOn(langidScored(spark, dir), "labeled_lang", "pred_lang")

  /** Twin: the same scored subquery as C10, confusion rollup, full-outer
    * marginal product, and division-cleared kappa tree. */
  val langidAgreementSql: String = {
    val scoreCols = langidScoreColsSql
    val pred = langidPredSql
    s"""WITH scored AS (
       |  SELECT labeled_lang, $pred AS pred_lang
       |  FROM (
       |    SELECT doc_id, labeled_lang, $scoreCols
       |    FROM (SELECT doc_id, lang AS labeled_lang,
       |            regexp_split_to_array(TRIM(text), '\\s+') AS toks
       |          FROM documents))
       |), conf AS (
       |  SELECT labeled_lang, pred_lang, COUNT(*) AS n_docs
       |  FROM scored GROUP BY 1, 2
       |), rm AS (SELECT labeled_lang AS l, SUM(n_docs) AS r
       |          FROM conf GROUP BY 1),
       |cm AS (SELECT pred_lang AS p, SUM(n_docs) AS c FROM conf GROUP BY 1),
       |rc AS (
       |  SELECT CAST(SUM(CAST(COALESCE(r, 0) AS DECIMAL(18,0))
       |    * CAST(COALESCE(c, 0) AS DECIMAL(18,0))) AS BIGINT) AS sum_rc
       |  FROM rm FULL OUTER JOIN cm ON rm.l = cm.p
       |), tot AS (
       |  SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total,
       |    CAST(SUM(CASE WHEN labeled_lang = pred_lang THEN n_docs
       |      ELSE 0 END) AS BIGINT) AS n_agree
       |  FROM conf)
       |SELECT labeled_lang, pred_lang, n_docs, n_total, n_agree, sum_rc,
       |  CAST(n_agree AS DOUBLE) / CAST(n_total AS DOUBLE) AS accuracy,
       |  CASE WHEN CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)
       |      - CAST(sum_rc AS DOUBLE) = 0.0 THEN NULL
       |    ELSE (CAST(n_total AS DOUBLE) * CAST(n_agree AS DOUBLE)
       |        - CAST(sum_rc AS DOUBLE))
       |      / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)
       |        - CAST(sum_rc AS DOUBLE))
       |  END AS kappa
       |FROM conf CROSS JOIN tot CROSS JOIN rc
       |ORDER BY labeled_lang, pred_lang""".stripMargin
  }

  // --- C109: readability scoring ---------------------------------------------
  /** Flesch reading-ease per document — the readability axis of the
    * quality stack (C9 measures lexical hygiene, C63 entropy, C21
    * redundancy; none of them says "is this prose a child or a lawyer
    * wrote"). Syllables are vowel-group runs ([aeiouy]+) on the lowered
    * text — the standard cheap heuristic, declared; sentences are
    * [.!?]+ runs floored at 1. All three counts are exact integers; the
    * Flesch formula (206.835 − 1.015·words/sentences −
    * 84.6·syllables/words) is one IEEE tree over them, and the band
    * thresholds compare those identical doubles.
    *
    * Scale shape: a pure codegen map stage — zero exchanges before the
    * gate sort. */
  def textReadability(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_words"),
        greatest(lit(1L),
          regexp_count(col("text"), lit("[.!?]+")).cast("long"))
          .as("n_sentences"),
        regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long")
          .as("n_syllables"))
      .withColumn("flesch",
        lit(206.835)
          - lit(1.015) * (col("n_words").cast("double") /
            col("n_sentences").cast("double"))
          - lit(84.6) * (col("n_syllables").cast("double") /
            col("n_words").cast("double")))
      .withColumn("band",
        when(col("flesch") >= 60.0, lit("easy"))
          .when(col("flesch") >= 30.0, lit("standard"))
          .otherwise(lit("difficult")))
      .orderBy(col("doc_id"))

  /** Twin: the same counts and the same IEEE Flesch tree. */
  val textReadabilitySql: String =
    """SELECT doc_id,
      |  CAST(LEN(regexp_split_to_array(TRIM(text), '\s+')) AS BIGINT)
      |    AS n_words,
      |  GREATEST(1, CAST(LEN(regexp_extract_all(text, '[.!?]+'))
      |    AS BIGINT)) AS n_sentences,
      |  CAST(LEN(regexp_extract_all(LOWER(text), '[aeiouy]+')) AS BIGINT)
      |    AS n_syllables,
      |  206.835
      |    - 1.015 * (CAST(LEN(regexp_split_to_array(TRIM(text), '\s+'))
      |        AS DOUBLE)
      |      / CAST(GREATEST(1, CAST(LEN(regexp_extract_all(text, '[.!?]+'))
      |        AS BIGINT)) AS DOUBLE))
      |    - 84.6 * (CAST(LEN(regexp_extract_all(LOWER(text), '[aeiouy]+'))
      |        AS DOUBLE)
      |      / CAST(LEN(regexp_split_to_array(TRIM(text), '\s+'))
      |        AS DOUBLE)) AS flesch,
      |  CASE WHEN 206.835
      |    - 1.015 * (CAST(LEN(regexp_split_to_array(TRIM(text), '\s+'))
      |        AS DOUBLE)
      |      / CAST(GREATEST(1, CAST(LEN(regexp_extract_all(text, '[.!?]+'))
      |        AS BIGINT)) AS DOUBLE))
      |    - 84.6 * (CAST(LEN(regexp_extract_all(LOWER(text), '[aeiouy]+'))
      |        AS DOUBLE)
      |      / CAST(LEN(regexp_split_to_array(TRIM(text), '\s+'))
      |        AS DOUBLE)) >= 60.0 THEN 'easy'
      |  WHEN 206.835
      |    - 1.015 * (CAST(LEN(regexp_split_to_array(TRIM(text), '\s+'))
      |        AS DOUBLE)
      |      / CAST(GREATEST(1, CAST(LEN(regexp_extract_all(text, '[.!?]+'))
      |        AS BIGINT)) AS DOUBLE))
      |    - 84.6 * (CAST(LEN(regexp_extract_all(LOWER(text), '[aeiouy]+'))
      |        AS DOUBLE)
      |      / CAST(LEN(regexp_split_to_array(TRIM(text), '\s+'))
      |        AS DOUBLE)) >= 30.0 THEN 'standard'
      |  ELSE 'difficult' END AS band
      |FROM documents ORDER BY doc_id""".stripMargin

  // --- C11: document fingerprint -------------------------------------------
  /** Normalized-content hash: lowercase, collapse whitespace, md5. The
    * window count over the fingerprint shows duplicate groups without a
    * second scan. */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val fp = TextAnalysis.fingerprint(col("text"))
    Tables(spark, dir).documents
      .select(col("doc_id"), fp.as("fingerprint"))
      .withColumn("n_same", count(lit(1)).over(Window.partitionBy(col("fingerprint"))))
      .orderBy(col("doc_id"))
  }

  val docFingerprintSql: String =
    """SELECT doc_id,
      |  md5(regexp_replace(LOWER(TRIM(text)), '\s+', ' ', 'g')) AS fingerprint,
      |  COUNT(*) OVER (PARTITION BY md5(regexp_replace(LOWER(TRIM(text)), '\s+', ' ', 'g'))) AS n_same
      |FROM documents ORDER BY doc_id""".stripMargin

  // --- C110/C111: winnowed fingerprints (Schleimer et al., SIGMOD 2003) ----
  /** Gram width (chars on the sanitized charset), winnow window (grams),
    * and the gate slice (chars per doc — the ORACLE materializes every
    * gram string, so its window must stay bounded; the deploy path lifts
    * the bound, the selection math is length-free). Winnowing's
    * guarantee at these knobs: any shared substring of
    * k + w − 1 = 15 sanitized chars is DETECTED (both docs select a
    * shared gram hash from it), with expected fingerprint density
    * 2/(w+1) ≈ 0.22 of grams — the bounded-fingerprint property that
    * makes MOSS-style overlap detection shuffle O(selected), never
    * O(grams). */
  val WinnowK = 8
  val WinnowW = 8
  val WinnowChars = 128
  val WinnowMinShared = 3

  /** Over-represented-fingerprint cap for C111 (Schleimer et al. §5's
    * "too common" suppression, what MOSS does with boilerplate): a
    * winnowed hash carried by more than this many documents is
    * stop-gram noise ("the ", code headers), not evidence of copying —
    * and it is also the SCALE hazard: a hash with document frequency
    * df fans out df² pairs in the overlap join, so capping df bounds
    * the join at MaxDf × |fingerprints| — linear, corpus-size-proof.
    * First registration measured the uncapped board at 21 518 pairs
    * over 572 docs (avg 75 partners/doc — all stop-gram fanout). */
  val WinnowMaxDf = 16

  /** The selection core: per doc, the distinct winnow SITES as the
    * combined key `h·chars + (chars−1−pos)` — one integer carrying
    * (hash, position) with min() = (smallest hash, ties to the RIGHTMOST
    * position), the classic robust-winnowing tie-break, so the whole
    * per-window argmin is ONE MIN over a ROWS frame (engine-identical;
    * no struct ordering, no self-join). Hashes are the repo's 48-bit
    * md5-prefix integers, so `h·chars + pos` stays < 2⁵⁶ — exact BIGINT
    * in both engines. Only FULL windows select (the standard
    * definition); docs shorter than k + w − 1 sanitized chars have no
    * full window and drop out in both engines. */
  private[graft] def winnowSitesOn(docs: DataFrame, idCol: String,
      textCol: String, k: Int = WinnowK, w: Int = WinnowW,
      chars: Int = WinnowChars): DataFrame = {
    // cmb = h·chars + pos needs h·chars < 2⁶³: h < 2⁴⁸ ⇒ chars ≤ 2¹⁵ —
    // fail loudly, not as a silent wrapped MIN (the requireAdcDoubleExact
    // discipline; r14 self-review finding)
    require(chars <= (1 << 15),
      s"winnow: chars=$chars overflows the combined key (max ${1 << 15})")
    // lower BEFORE the strip: strip-first deletes uppercase chars
    // outright, so 'The cat' and 'the cat' would gram differently — the
    // case-variant copy is exactly what a fingerprint must catch (r14
    // self-review finding; the SQL twin mirrors the order)
    val s = substring(regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", ""),
      1, chars)
    val grams = docs
      .select(col(idCol).as("doc_id"), s.as("s"))
      .filter(length(col("s")) >= k + w - 1)
      .select(col("doc_id"), (length(col("s")) - (k - 1)).as("n_grams"),
        posexplode(expr(s"transform(sequence(1, length(s) - ${k - 1}), " +
          s"i -> substr(s, i, $k))")).as(Seq("p0", "gram")))
    val h = conv(substring(md5(col("gram")), 1, 12), 16, 10).cast("long")
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("p0"))
      .rowsBetween(0, w - 1)
    grams
      .select(col("doc_id"), col("n_grams"), col("p0"),
        (h * chars + (lit(chars - 1) - col("p0"))).as("cmb"))
      .withColumn("mw", min(col("cmb")).over(byPos))
      .filter(col("p0") <= col("n_grams") - w) // full windows only
      .select(col("doc_id"), col("n_grams"), col("mw")).distinct()
  }

  /** C110: the per-doc winnow fingerprint board — gram/window/selection
    * counts, density, and the mod-2⁶¹−1 fold of the DISTINCT selected
    * hashes (the position-free content signature C111 matches on).
    * Scale shape: one map-side gram explode + ONE doc-key window + two
    * doc-key rollups — the fingerprint table any plagiarism/overlap
    * pipeline stores is ~2/(w+1) of the gram stream. */
  /** Driver key: PROBES the persisted sites table ([[WinnowIndex]] —
    * the selection chain runs once per corpus state, r14). The stored
    * read is checkpointed: the products reference it several times, and
    * the checkpoint keeps each reference a plan LEAF (one scan, and the
    * guard budgets count the residual probe math, not re-derivations —
    * dropping it doubled the counted exchanges). */
  def winnowFingerprint(spark: SparkSession, dir: String): DataFrame =
    winnowFingerprintFrom(
      WinnowIndex.sites(spark, WinnowIndex.ensure(spark, dir))
        .localCheckpoint(eager = true))

  /** C110's board over ANY (doc_id, n_grams, mw) sites frame — shared
    * by the stored-index probe and the from-scratch spec path. */
  private[graft] def winnowFingerprintFrom(sel: DataFrame): DataFrame = {
    val sites = sel.groupBy(col("doc_id"))
      .agg(first(col("n_grams")).as("n_grams"),
        count(lit(1)).as("n_fp_sites"))
    val hashes = sel
      .select(col("doc_id"), expr(s"mw div $WinnowChars").as("h")).distinct()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fp_hashes"),
        graft.sources.Sinks.censusFingerprint(col("h")).as("fp_h"))
    sites.join(hashes, "doc_id")
      .select(col("doc_id"), col("n_grams").cast("long").as("n_grams"),
        (col("n_grams") - (WinnowW - 1)).cast("long").as("n_windows"),
        col("n_fp_sites"), col("n_fp_hashes"),
        (col("n_fp_sites").cast("double") /
          (col("n_grams") - (WinnowW - 1)).cast("double")).as("density"),
        col("fp_h"))
      .orderBy(col("doc_id"))
  }

  /** Shared CTE chain for the two winnow twins (one spelling). The gram
    * position column is `gp`, NOT `i` — hex12Sql's internal
    * list_transform lambda binds `i` and would SHADOW an outer `i`
    * column, silently hashing the same gram for every row (found as a
    * constant-hash board on first registration). */
  /** The winnow selection CTE chain over ANY (doc_id, text) relation,
    * with a CTE-name prefix so two instances (e.g. history + batch in
    * the B61 oracle) can coexist in one query. Emits `${p}sel` (the
    * sites) and `${p}hs` (the per-doc distinct hash board). */
  private[graft] def winnowHashCtesOver(src: String, p: String): String = {
    val hex = graft.operators.CorpusOps.hex12Sql(
      s"substr(md5(substr(s, CAST(gp + 1 AS INT), $WinnowK)), 1, 12)")
    s"""${p}d AS (
       |  SELECT doc_id,
       |    substr(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
       |           1, $WinnowChars) AS s
       |  FROM $src
       |), ${p}g AS (
       |  SELECT doc_id, length(s) - ${WinnowK - 1} AS n_grams,
       |    CAST(gp AS BIGINT) AS p0,
       |    $hex * $WinnowChars + (${WinnowChars - 1} - CAST(gp AS BIGINT))
       |      AS cmb
       |  FROM (SELECT doc_id, s, UNNEST(range(0, length(s) - ${WinnowK - 1}))
       |          AS gp
       |        FROM ${p}d WHERE length(s) >= ${WinnowK + WinnowW - 1})
       |), ${p}wmin AS (
       |  SELECT doc_id, n_grams, p0,
       |    MIN(cmb) OVER (PARTITION BY doc_id ORDER BY p0
       |      ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING) AS mw
       |  FROM ${p}g
       |), ${p}sel AS (
       |  SELECT DISTINCT doc_id, n_grams, mw
       |  FROM ${p}wmin WHERE p0 <= n_grams - $WinnowW
       |), ${p}hs AS (
       |  SELECT DISTINCT doc_id, mw // $WinnowChars AS h FROM ${p}sel
       |)""".stripMargin
  }

  private def winnowSelSql: String =
    s"""$dedupCorpusSql,
       |${winnowHashCtesOver("corpus", "")}""".stripMargin

  /** Twin: the same sanitized grams, combined-key window MIN, full-window
    * filter, and per-doc rollups. */
  val winnowFingerprintSql: String =
    s"""WITH $winnowSelSql,
       |sb AS (
       |  SELECT doc_id, ANY_VALUE(n_grams) AS n_grams, COUNT(*) AS n_fp_sites
       |  FROM sel GROUP BY doc_id
       |), hb AS (
       |  SELECT doc_id, COUNT(*) AS n_fp_hashes,
       |    ${graft.sources.Sinks.censusFingerprintSql("h")} AS fp_h
       |  FROM hs GROUP BY doc_id
       |)
       |SELECT sb.doc_id, CAST(sb.n_grams AS BIGINT) AS n_grams,
       |  CAST(sb.n_grams - ${WinnowW - 1} AS BIGINT) AS n_windows,
       |  sb.n_fp_sites, hb.n_fp_hashes,
       |  CAST(sb.n_fp_sites AS DOUBLE)
       |    / CAST(sb.n_grams - ${WinnowW - 1} AS DOUBLE) AS density,
       |  hb.fp_h
       |FROM sb JOIN hb ON sb.doc_id = hb.doc_id
       |ORDER BY sb.doc_id""".stripMargin

  /** C111: the MOSS-style overlap board — doc pairs sharing ≥
    * [[WinnowMinShared]] winnowed hashes, with the shared count. The
    * join keys are SELECTED hashes only (≈2/(w+1) of grams — the
    * winnowing point), so the shuffle is O(fingerprints); counts are
    * exact (each (doc, hash) row is distinct by construction). */
  /** The per-doc DISTINCT winnowed-hash board (doc_id, h) — the
    * position-free fingerprint table C111/B115 join on. */
  private[graft] def winnowHashes(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    winnowHashesFrom(winnowSitesOn(docs, idCol, textCol))

  /** The same board off an already-selected sites frame (the stored
    * index's probe spelling). */
  private[graft] def winnowHashesFrom(sites: DataFrame): DataFrame =
    sites.select(col("doc_id"), expr(s"mw div $WinnowChars").as("h"))
      .distinct()

  /** C111's read tail over ANY (doc_id, h) fingerprint frame — ONE
    * spelling of the df cap + pair count + threshold, shared by the
    * batch key, B115's drain merge, and the replay spec. The input must
    * already be per-doc distinct and checkpointed if it feeds both the
    * df board and the join lazily. */
  private[graft] def winnowOverlapFrom(hs0: DataFrame): DataFrame = {
    val hf = hs0.groupBy(col("h")).agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= WinnowMaxDf)
    val hs = hs0.join(hf.select(col("h")), "h")
    hs.as("a").join(hs.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= WinnowMinShared)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Driver key: PROBES the persisted sites table (checkpointed hash
    * board — it feeds the df census and both join sides). */
  def winnowOverlap(spark: SparkSession, dir: String): DataFrame =
    winnowOverlapFrom(winnowHashesFrom(
      WinnowIndex.sites(spark, WinnowIndex.ensure(spark, dir)))
      .localCheckpoint(eager = true))

  /** C115: the df-cap HONESTY census (r14 verdict #7) — [[WinnowMaxDf]]
    * silently drops overlap pairs whose shared hash is corpus-hot
    * (Schleimer et al. §5's "too common" suppression); this board says
    * HOW MUCH: hashes kept vs capped, and the exact pair-slots
    * (df·(df−1)/2, exact integers) each side of the cap carries — the
    * C88b sampled-census discipline applied to C111. One O(hashes)
    * rollup off the stored index; the suppressed count is the audit a
    * curation team reads before trusting the overlap board's recall. */
  def winnowDfCensus(spark: SparkSession, dir: String): DataFrame = {
    val pairSlots = expr("df * (df - 1) div 2") // df·(df−1) is even: exact
    winnowHashesFrom(
        WinnowIndex.sites(spark, WinnowIndex.ensure(spark, dir)))
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .agg(count(lit(1)).as("n_hashes"),
        sum(when(col("df") > WinnowMaxDf, 1L).otherwise(0L)).as("n_capped"),
        sum(when(col("df") > WinnowMaxDf, pairSlots).otherwise(0L))
          .as("pairs_suppressed"),
        sum(when(col("df") <= WinnowMaxDf, pairSlots).otherwise(0L))
          .as("pairs_kept"))
  }

  /** Twin: the shared selection chain + the same df rollup. The sums
    * re-cast to BIGINT — DuckDB SUM(BIGINT) is HUGEINT, which the
    * driver's hash canonicalizer rejects (the >18-digit decimal law). */
  val winnowDfCensusSql: String =
    s"""WITH $winnowSelSql,
       |hf AS (SELECT h, COUNT(*) AS df FROM hs GROUP BY h)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_hashes,
       |  CAST(SUM(CASE WHEN df > $WinnowMaxDf THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_capped,
       |  CAST(SUM(CASE WHEN df > $WinnowMaxDf THEN df * (df - 1) // 2
       |    ELSE 0 END) AS BIGINT) AS pairs_suppressed,
       |  CAST(SUM(CASE WHEN df <= $WinnowMaxDf THEN df * (df - 1) // 2
       |    ELSE 0 END) AS BIGINT) AS pairs_kept
       |FROM hf""".stripMargin

  /** C114: the MOSS matched-SPAN product off the winnow fingerprints —
    * for every C111 overlap pair, the merged character intervals each
    * side's matched fingerprints cover (what a plagiarism report
    * actually displays). A selected gram at pos covers
    * [pos, pos+k−1]; winnowing guarantees a fingerprint inside every
    * w-gram window, so a contiguous shared region's matched positions
    * sit ≤ w+k−1 apart — the island merge at that gap reconstructs the
    * maximal matched runs. All arithmetic rides the packed site key
    * (pos = chars−1 − mw mod chars, h = mw div chars — exact integers
    * in both engines).
    *
    * Scale shape: pairs come from the CAPPED overlap board; matched
    * positions are fingerprint-sparse (≈2/(w+1) of grams); the island
    * merge is ONE (pair, side)-key window. Nothing touches the gram
    * stream. */
  def winnowSpans(spark: SparkSession, dir: String): DataFrame =
    winnowSpansFrom(
      WinnowIndex.sites(spark, WinnowIndex.ensure(spark, dir))
        .localCheckpoint(eager = true))

  /** C114 over ANY sites frame (stored-index probe + spec path); the
    * input should be checkpointed — positions and the hash board both
    * read it, and the hash board itself feeds three consumers. */
  private[graft] def winnowSpansFrom(sites: DataFrame): DataFrame = {
    val posH = sites.select(col("doc_id"),
      (lit(WinnowChars - 1) - pmod(col("mw"), lit(WinnowChars))).as("pos"),
      expr(s"mw div $WinnowChars").as("h"))
    val hs0 = posH.select(col("doc_id"), col("h")).distinct()
      .localCheckpoint(eager = true)
    val pairs = winnowOverlapFrom(hs0).select(col("doc_a"), col("doc_b"))
    val hf = hs0.groupBy(col("h")).agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= WinnowMaxDf).select(col("h"))
    val hsk = hs0.join(hf, "h")
    val shared = pairs
      .join(hsk.select(col("doc_id").as("doc_a"), col("h")), "doc_a")
      .join(hsk.select(col("doc_id").as("doc_b"), col("h")),
        Seq("doc_b", "h"))
      .select(col("doc_a"), col("doc_b"), col("h"))
    val mpos = shared
      .join(posH.select(col("doc_id").as("doc_a"), col("h"), col("pos")),
        Seq("doc_a", "h"))
      .select(col("doc_a"), col("doc_b"), lit("a").as("side"), col("pos"))
      .unionAll(shared
        .join(posH.select(col("doc_id").as("doc_b"), col("h"), col("pos")),
          Seq("doc_b", "h"))
        .select(col("doc_a"), col("doc_b"), lit("b").as("side"),
          col("pos")))
      .distinct()
    val byPos = Window.partitionBy(col("doc_a"), col("doc_b"), col("side"))
      .orderBy(col("pos"))
    mpos.withColumn("_prev", lag(col("pos"), 1).over(byPos))
      .withColumn("_brk",
        when(col("_prev").isNull ||
          col("pos") - col("_prev") > WinnowW + WinnowK - 1, 1)
          .otherwise(0))
      .withColumn("_isl", sum(col("_brk")).over(byPos))
      .groupBy(col("doc_a"), col("doc_b"), col("side"), col("_isl"))
      .agg(min(col("pos")).as("_s0"), max(col("pos")).as("_s1"))
      .select(col("doc_a"), col("doc_b"), col("side"),
        col("_s0").cast("long").as("span_start"),
        (col("_s1") - col("_s0") + WinnowK).cast("long").as("span_len"))
      .orderBy(col("doc_a"), col("doc_b"), col("side"), col("span_start"))
  }

  /** Twin: the shared selection chain + the same pair/shared-hash joins
    * and gaps-and-islands merge. */
  val winnowSpansSql: String =
    s"""WITH $winnowSelSql,
       |hf AS (
       |  SELECT h FROM hs GROUP BY h HAVING COUNT(*) <= $WinnowMaxDf
       |), hk AS (
       |  SELECT hs.doc_id, hs.h FROM hs JOIN hf ON hs.h = hf.h
       |), pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM hk a JOIN hk b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |  HAVING COUNT(*) >= $WinnowMinShared
       |), ph AS (
       |  SELECT DISTINCT doc_id,
       |    ${WinnowChars - 1} - (mw % $WinnowChars) AS pos,
       |    mw // $WinnowChars AS h
       |  FROM sel
       |), shared AS (
       |  SELECT p.doc_a, p.doc_b, a.h
       |  FROM pairs p
       |  JOIN hk a ON a.doc_id = p.doc_a
       |  JOIN hk b ON b.doc_id = p.doc_b AND b.h = a.h
       |), mpos AS (
       |  SELECT DISTINCT doc_a, doc_b, 'a' AS side, ph.pos
       |  FROM shared JOIN ph ON ph.doc_id = shared.doc_a
       |   AND ph.h = shared.h
       |  UNION
       |  SELECT DISTINCT doc_a, doc_b, 'b' AS side, ph.pos
       |  FROM shared JOIN ph ON ph.doc_id = shared.doc_b
       |   AND ph.h = shared.h
       |), isl AS (
       |  SELECT doc_a, doc_b, side, pos,
       |    SUM(CASE WHEN prev IS NULL
       |             OR pos - prev > ${WinnowW + WinnowK - 1}
       |        THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_a, doc_b, side ORDER BY pos) AS isl
       |  FROM (SELECT doc_a, doc_b, side, pos,
       |          LAG(pos) OVER (PARTITION BY doc_a, doc_b, side
       |            ORDER BY pos) AS prev
       |        FROM mpos)
       |)
       |SELECT doc_a, doc_b, side,
       |  CAST(MIN(pos) AS BIGINT) AS span_start,
       |  CAST(MAX(pos) - MIN(pos) + $WinnowK AS BIGINT) AS span_len
       |FROM isl GROUP BY doc_a, doc_b, side, isl
       |ORDER BY doc_a, doc_b, side, span_start""".stripMargin

  /** Twin: the same df-capped selected-hash self-join. */
  val winnowOverlapSql: String =
    s"""WITH $winnowSelSql,
       |hf AS (
       |  SELECT h FROM hs GROUP BY h HAVING COUNT(*) <= $WinnowMaxDf
       |), hk AS (
       |  SELECT hs.doc_id, hs.h FROM hs JOIN hf ON hs.h = hf.h
       |)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
       |FROM hk a JOIN hk b ON a.h = b.h AND a.doc_id < b.doc_id
       |GROUP BY 1, 2
       |HAVING COUNT(*) >= $WinnowMinShared
       |ORDER BY doc_a, doc_b""".stripMargin

  // --- C21: compression-ratio quality signal (rows-only; TextOpsSpec) ------
  /** Deflate ratio per document plus a corpus-relative redundancy flag —
    * the CCNet-style signal that catches boilerplate/repetition lexical
    * filters miss. Pure map stage via the codegen'd CompressRatio
    * expression; no SQL twin (zlib is not available to the oracle), pinned
    * by spec instead. */
  def textCompressRatio(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      graft.functions.textsketch.compress_ratio(col("text")).as("compress_ratio"))
      .withColumn("is_redundant",
        (col("compress_ratio") < 0.35).cast("int"))
      .orderBy(col("doc_id"))

  /** Registry for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (dedupExact _),
    "text_compress_ratio" -> (textCompressRatio _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_jaccard_prefix" -> (dedupJaccardPrefix _),
    "text_tokens" -> (textTokens _),
    "text_quality" -> (textQuality _),
    "score_calibrate" -> (scoreCalibrate _),
    "text_entropy" -> (textEntropy _),
    "text_langid" -> (textLangid _),
    "langid_agreement" -> (langidAgreement _),
    "text_readability" -> (textReadability _),
    "doc_fingerprint" -> (docFingerprint _),
    "winnow_fingerprint" -> (winnowFingerprint _),
    "winnow_overlap" -> (winnowOverlap _),
    "winnow_df_census" -> (winnowDfCensus _),
    "winnow_spans" -> (winnowSpans _),
    "substring_dedup" -> (substringDedup _),
    "substring_scrub" -> (substringScrub _),
    "dup_spans" -> (dupSpans _),
    "norm_dedup" -> (normDedup _)
  )

  val oracles: Map[String, String] = Map(
    "dedup_exact" -> dedupExactSql,
    "dedup_ngram_jaccard" -> dedupNgramJaccardSql,
    "dedup_jaccard_prefix" -> dedupNgramJaccardSql,
    "text_tokens" -> textTokensSql,
    "text_quality" -> textQualitySql,
    "score_calibrate" -> scoreCalibrateSql,
    "text_entropy" -> textEntropySql,
    "text_langid" -> textLangidSql,
    "langid_agreement" -> langidAgreementSql,
    "text_readability" -> textReadabilitySql,
    "doc_fingerprint" -> docFingerprintSql,
    "winnow_fingerprint" -> winnowFingerprintSql,
    "winnow_overlap" -> winnowOverlapSql,
    "winnow_df_census" -> winnowDfCensusSql,
    "winnow_spans" -> winnowSpansSql,
    "substring_dedup" -> substringDedupSql,
    "substring_scrub" -> substringScrubSql,
    "dup_spans" -> dupSpansSql,
    "norm_dedup" -> normDedupSql
  )
}
