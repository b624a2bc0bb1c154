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

  /** Band keys: (band index, RowsPerBand consecutive signature slots) as an
    * exact struct tuple — candidacy is precisely "shares >= 1 band". */
  def bandKeys(sig: Column): Column =
    array((0 until Bands).map { b =>
      struct(lit(b).as("b") +: (0 until RowsPerBand).map(r =>
        element_at(sig, b * RowsPerBand + r + 1).as(s"s$r")): _*)
    }: _*)

  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame =
    // one small parquet file = one input split: spread rows across cores so
    // the (map-side) sketching parallelizes. A cluster-scale corpus already
    // has thousands of splits — there this exchange is skippable.
    Dedup.minhashLshPairs(
      Tables(spark, dir).documents.repartition(col("doc_id")), "doc_id", "text",
        shingleN = 3, numHashes = NumHashes, bands = Bands,
        minEstJaccard = MinEstJaccard)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("est_jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))

  // --- C97: edit-distance near-dup (banded Levenshtein verify) ------------
  /** Max edit distance for a C97 near-dup pair — also the Ukkonen band
    * width of the verify DP. */
  val MaxEditDist = 16

  /** Edit-distance near-duplicate pairs: C2's MinHash-LSH band join
    * proposes candidates (bucketed, never all-pairs) and each candidate
    * verifies under Spark's BANDED Levenshtein (`levenshtein(l, r, k)`:
    * the O(k·n) banded DP that answers -1 past the band, so a far pair
    * costs O(k·n), never O(n·m)). The |len_a − len_b| ≤ k guard runs
    * inside a `when`, which is both the Levenshtein length lower bound
    * and the switch that keeps the DP entirely off those pairs.
    *
    * Scale shape: candidacy is C2's audited band join (O(colliding
    * buckets)); the text join-back is two id-key equi-joins carrying
    * O(candidates) rows; the verify is a per-row codegen'd scalar. At
    * 100 TB the DP never sees a non-candidate pair — the quadratic
    * string kernel rides the linear sketch index. */
  /** The candidate→verify composition over any `docs(idCol, textCol)` —
    * split out so specs can drive seeded corpora through the EXACT
    * production path. */
  def editDistancePairsOn(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = MaxEditDist): DataFrame = {
    val txt = docs.select(col(idCol), col(textCol))
    Dedup.minhashLshPairs(docs, idCol, textCol,
        shingleN = 3, numHashes = NumHashes, bands = Bands,
        minEstJaccard = MinEstJaccard)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      .join(txt.select(col(idCol).as("doc_a"), col(textCol).as("ta")), "doc_a")
      .join(txt.select(col(idCol).as("doc_b"), col(textCol).as("tb")), "doc_b")
      .withColumn("edit_dist",
        when(abs(length(col("ta")) - length(col("tb"))) <= maxDist,
          levenshtein(col("ta"), col("tb"), maxDist)).otherwise(lit(-1)))
      .filter(col("edit_dist") >= 0)
      .select(col("doc_a"), col("doc_b"),
        col("edit_dist").cast("long").as("edit_dist"))
  }

  def dedupEditDistance(spark: SparkSession, dir: String): DataFrame =
    // C2's input spread: one small parquet file = one split at gate scale
    editDistancePairsOn(
      Tables(spark, dir).documents.repartition(col("doc_id")),
      "doc_id", "text")
      .orderBy(col("doc_a"), col("doc_b"))

  /** Twin: the SAME candidate CTE chain as C2 (one definition of
    * candidacy), then DuckDB's full-DP `levenshtein` under the same
    * length guard — Spark's banded DP reports the EXACT distance for
    * every pair within the band, so the spellings agree wherever a pair
    * survives the ≤ k filter. */
  val dedupEditDistanceSql: String =
    s"""WITH ${minhashCandidateCtes("documents")},
       |pairs AS (
       |  SELECT doc_a, doc_b
       |  FROM cand
       |  JOIN sg sa ON doc_a = sa.doc_id
       |  JOIN sg sb ON doc_b = sb.doc_id
       |  WHERE len(list_filter(list_zip(sa.sig, sb.sig), p -> p[1] = p[2]))
       |        / $NumHashes.0 >= $MinEstJaccard
       |)
       |SELECT doc_a, doc_b,
       |  CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist
       |FROM pairs
       |JOIN documents da ON doc_a = da.doc_id
       |JOIN documents db ON doc_b = db.doc_id
       |WHERE abs(len(da.text) - len(db.text)) <= $MaxEditDist
       |  AND levenshtein(da.text, db.text) <= $MaxEditDist
       |ORDER BY doc_a, doc_b""".stripMargin

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

  /** The minhash-LSH candidate CTE chain (shingles → md5-prefix
    * fingerprints → 64 affine-mod-M61 hashes → signatures → band buckets →
    * distinct colliding pairs) over `sourceTable(doc_id, text)`. Shared by
    * [[dedupMinhashLshSql]] and Pipeline.curatePipelineSql so both engines
    * AND both queries use one definition of candidacy. */
  def minhashCandidateCtes(sourceTable: String): String = {
    import graft.functions.SketchHash.{AffineA, AffineB, M61}
    val permRows = (0 until NumHashes)
      .map(j => s"($j, ${AffineA(j)}, ${AffineB(j)})").mkString(", ")
    s"""sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks)-1),
       |         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
       |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
       |        FROM $sourceTable)
       |), fp AS (
       |  SELECT doc_id, CAST(list_sum(list_transform(range(1, 15),
       |         i -> (strpos('0123456789abcdef', substr(md5(s), i, 1)) - 1)::BIGINT
       |              << (4 * (14 - i)))) AS BIGINT) AS fp
       |  FROM sh
       |), perm(j, a, b) AS (VALUES $permRows),
       |hv AS (
       |  SELECT doc_id, j, MIN(CAST((a::HUGEINT * fp + b) % $M61 AS BIGINT)) AS h
       |  FROM fp CROSS JOIN perm GROUP BY 1, 2
       |), sg AS (SELECT doc_id, list(h ORDER BY j) AS sig FROM hv GROUP BY 1),
       |bands AS (
       |  SELECT doc_id, b,
       |         CAST(sig[$RowsPerBand*b+1 : $RowsPerBand*b+$RowsPerBand] AS VARCHAR) AS slot
       |  FROM sg, range(0, $Bands) t(b)
       |), cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.b = y.b AND x.slot = y.slot AND x.doc_id < y.doc_id
       |)""".stripMargin
  }

  /** DuckDB twin of [[dedupMinhashLsh]] — possible because the MinHash
    * family is engine-portable by design (SketchHash: md5-prefix
    * fingerprints + affine maps mod M61, exact in HUGEINT arithmetic).
    * The affine coefficients are spliced from the SAME Scala constants the
    * expression uses, so the two engines share one definition. */
  def minhashPairsSqlOver(sourceTable: String): String =
    s"""WITH ${minhashCandidateCtes(sourceTable)}
       |SELECT doc_a, doc_b,
       |  len(list_filter(list_zip(sa.sig, sb.sig), p -> p[1] = p[2])) / $NumHashes.0
       |    AS est_jaccard
       |FROM cand
       |JOIN sg sa ON doc_a = sa.doc_id
       |JOIN sg sb ON doc_b = sb.doc_id
       |WHERE len(list_filter(list_zip(sa.sig, sb.sig), p -> p[1] = p[2]))
       |      / $NumHashes.0 >= $MinEstJaccard
       |ORDER BY doc_a, doc_b""".stripMargin

  val dedupMinhashLshSql: String = minhashPairsSqlOver("documents")

  /** The simhash fingerprint CTE chain (tokens → md5-prefix signed-64
    * hashes → per-bit sign sums → fingerprint) over `sourceTable(doc_id,
    * text)`, ending in `fps(doc_id, fp)`. Shared by [[dedupSimhashSql]]
    * and CorpusOps.decontaminateSimhashSql so both engines AND both
    * queries use one fingerprint definition. */
  def simhashFpCtes(sourceTable: String): String = {
    // fp64 = first 16 md5 hex chars as unsigned 128-bit sum (positional
    // nibble * 16^(16-i) literals), wrapped to signed 64-bit
    val nibbleTerms = (1 to 16).map { i =>
      s"(strpos('0123456789abcdef', substr(m, $i, 1)) - 1)::HUGEINT * ${BigInt(16).pow(16 - i)}"
    }.mkString(" + ")
    val pow2Rows = (0 until 64).map(b => s"($b, ${BigInt(2).pow(b)})").mkString(", ")
    s"""tk AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
       |  FROM $sourceTable
       |), th AS (
       |  SELECT doc_id,
       |    CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
       |              THEN u - 18446744073709551616::HUGEINT ELSE u END AS BIGINT) AS h
       |  FROM (SELECT doc_id, $nibbleTerms AS u
       |        FROM (SELECT doc_id, md5(w) AS m FROM tk))
       |), bits AS (
       |  SELECT doc_id, b,
       |    CASE WHEN SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) > 0
       |         THEN 1 ELSE 0 END AS bit
       |  FROM th CROSS JOIN range(0, 64) t(b) GROUP BY 1, 2
       |), pw(b, p) AS (VALUES $pow2Rows),
       |fps AS (
       |  SELECT doc_id,
       |    CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
       |              THEN u - 18446744073709551616::HUGEINT ELSE u END AS BIGINT) AS fp
       |  FROM (SELECT bits.doc_id, SUM(bit::HUGEINT * p) AS u
       |        FROM bits JOIN pw ON bits.b = pw.b GROUP BY 1)
       |)""".stripMargin
  }

  /** DuckDB twin of [[dedupSimhash]]: same md5-prefix token hashes (signed
    * 64-bit via positional hex parse + 2^64 wrap), same sign-sum bits, same
    * 8×8 banding ((fp>>8b)&255 masks away shift-fill bits, so arithmetic
    * vs logical shift is immaterial), same hamming filter. */
  def simhashPairsSqlOver(sourceTable: String): String =
    s"""WITH ${simhashFpCtes(sourceTable)}, bd AS (
       |  SELECT doc_id, fp, b, (fp >> (8 * b)) & 255 AS bkt
       |  FROM fps, range(0, $SimhashBands) t(b)
       |), cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |         x.fp AS fa, y.fp AS fb
       |  FROM bd x JOIN bd y
       |    ON x.b = y.b AND x.bkt = y.bkt AND x.doc_id < y.doc_id
       |)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
       |FROM cand WHERE bit_count(xor(fa, fb)) <= $MaxHamming
       |ORDER BY doc_a, doc_b""".stripMargin

  val dedupSimhashSql: String = simhashPairsSqlOver("documents")

  // --- C41: sketch self-evaluation -----------------------------------------
  /** Precision/recall of the MinHash-LSH detector against EXACT n-gram
    * Jaccard ground truth (truth = jaccard ≥ TextOps.JaccardThreshold;
    * detected = est ≥ [[MinEstJaccard]]) — the audit that turns "the
    * sketch is probably fine" into a measured number. One declarative
    * plan: both pair sets, full-outer joined on the pair key, reduced to
    * confusion counts and exact-integer-ratio metrics.
    *
    * Scale note: the exact-truth side is the quadratic-risk inverted-index
    * join — at deploy scale this op runs on a SAMPLED slice of the corpus
    * (it is an audit, not a production path); the detector side is the
    * production LSH pipeline unchanged, which is the point. */
  def nearDupEval(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = TextOps.JaccardThreshold)
      .select(col("id_a"), col("id_b"), lit(1).as("t"))
    val det = Dedup.minhashLshPairs(docs.repartition(col("doc_id")),
        "doc_id", "text", shingleN = 3, numHashes = NumHashes, bands = Bands,
        minEstJaccard = MinEstJaccard)
      .select(col("id_a"), col("id_b"), lit(1).as("d"))
    det.join(truth, Seq("id_a", "id_b"), "full_outer")
      .agg(
        coalesce(sum(when(col("d") === 1 && col("t") === 1, 1)), lit(0L)).as("tp"),
        coalesce(sum(when(col("d") === 1 && col("t").isNull, 1)), lit(0L)).as("fp"),
        coalesce(sum(when(col("d").isNull && col("t") === 1, 1)), lit(0L)).as("fn"))
      .select(col("tp"), col("fp"), col("fn"),
        (col("tp").cast("double") / (col("tp") + col("fp"))).as("precision"),
        (col("tp").cast("double") / (col("tp") + col("fn"))).as("recall"))
  }

  val nearDupEvalSql: String =
    s"""WITH ${minhashCandidateCtes("documents")},
       |det AS (
       |  SELECT doc_a AS id_a, doc_b AS id_b, 1 AS d
       |  FROM cand
       |  JOIN sg sa ON doc_a = sa.doc_id
       |  JOIN sg sb ON doc_b = sb.doc_id
       |  WHERE len(list_filter(list_zip(sa.sig, sb.sig), p -> p[1] = p[2]))
       |        / $NumHashes.0 >= $MinEstJaccard
       |), sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
       |ip AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |truth AS (
       |  SELECT id_a, id_b, 1 AS t
       |  FROM ip
       |  JOIN sizes sa ON id_a = sa.doc_id
       |  JOIN sizes sb ON id_b = sb.doc_id
       |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter)
       |        >= ${TextOps.JaccardThreshold}
       |), j AS (
       |  SELECT COALESCE(SUM(CASE WHEN d = 1 AND t = 1 THEN 1 END), 0) AS tp,
       |         COALESCE(SUM(CASE WHEN d = 1 AND t IS NULL THEN 1 END), 0) AS fp,
       |         COALESCE(SUM(CASE WHEN d IS NULL AND t = 1 THEN 1 END), 0) AS fn
       |  FROM det FULL OUTER JOIN truth USING (id_a, id_b))
       |SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       |  CAST(fn AS BIGINT) AS fn,
       |  CAST(tp AS DOUBLE) / (tp + fp) AS precision,
       |  CAST(tp AS DOUBLE) / (tp + fn) AS recall
       |FROM j""".stripMargin

  // --- C54: persisted near-dup index (build once, probe per batch) ---------
  /** The C27 arriving batch probed against the PERSISTED history band
    * index ([[Dedup.dedupIndexBuild]]): history is sketched once and
    * stored as band-tuple rows; each batch sketches only itself and
    * broadcasts onto the index scan. Where C27 answers "is this EXACT
    * text already in history" (bloom + sha), this answers "does this
    * near-duplicate anything in history" (banded MinHash + estimated
    * Jaccard) — the second gate a recurring ingest pipeline runs. */
  def dedupIndexProbe(spark: SparkSession, dir: String): DataFrame = {
    val hist = graft.sources.Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
    val path = graft.sources.IndexScratch.path("dedupidx", dir)
    graft.sources.IndexScratch.ensure(path)(p =>
      Dedup.dedupIndexBuild(hist, "doc_id", "text", p))
    Dedup.dedupIndexProbe(spark, path,
        graft.operators.CorpusOps.incrementalBatch(spark, dir),
        "doc_id", "text", minEstJaccard = MinEstJaccard)
      .orderBy(col("batch_id"), col("hist_id"))
  }

  /** Twin: the shared candidate CTEs over history ∪ batch, keeping only
    * cross-side pairs — the same replay discipline as C32's fuzzy
    * decontamination, over C27's deterministic batch. */
  val dedupIndexProbeSql: String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 200000000 AS doc_id, text
       |  FROM documents WHERE doc_id % 11 = 0
       |  UNION ALL
       |  SELECT doc_id + 300000000,
       |         text || ' fresh ' || CAST(doc_id AS VARCHAR)
       |  FROM documents WHERE doc_id % 13 = 0
       |), ${minhashCandidateCtes("corpus")},
       |cp AS (
       |  SELECT CASE WHEN doc_a >= 200000000 THEN doc_a ELSE doc_b END AS batch_id,
       |         CASE WHEN doc_a >= 200000000 THEN doc_b ELSE doc_a END AS hist_id
       |  FROM cand
       |  WHERE (doc_a >= 200000000) <> (doc_b >= 200000000))
       |SELECT batch_id, hist_id,
       |  len(list_filter(list_zip(sa.sig, sb.sig), p -> p[1] = p[2])) / $NumHashes.0
       |    AS est_jaccard
       |FROM cp
       |JOIN sg sa ON hist_id = sa.doc_id
       |JOIN sg sb ON batch_id = sb.doc_id
       |WHERE len(list_filter(list_zip(sa.sig, sb.sig), p -> p[1] = p[2]))
       |      / $NumHashes.0 >= $MinEstJaccard
       |ORDER BY batch_id, hist_id""".stripMargin

  // --- C56: persisted SimHash band index ------------------------------------
  /** C54's persisted-index discipline for the FINGERPRINT family: history
    * fingerprints are banded and stored once; the arriving batch — every
    * [[graft.operators.CorpusOps.BenchmarkMod]]-th doc re-entering under a
    * shifted id with a one-token suffix, the C34 leak generator — hashes
    * only itself and probes. Fingerprint near-dups (hamming ≤
    * [[MaxHamming]]) surface with the pigeonhole recall GUARANTEE, which
    * is what distinguishes this gate from C54's probabilistic MinHash
    * banding. */
  def simhashIndexProbe(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.CorpusOps.{BenchmarkMod, ContaminatedShift}
    val docs = graft.sources.Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
    val path = graft.sources.IndexScratch.path("shidx", dir)
    graft.sources.IndexScratch.ensure(path)(p =>
      Dedup.simhashIndexBuild(docs, "doc_id", "text", p,
        bandBits = SimhashBandBits))
    val batch = docs.filter(col("doc_id") % BenchmarkMod === 0)
      .select((col("doc_id") + ContaminatedShift).as("doc_id"),
        concat(col("text"), lit(" leaked")).as("text"))
    Dedup.simhashIndexProbe(spark, path, batch, "doc_id", "text",
        bandBits = SimhashBandBits, maxHamming = MaxHamming)
      .orderBy(col("batch_id"), col("hist_id"))
  }

  val simhashIndexProbeSql: String = {
    import graft.operators.CorpusOps.{BenchmarkMod, ContaminatedShift}
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + $ContaminatedShift, text || ' leaked' AS text
       |  FROM documents WHERE doc_id % $BenchmarkMod = 0
       |), ${simhashFpCtes("corpus")}, bd AS (
       |  SELECT doc_id, fp, b, (fp >> ($SimhashBandBits * b)) & 255 AS bkt
       |  FROM fps, range(0, $SimhashBands) t(b)
       |), cand AS (
       |  SELECT DISTINCT
       |    CASE WHEN x.doc_id >= $ContaminatedShift THEN x.doc_id ELSE y.doc_id END AS batch_id,
       |    CASE WHEN x.doc_id >= $ContaminatedShift THEN y.doc_id ELSE x.doc_id END AS hist_id,
       |    CASE WHEN x.doc_id >= $ContaminatedShift THEN x.fp ELSE y.fp END AS bfp,
       |    CASE WHEN x.doc_id >= $ContaminatedShift THEN y.fp ELSE x.fp END AS hfp
       |  FROM bd x JOIN bd y
       |    ON x.b = y.b AND x.bkt = y.bkt AND x.doc_id < y.doc_id
       |  WHERE (x.doc_id >= $ContaminatedShift) <> (y.doc_id >= $ContaminatedShift)
       |)
       |SELECT batch_id, hist_id,
       |  CAST(bit_count(xor(bfp, hfp)) AS INT) AS hamming
       |FROM cand WHERE bit_count(xor(bfp, hfp)) <= $MaxHamming
       |ORDER BY batch_id, hist_id""".stripMargin
  }

  // --- C76: persisted-index ADMISSION (build → admit → probe) --------------
  /** The C54 lifecycle completed with its third verb: history is indexed
    * once, the C27 incremental batch probes clean and is ADMITTED into the
    * stored index ([[Dedup.dedupIndexAdmit]] — an O(batch) band append,
    * idempotent per tag), and a SECOND arriving batch probes the
    * now-current index. Its near-dup hits must surface matches among the
    * ADMITTED docs (ids ≥ 2·10⁸), not just original history — exactly
    * what a build-once index gets wrong from the second ingest day on.
    * MinHash sketches are deterministic functions of the text, so the
    * admitted index EQUALS a full rebuild over history ∪ batch and the
    * whole lifecycle is oracle-checked end to end (the rebuild is what
    * the DuckDB twin computes). Uses a dedicated scratch index — C54's
    * "dedupidx" stays history-only. */
  def dedupIndexAdmitProbe(spark: SparkSession, dir: String): DataFrame = {
    val hist = graft.sources.Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
    val path = graft.sources.IndexScratch.path("dedupadm", dir)
    graft.sources.IndexScratch.ensure(path)(p =>
      Dedup.dedupIndexBuild(hist, "doc_id", "text", p))
    Dedup.dedupIndexAdmit(path, "b1",
      graft.operators.CorpusOps.incrementalBatch(spark, dir),
      "doc_id", "text")
    val batch2 = hist.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 400000000L).as("doc_id"),
        concat(col("text"), lit(" resubmitted")).as("text"))
    Dedup.dedupIndexProbe(spark, path, batch2, "doc_id", "text",
        minEstJaccard = MinEstJaccard)
      .orderBy(col("batch_id"), col("hist_id"))
  }

  /** Twin: the FULL-REBUILD equivalent of the admitted index — candidates
    * over history ∪ admitted batch ∪ second batch, keeping pairs that
    * cross the second-batch boundary. Hash-equality of this against the
    * Spark probe IS the probe-after-admit ≡ rebuild guarantee. */
  val dedupIndexAdmitProbeSql: String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 200000000 AS doc_id, text
       |  FROM documents WHERE doc_id % 11 = 0
       |  UNION ALL
       |  SELECT doc_id + 300000000,
       |         text || ' fresh ' || CAST(doc_id AS VARCHAR)
       |  FROM documents WHERE doc_id % 13 = 0
       |  UNION ALL
       |  SELECT doc_id + 400000000, text || ' resubmitted'
       |  FROM documents WHERE doc_id % 7 = 0
       |), ${minhashCandidateCtes("corpus")},
       |cp AS (
       |  SELECT CASE WHEN doc_a >= 400000000 THEN doc_a ELSE doc_b END AS batch_id,
       |         CASE WHEN doc_a >= 400000000 THEN doc_b ELSE doc_a END AS hist_id
       |  FROM cand
       |  WHERE (doc_a >= 400000000) <> (doc_b >= 400000000))
       |SELECT batch_id, hist_id,
       |  len(list_filter(list_zip(sa.sig, sb.sig), p -> p[1] = p[2])) / $NumHashes.0
       |    AS est_jaccard
       |FROM cp
       |JOIN sg sa ON hist_id = sa.doc_id
       |JOIN sg sb ON batch_id = sb.doc_id
       |WHERE len(list_filter(list_zip(sa.sig, sb.sig), p -> p[1] = p[2]))
       |      / $NumHashes.0 >= $MinEstJaccard
       |ORDER BY batch_id, hist_id""".stripMargin

  // --- C88: cross-family dedup comparison board ----------------------------
  /** The dedup-STRATEGY board (C82's selection-board discipline applied
    * to the dedup family): one seeded corpus carrying all three
    * duplication modes — byte-exact copies (%7), case/punct variants
    * (%11), near-dup suffix variants (%13) — runs through every detector
    * family, and one row per family reports its removal census under the
    * keep-min policy (pair families: docs appearing as the larger member
    * of ≥1 qualifying pair). The board IS the strategy argument: exact
    * catches only byte copies, norm adds case variants, the sketch
    * families add near-dups but MISS case variants (uppercasing flips
    * every token hash) — no single family covers all three modes.
    *
    * Every census is the family's own spelling (exactGroups / normExpr /
    * minhashLshPairs / simhashPairs / ngramJaccardPairs with each key's
    * canned parameters), and every oracle subquery its existing twin
    * over the shared corpus CTE — the board cannot fork any detector.
    * Scale: each census is a 1-row aggregate of its family's production
    * plan, and the five union into ONE distributed action (plus the
    * 1-row corpus count broadcast on) — no driver scalars, no sequential
    * job launches. */
  def dedupBoardCorpus(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents.select(col("doc_id"), col("text"))
    // base ∪ %11 case variants come from C86's OWN corpus builder — one
    // injection spelling per mode, never re-spelled here
    TextOps.normCorpus(spark, dir)
      .unionAll(d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000000L).as("doc_id"), col("text")))
      .unionAll(d.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 800000000L).as("doc_id"),
          concat(col("text"), lit(" zz extra")).as("text")))
  }

  private val dedupBoardCorpusSql: String =
    s"""bc AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  ${TextOps.normVariantArmSql}
       |  UNION ALL
       |  SELECT doc_id + 100000000, text FROM documents WHERE doc_id % 7 = 0
       |  UNION ALL
       |  SELECT doc_id + 800000000, text || ' zz extra'
       |  FROM documents WHERE doc_id % 13 = 0
       |)""".stripMargin

  /** The board, parameterized by the C4 census's deploy-scale guard.
    *
    * `ngramSampleDenom = None` (the `dedup_compare` gate key) runs the
    * exact shingle self-join — quadratic in shingle document frequency,
    * fine at gate scale, measured super-linear at 24× (350.7 s, r10).
    * `Some(denom)` (the `dedup_compare_sampled` key and the 24× probe) is
    * the deploy path: the C4 census's removal rate is measured on the
    * deterministic `doc_id % denom == 0` slice, each slice doc still
    * paired against the FULL corpus (see Dedup.ngramJaccardPairs's
    * sampleDenomB), so the rate is the exact rate OF THE SLICE — an
    * unbiased corpus-rate estimate at 1/denom of the join cost. The
    * board reports the slice's own n_docs for that family, so the
    * removal_rate column stays an honest ratio; the four linear
    * families stay full-corpus. */
  def dedupCompareOn(spark: SparkSession, dir: String,
      ngramSampleDenom: Option[Long]): DataFrame = {
    val c = dedupBoardCorpus(spark, dir).localCheckpoint(eager = true)
    // every census is a 1-ROW aggregate of its family's production plan;
    // the five unioned into ONE plan (+ the 1-row corpus count joined on)
    // means the board is ONE distributed action, not five sequential job
    // launches — same per-family spellings, same oracle, ~5× less
    // job-scheduling latency for a diagnostic run at any scale
    def grouped(groups: DataFrame, cnt: String, family: String): DataFrame =
      groups.filter(col(cnt) > 1)
        .agg(coalesce(sum(col(cnt) - 1), lit(0L)).as("n_removed"))
        .select(lit(family).as("family"), col("n_removed"))
    def pairRemoved(pairs: DataFrame, family: String): DataFrame =
      pairs.agg(count_distinct(col("id_b")).as("n_removed"))
        .select(lit(family).as("family"), col("n_removed"))
    def withN(fam: DataFrame, nn: DataFrame): DataFrame =
      fam.crossJoin(broadcast(nn)) // k rows × 1 row
        .select(col("family"), col("n_docs"), col("n_removed"),
          (col("n_removed").cast("double") / col("n_docs"))
            .as("removal_rate"))
    val fam4 = grouped(Dedup.exactGroups(c, "doc_id", "text"), "n_copies",
        "exact")
      .unionAll(grouped(
        c.groupBy(md5(TextOps.normExpr(col("text"))))
          .agg(count(lit(1)).as("nv")), "nv", "norm"))
      .unionAll(pairRemoved(Dedup.minhashLshPairs(c, "doc_id", "text",
        shingleN = 3, numHashes = NumHashes, bands = Bands,
        minEstJaccard = MinEstJaccard), "minhash_lsh"))
      .unionAll(pairRemoved(Dedup.simhashPairs(c, "doc_id", "text",
        bandBits = SimhashBandBits, maxHamming = MaxHamming), "simhash"))
    val nn = c.agg(count(lit(1)).as("n_docs"))
    val ngram = pairRemoved(Dedup.ngramJaccardPairs(c, "doc_id", "text",
      n = 3, threshold = TextOps.JaccardThreshold,
      sampleDenomB = ngramSampleDenom), "ngram_jaccard")
    val ngramN = ngramSampleDenom.fold(nn)(den =>
      c.filter(col("doc_id") % den === 0).agg(count(lit(1)).as("n_docs")))
    withN(fam4, nn).unionAll(withN(ngram, ngramN))
      .orderBy(col("family"))
  }

  def dedupCompare(spark: SparkSession, dir: String): DataFrame =
    dedupCompareOn(spark, dir, ngramSampleDenom = None)

  /** The slice denominator of the `dedup_compare_sampled` gate key —
    * small enough that the sf0.01 slice still sees the seeded duplicate
    * modes, large enough that the sampled path is a genuinely different
    * plan. At deploy scale denom tracks corpus growth (the 24× probe
    * runs denom = 24), keeping the census cost linear. */
  val NgramSampleDenom = 4L

  def dedupCompareSampled(spark: SparkSession, dir: String): DataFrame =
    dedupCompareOn(spark, dir, ngramSampleDenom = Some(NgramSampleDenom))

  /** Twin: each family's existing twin as a subquery over the shared
    * seeded-corpus CTE, reduced to the same censuses; the C4 subquery and
    * its denominator mirror the board's `ngramSampleDenom`. */
  private def dedupCompareSqlOver(ngramSampleDenom: Option[Long]): String = {
    val bFilter = ngramSampleDenom.fold("")(d => s" AND b.doc_id % $d = 0")
    val ngramN = ngramSampleDenom.fold("nn")(d =>
      s"(SELECT COUNT(*) AS n_docs FROM bc WHERE doc_id % $d = 0) sn")
    s"""WITH $dedupBoardCorpusSql,
       |nn AS (SELECT COUNT(*) AS n_docs FROM bc),
       |fam AS (
       |  SELECT 'exact' AS family, CAST(COALESCE(SUM(c - 1), 0) AS BIGINT)
       |    AS n_removed
       |  FROM (SELECT COUNT(*) AS c FROM bc GROUP BY sha256(text))
       |  WHERE c > 1
       |  UNION ALL
       |  SELECT 'norm', CAST(COALESCE(SUM(c - 1), 0) AS BIGINT)
       |  FROM (SELECT COUNT(*) AS c FROM bc
       |        GROUP BY md5(${TextOps.normSqlExpr("text")}))
       |  WHERE c > 1
       |  UNION ALL
       |  SELECT 'minhash_lsh', CAST(COUNT(DISTINCT doc_b) AS BIGINT)
       |  FROM (${minhashPairsSqlOver("bc")})
       |  UNION ALL
       |  SELECT 'simhash', CAST(COUNT(DISTINCT doc_b) AS BIGINT)
       |  FROM (${simhashPairsSqlOver("bc")}))
       |SELECT family, n_docs, n_removed,
       |  CAST(n_removed AS DOUBLE) / n_docs AS removal_rate
       |FROM fam CROSS JOIN nn
       |UNION ALL
       |SELECT 'ngram_jaccard', n_docs, n_removed,
       |  CAST(n_removed AS DOUBLE) / n_docs
       |FROM (SELECT CAST(COUNT(DISTINCT doc_b) AS BIGINT) AS n_removed
       |      FROM (${TextOps.ngramJaccardSqlOver("bc", bFilter)})) ng
       |CROSS JOIN $ngramN
       |ORDER BY family""".stripMargin
  }

  lazy val dedupCompareSql: String = dedupCompareSqlOver(None)
  lazy val dedupCompareSampledSql: String =
    dedupCompareSqlOver(Some(NgramSampleDenom))

  // --- C83: persisted-index VACUUM (build → admit → vacuum → probe) -------
  /** The lifecycle's maintenance verb exercised end-to-end: the C76 flow
    * (build on history → admit the C27 batch) leaves `bands/` holding one
    * file set per write; [[Dedup.dedupIndexVacuum]] compacts it back to
    * one bucket-spread layout, and the second batch probes the VACUUMED
    * index. Vacuum is content-preserving by construction, so the probe
    * must equal C76's probe-after-admit — this key therefore shares the
    * C76 rebuild oracle VERBATIM: hash equality is simultaneously the
    * probe-after-admit ≡ rebuild guarantee and the vacuum-changed-nothing
    * guarantee. File-count reduction is pinned by spec (the part the
    * oracle cannot see). Dedicated scratch — C76's stays un-vacuumed so
    * both shapes exist at gate time. */
  def dedupIndexVacuumProbe(spark: SparkSession, dir: String): DataFrame = {
    val hist = graft.sources.Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
    val path = graft.sources.IndexScratch.path("dedupvac", dir)
    graft.sources.IndexScratch.ensure(path)(p =>
      Dedup.dedupIndexBuild(hist, "doc_id", "text", p))
    Dedup.dedupIndexAdmit(path, "b1",
      graft.operators.CorpusOps.incrementalBatch(spark, dir),
      "doc_id", "text")
    Dedup.dedupIndexVacuum(spark, path)
    val batch2 = hist.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 400000000L).as("doc_id"),
        concat(col("text"), lit(" resubmitted")).as("text"))
    Dedup.dedupIndexProbe(spark, path, batch2, "doc_id", "text",
        minEstJaccard = MinEstJaccard)
      .orderBy(col("batch_id"), col("hist_id"))
  }

  /** Registry for SparkEntry — all sketches are oracle-checked thanks to
    * the engine-portable hash definitions in SketchHash. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_minhash_lsh" -> (dedupMinhashLsh _),
    "dedup_edit_distance" -> (dedupEditDistance _),
    "dedup_simhash" -> (dedupSimhash _),
    "near_dup_eval" -> (nearDupEval _),
    "dedup_index_probe" -> (dedupIndexProbe _),
    "simhash_index_probe" -> (simhashIndexProbe _),
    "dedup_index_admit" -> (dedupIndexAdmitProbe _),
    "dedup_index_vacuum" -> (dedupIndexVacuumProbe _),
    "dedup_compare" -> (dedupCompare _),
    "dedup_compare_sampled" -> (dedupCompareSampled _)
  )

  val oracles: Map[String, String] = Map(
    "dedup_minhash_lsh" -> dedupMinhashLshSql,
    "dedup_edit_distance" -> dedupEditDistanceSql,
    "dedup_simhash" -> dedupSimhashSql,
    "near_dup_eval" -> nearDupEvalSql,
    "dedup_index_probe" -> dedupIndexProbeSql,
    "simhash_index_probe" -> simhashIndexProbeSql,
    "dedup_index_admit" -> dedupIndexAdmitProbeSql,
    // vacuum is content-preserving: the post-vacuum probe must equal the
    // post-admit probe, so the C76 rebuild twin is shared verbatim
    "dedup_index_vacuum" -> dedupIndexAdmitProbeSql,
    "dedup_compare" -> dedupCompareSql,
    "dedup_compare_sampled" -> dedupCompareSampledSql
  )
}
