package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** SURVEY §2 C12: multimodal columns — opaque binary media with typed
  * metadata, plus the decode/feature-extract plumbing a training pipeline
  * needs.
  *
  * Real decode libraries (image/audio codecs) are not available in this
  * environment, so `decodeBatch` STUBS the codec with a deterministic
  * byte-level feature extractor — but every piece of Spark plumbing is
  * real: binary columns flow through parquet-compatible schemas, headers
  * are parsed with codegen'd expressions, and the decode runs through
  * `mapPartitions` in bounded batches exactly as a native codec would
  * (amortizing per-batch library setup, keeping memory bounded by
  * `DecodeBatchSize` rather than partition size).
  *
  * Rows-only for the driver; semantics pinned by MultimodalSpec.
  */
object Multimodal {

  val Magic = "GRFT"
  val DecodeBatchSize = 64

  /** A media row: opaque payload + the typed metadata columns. */
  final case class MediaRow(media_id: Long, fmt: String, media: Array[Byte])

  final case class MediaFeatures(media_id: Long, fmt: String, width: Int,
      height: Int, n_bytes: Int, checksum: Long, feat: Array[Double])

  /** Synthesize the media table deterministically from `documents`:
    * payload = GRFT header (magic, format, dims) + content bytes. At deploy
    * time this column is real image/audio bytes read from object storage —
    * the schema (binary + typed metadata) is the contract. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    mediaTableOf(Tables(spark, dir).documents)

  /** Media synthesis over ANY (doc_id, text) frame — split out so probe
    * batches (leaked docs under shifted ids) synthesize through the SAME
    * codec path as the history table. */
  def mediaTableOf(d: DataFrame): DataFrame = {
    val fmt = when(col("doc_id") % 3 === 0, "img")
      .when(col("doc_id") % 3 === 1, "aud").otherwise("vid")
    val width = (col("doc_id") % 640 + 16).cast("int")
    val height = (col("doc_id") % 480 + 16).cast("int")
    d.select(
      col("doc_id").as("media_id"),
      fmt.as("fmt"),
      width.as("meta_width"),
      height.as("meta_height"),
      concat(lit(Magic), fmt,
        lpad(width.cast("string"), 4, "0"),
        lpad(height.cast("string"), 4, "0"),
        col("text")).cast("binary").as("media"))
  }

  /** The stubbed codec: parses the header and derives deterministic
    * features from payload bytes (stands in for pixel/sample decoding). */
  private[operators] def decodeOne(media_id: Long, fmt: String, media: Array[Byte]): MediaFeatures = {
    val header = new String(media, 0, math.min(15, media.length), "UTF-8")
    require(header.startsWith(Magic), s"bad magic in media $media_id")
    val parsedFmt = header.substring(4, 7)
    val width = header.substring(7, 11).toInt
    val height = header.substring(11, 15).toInt
    // md5-derived checksum (first 8 digest bytes, big-endian signed) over
    // the payload body — the deterministic stand-in for decoding, chosen
    // over FNV because any engine can recompute it from the same bytes,
    // which is what makes `multimodal_meta` oracle-checkable.
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(java.util.Arrays.copyOfRange(media, 15, media.length))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (md(i) & 0xffL); i += 1 }
    val feat = Array.tabulate(4) { k =>
      ((h >>> (k * 16)) & 0xffffL).toDouble / 65536.0
    }
    MediaFeatures(media_id, parsedFmt, width, height, media.length, h, feat)
  }

  /** Batched decode over partitions: pulls `DecodeBatchSize` rows at a time
    * (where a native codec would be invoked once per batch) and emits
    * feature rows. No shuffle — the decode is a pure map stage. */
  def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.grouped(DecodeBatchSize).flatMap { batch =>
      // per-batch "codec init" would happen here
      batch.iterator.map(r => decodeOne(r.media_id, r.fmt, r.media))
    }

  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRow] =
      mediaTable(spark, dir).select("media_id", "fmt", "media").as[MediaRow]
    media.mapPartitions(decodeBatch)
      .toDF()
      .select(col("media_id"), col("fmt"), col("width"), col("height"),
        col("n_bytes"), col("checksum"),
        element_at(col("feat"), 1).as("feat0"),
        element_at(col("feat"), 2).as("feat1"),
        element_at(col("feat"), 3).as("feat2"),
        element_at(col("feat"), 4).as("feat3"))
      .orderBy(col("media_id"))
  }

  /** Metadata-pruned decode: the typed metadata columns exist precisely so
    * predicates run BEFORE the expensive decode — the filter stays below
    * the mapPartitions in the plan, so only surviving rows are ever
    * decoded. At deploy scale the same predicate also partition-prunes
    * when media is laid out by (fmt, size-bucket). */
  def decodeFiltered(spark: SparkSession, dir: String, fmt: String,
      maxWidth: Int): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .filter(col("fmt") === fmt && col("meta_width") <= maxWidth)
      .select("media_id", "fmt", "media").as[MediaRow]
      .mapPartitions(decodeBatch)
  }

  /** Decoded features feeding similarity search: the C12→C6 composition a
    * multimodal dedup pipeline runs (decode once, then ANN over the
    * extracted features). */
  def multimodalSimilar(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val feats = mediaTable(spark, dir)
      .select("media_id", "fmt", "media").as[MediaRow]
      .mapPartitions(decodeBatch)
      .toDF()
      .select(col("media_id"), col("feat"))
    Ann.bruteTopK(feats, feats.filter(col("media_id") % 100 === 0),
        "media_id", "feat", k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  // --- C12 continued: video frame sampling ---------------------------------
  /** Frame geometry of the stub "video" codec: fixed-size frames over the
    * payload body, every [[FrameStride]]-th frame sampled (the standard
    * pretraining recipe — decode only the frames you keep). */
  val FrameBytes = 32
  val FrameStride = 4

  final case class FrameRow(media_id: Long, n_frames: Int, frame_idx: Int,
      frame_h48: Long)

  /** Stub frame extractor: chunks the payload body into fixed-size frames
    * and emits an md5-derived 48-bit fingerprint for every `stride`-th
    * frame (stands in for the decoded frame tensor; a native codec would
    * seek directly to the sampled frames, which is why sampling happens
    * INSIDE the decode — the skipped frames are never materialized).
    * Stride 1 = every frame, the containment-index density (C77). */
  private[operators] def sampleFrames(r: MediaRow,
      stride: Int = FrameStride): Iterator[FrameRow] = {
    val body = java.util.Arrays.copyOfRange(r.media, 15, r.media.length)
    val nFrames = body.length / FrameBytes
    Iterator.range(0, nFrames).filter(_ % stride == 0).map { j =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(java.util.Arrays.copyOfRange(body, j * FrameBytes,
          (j + 1) * FrameBytes))
      var h = 0L
      var i = 0
      while (i < 6) { h = (h << 8) | (md(i) & 0xffL); i += 1 }
      FrameRow(r.media_id, nFrames, j, h)
    }
  }

  /** Per-frame fingerprint rows over a media frame at a given stride — the
    * decode-stage map shared by C12's frame sampler and C77's containment
    * index (one spelling of the frame hash repo-wide). */
  private[operators] def frameHashesOf(media: DataFrame,
      stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "fmt", "media").as[MediaRow]
      .mapPartitions(rows => rows.grouped(DecodeBatchSize)
        .flatMap(_.iterator.flatMap(r => sampleFrames(r, stride))))
      .toDF()
  }

  /** Sampled-frame fingerprints for every video: metadata predicate (fmt)
    * prunes BEFORE decode, the frame loop runs inside the batched decode
    * map stage, and the per-frame rows are the only thing that ever
    * reaches an exchange — O(frames kept), not O(bytes decoded). */
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame =
    frameHashesOf(mediaTable(spark, dir).filter(col("fmt") === "vid"),
        FrameStride)
      .orderBy(col("media_id"), col("frame_idx"))

  // --- C74: perceptual near-dup over decoded media -------------------------
  /** Region count basis and banding for the perceptual hash: 8×8 bands give
    * the C3 pigeonhole guarantee — any pair within hamming ≤ 6 shares at
    * least one untouched band, so recall is structural, not probabilistic. */
  val PhashBandBits = 8
  val PhashMaxHamming = 6

  final case class MediaPhash(media_id: Long, fmt: String, n_frames: Int,
      phash: Long)

  /** The perceptual fingerprint, computed INSIDE the decode stage (where a
    * real pipeline hashes decoded pixels/samples, not container bytes): the
    * payload body is cut into fixed [[FrameBytes]] regions, each region
    * fingerprints (md5 prefix, the engine-portable idiom of every sketch
    * here), and per-bit sign-sums collapse the regions into one 64-bit
    * pHash. A small content edit touches few regions and so flips few bits
    * — the locality the avalanche checksum deliberately lacks — which is
    * what makes Hamming distance a near-dup signal (Charikar, STOC'02). */
  private[operators] def perceptualOne(r: MediaRow): MediaPhash = {
    val body = java.util.Arrays.copyOfRange(r.media, 15, r.media.length)
    val n = body.length / FrameBytes
    val acc = new Array[Int](64)
    var j = 0
    while (j < n) {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(java.util.Arrays.copyOfRange(body, j * FrameBytes,
          (j + 1) * FrameBytes))
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (md(i) & 0xffL); i += 1 }
      var b = 0
      while (b < 64) {
        acc(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1); b += 1
      }
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) fp |= (1L << b); b += 1 }
    MediaPhash(r.media_id, r.fmt, n, fp)
  }

  /** Perceptual near-dup pairs over the media table — the multimodal twin
    * of C3 (SimHash docs) and C5 (embedding dedup): decode-stage pHash,
    * then the SAME banded candidacy as the text fingerprints
    * ([[Dedup.simhashBuckets]] — one definition of fingerprint candidacy
    * repo-wide), hamming-verified BEFORE the pair-dedup shuffle. Never
    * all-pairs: candidate volume is O(colliding bucket pairs), and media
    * too short to carry one region (no perceptual signal) are excluded
    * rather than collapsing into a single all-zero-hash blob. The pHash is
    * modality-agnostic content identity — filter `fmt_a = fmt_b` downstream
    * for per-modality dedup. */
  /** The decode-stage pHash map over a media frame — shared by the offline
    * pairs query (C74), the index builder, and probe batches: one spelling
    * of the fingerprint repo-wide. Media too short to carry one region
    * (no perceptual signal) are excluded rather than collapsing into a
    * single all-zero-hash blob. */
  def phashOn(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "fmt", "media").as[MediaRow]
      .mapPartitions(rows => rows.grouped(DecodeBatchSize)
        .flatMap(_.iterator.map(perceptualOne)))
      .toDF()
      .filter(col("n_frames") >= 1)
  }

  def multimodalDedup(spark: SparkSession, dir: String): DataFrame = {
    val ph = phashOn(mediaTable(spark, dir))
    val bucketed = ph.select(col("media_id"), col("fmt"), col("phash"),
      explode(Dedup.simhashBuckets(col("phash"), PhashBandBits)).as("_bkt"))
    bucketed.as("a").join(bucketed.as("b"),
        col("a._bkt") === col("b._bkt") && col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        col("a.fmt").as("fmt_a"), col("b.fmt").as("fmt_b"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("hamming"))
      .filter(col("hamming") <= PhashMaxHamming)
      .dropDuplicates("media_a", "media_b")
      .orderBy(col("media_a"), col("media_b"))
  }

  // --- C72: persisted pHash index — the deployment shape of C74 -----------
  /** Banded fingerprint rows (media_id, phash, _bkt) — the decode+band
    * stage shared by the index build, probe, and admit. */
  private def phashBandRows(media: DataFrame): DataFrame =
    phashOn(media)
      .select(col("media_id"), col("phash"),
        explode(Dedup.simhashBuckets(col("phash"), PhashBandBits)).as("_bkt"))

  /** Persist the media corpus' banded pHash index once (the C54/C56
    * persisted-index discipline for the multimodal family): one 64-bit
    * perceptual fingerprint per media row, banded, bucket-partitioned.
    * Arriving batches probe without re-decoding history. */
  def phashIndexBuild(media: DataFrame, path: String): Unit =
    phashBandRows(media)
      .repartition(col("_bkt"))
      .write.mode("overwrite").parquet(s"$path/bands")

  /** ADMIT a probed-clean media batch into the persisted pHash index —
    * [[graft.operators.Dedup.dedupIndexAdmit]]'s verb for the multimodal
    * family: the batch decodes and fingerprints ONCE here (map-side, the
    * same [[phashBandRows]] spelling as build and probe) and its band rows
    * append into the stored layout. The perceptual hash is a deterministic
    * function of the payload, so probe-after-admit ≡ probe-against-rebuild
    * of history ∪ batch (pinned by spec). Idempotent per `tag`. */
  def phashIndexAdmit(path: String, tag: String, batch: DataFrame): Boolean =
    graft.sources.IndexScratch.admitOnce(path, tag) {
      phashBandRows(batch)
        .repartition(col("_bkt"))
        .write.mode("append").parquet(s"$path/bands")
    }

  /** Probe the persisted index with an arriving media batch: the batch
    * decodes and fingerprints map-side, BROADCASTS onto the index scan,
    * and the hamming verify runs before the only shuffle (pair dedup) —
    * zero history decode per batch. */
  def phashIndexProbe(spark: SparkSession, path: String,
      batch: DataFrame): DataFrame = {
    val idx = spark.read.parquet(s"$path/bands")
    val probe = phashBandRows(batch)
    idx.as("h").join(broadcast(probe).as("p"), col("h._bkt") === col("p._bkt"))
      .select(col("p.media_id").as("batch_id"), col("h.media_id").as("hist_id"),
        bit_count(col("h.phash").bitwiseXOR(col("p.phash"))).as("hamming"))
      .filter(col("hamming") <= PhashMaxHamming)
      .dropDuplicates("batch_id", "hist_id")
  }

  /** Driver key: the C34-style leak generator re-enters every
    * [[graft.operators.CorpusOps.BenchmarkMod]]-th doc's media under a
    * shifted id with a short appended suffix — shorter than one
    * [[FrameBytes]] region, so most fingerprints survive untouched and the
    * probe must surface them through the persisted index (pigeonhole
    * recall, C3's guarantee). */
  /** The C34-style leak generator over media: every BenchmarkMod-th doc's
    * payload re-enters under a shifted id with a sub-region suffix. ONE
    * spelling shared by the batch probe and the B59 streaming drain
    * (drain == batch must not be able to desync on a constant edit). */
  def leakedMediaOf(docs: DataFrame): DataFrame = {
    import graft.operators.CorpusOps.{BenchmarkMod, ContaminatedShift}
    mediaTableOf(docs
      .filter(col("doc_id") % BenchmarkMod === 0)
      .select((col("doc_id") + ContaminatedShift).as("doc_id"),
        concat(col("text"), lit(" leaked")).as("text")))
  }

  /** Ensure the persisted pHash index for `dir`'s media table exists and
    * return its path — shared by the batch probe and the streaming drain. */
  def phashIndexEnsure(spark: SparkSession, dir: String): String = {
    val path = graft.sources.IndexScratch.path("phidx", dir)
    graft.sources.IndexScratch.ensure(path)(p =>
      phashIndexBuild(mediaTable(spark, dir), p))
    path
  }

  def multimodalIndexProbe(spark: SparkSession, dir: String): DataFrame = {
    val path = phashIndexEnsure(spark, dir)
    val batch = leakedMediaOf(Tables(spark, dir).documents)
    phashIndexProbe(spark, path, batch)
      .orderBy(col("batch_id"), col("hist_id"))
  }

  // --- C77: frame-level containment ("this video contains that clip") -----
  /** C74/C72 fingerprint WHOLE media — an embedded or clipped reuse flips
    * too many pHash bits to surface. Containment works at the FRAME level
    * instead (the C62 quote-inclusion discipline over media payloads): a
    * probe clip matches a history video when ≥ [[ContainTau]] of the
    * clip's frame fingerprints appear among the video's frames. Frame
    * hashes are the decode-stage md5-derived 48-bit ids of C12's sampler
    * ([[sampleFrames]] at stride 1 — full density, since a clip can start
    * at any frame), so the whole pipeline stays oracle-reproducible. */
  val ContainTau = 0.8
  /** Clip geometry of the seeded leak: frames skipped from the source
    * head, frames taken. The clip is a FRAME-ALIGNED slice, the shape a
    * re-encoder that respects keyframes produces (byte-unaligned re-cuts
    * need the decoded-domain pHash of C74, not frame identity). */
  val ClipSkipFrames = 2
  val ClipFrames = 4
  val ClipShift = 600000000L
  /** Denser seeding than the C34 leak mod (97): the clip generator also
    * requires fmt=vid (÷3) and a ≥192-byte body, and at gate scale the
    * ×97 intersection is empty — 13 keeps the seeded-recall check
    * non-vacuous at every sf dir. */
  val ClipMod = 13

  /** Seeded clip-leak generator: every `clipMod`-th video doc's payload
    * re-enters as a SHORT clip — a frame-aligned contiguous slice of the
    * source body — under a shifted id. Body bytes are the document text
    * (the media synthesis contract), so the slice is a text substring and
    * both engines replay it exactly. */
  def clipLeaksOf(docs: DataFrame, clipMod: Int): DataFrame =
    mediaTableOf(docs
      .filter(col("doc_id") % 3 === 2 && col("doc_id") % clipMod === 0)
      .filter(length(col("text")) >=
        (ClipSkipFrames + ClipFrames) * FrameBytes)
      .select((col("doc_id") + ClipShift).as("doc_id"),
        substring(col("text"), ClipSkipFrames * FrameBytes + 1,
          ClipFrames * FrameBytes).as("text")))

  /** Frame-containment pairs of a probe batch against a history frame
    * index: the probe side is SMALL (a clip batch) and BROADCASTS onto the
    * history frame scan — the frame-hash equijoin is the band join, no
    * history shuffle, candidate volume O(matching frames). The τ-gate
    * divides exact integers, so the score is engine-identical. */
  def frameContainment(history: DataFrame, probe: DataFrame): DataFrame = {
    // history frames are NEVER pre-deduplicated: that would shuffle every
    // history frame before the join. The raw frame stream feeds the
    // broadcast join map-side, and set semantics (a frame hash counted
    // once per (clip, video) however often it repeats) come from the
    // countDistinct AFTER the join — the only shuffled rows are matches.
    val histFrames = frameHashesOf(history, stride = 1)
      .select(col("media_id").as("hist_id"), col("frame_h48"))
    val clipFrames = frameHashesOf(probe, stride = 1)
      .select(col("media_id").as("clip_id"), col("frame_h48"))
      .dropDuplicates() // the small broadcast side
    val nClip = clipFrames.groupBy(col("clip_id"))
      .agg(count(lit(1)).as("n_clip"))
    histFrames
      .join(broadcast(clipFrames), "frame_h48")
      .groupBy(col("clip_id"), col("hist_id"))
      .agg(countDistinct(col("frame_h48")).as("n_match"))
      .join(broadcast(nClip), "clip_id")
      .select(col("clip_id"), col("hist_id"), col("n_match"), col("n_clip"),
        (col("n_match").cast("double") / col("n_clip")).as("containment"))
      .filter(col("containment") >= ContainTau)
  }

  def multimodalContainment(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    frameContainment(
        mediaTable(spark, dir).filter(col("fmt") === "vid"),
        clipLeaksOf(docs, ClipMod))
      .orderBy(col("clip_id"), col("hist_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> (multimodalMeta _),
    "multimodal_similar" -> (multimodalSimilar _),
    "multimodal_frames" -> (multimodalFrames _),
    "multimodal_dedup" -> (multimodalDedup _),
    "multimodal_containment" -> (multimodalContainment _),
    "phash_index_probe" -> (multimodalIndexProbe _)
  )

  /** DuckDB twin of [[multimodalMeta]]: re-derives the synthesized payload
    * (header is pure column algebra; body = the document text) and the
    * md5-prefix checksum with the same positional-hex parse used by the
    * sketch oracles. `strlen` counts BYTES, matching `media.length`;
    * `u >> k & 65535` on the unsigned HUGEINT equals Scala's `>>>` on the
    * wrapped signed long. `multimodal_similar` stays rows-only (ANN
    * composition over the decoded features). */
  val multimodalMetaSql: String = {
    val nibbleTerms = (1 to 16).map { i =>
      s"(strpos('0123456789abcdef', substr(mh, $i, 1)) - 1)::HUGEINT * ${BigInt(16).pow(16 - i)}"
    }.mkString(" + ")
    val feats = (0 until 4).map { k =>
      s"CAST((u >> ${k * 16}) & 65535 AS DOUBLE) / 65536.0 AS feat$k"
    }.mkString(",\n      |  ")
    s"""WITH m AS (
       |  SELECT doc_id AS media_id,
       |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'img' WHEN 1 THEN 'aud'
       |         ELSE 'vid' END AS fmt,
       |    CAST(doc_id % 640 + 16 AS INT) AS width,
       |    CAST(doc_id % 480 + 16 AS INT) AS height,
       |    CAST(15 + strlen(text) AS INT) AS n_bytes,
       |    md5(text) AS mh
       |  FROM documents
       |), h AS (
       |  SELECT media_id, fmt, width, height, n_bytes, $nibbleTerms AS u FROM m
       |)
       |SELECT media_id, fmt, width, height, n_bytes,
       |  CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
       |            THEN u - 18446744073709551616::HUGEINT ELSE u END AS BIGINT)
       |    AS checksum,
       |  $feats
       |FROM h ORDER BY media_id""".stripMargin
  }

  /** DuckDB twin of [[multimodalSimilar]]: the decoded features are
    * md5-derived (see [[multimodalMetaSql]]), so the whole decode→ANN
    * composition is SQL-reproducible — quantized-cosine brute top-k over
    * the re-derived 4-dim feature vectors, tie-broken like
    * VectorOps.annBruteTopkSql. */
  val multimodalSimilarSql: String = {
    val nibbleTerms = (1 to 16).map { i =>
      s"(strpos('0123456789abcdef', substr(mh, $i, 1)) - 1)::HUGEINT * ${BigInt(16).pow(16 - i)}"
    }.mkString(" + ")
    val featList = (0 until 4).map { k =>
      s"CAST((u >> ${k * 16}) & 65535 AS DOUBLE) / 65536.0"
    }.mkString("[", ", ", "]")
    s"""WITH m AS (SELECT doc_id AS media_id, md5(text) AS mh FROM documents),
       |h AS (SELECT media_id, $nibbleTerms AS u FROM m),
       |f AS (SELECT media_id, $featList AS feat FROM h),
       |q AS (SELECT media_id, ${VectorOps.qSql("feat")} AS qv FROM f),
       |qs AS (SELECT media_id AS query_id, qv AS qqv FROM q WHERE media_id % 100 = 0),
       |scored AS (
       |  SELECT query_id, q.media_id AS neighbor_id,
       |    ${VectorOps.qcosSql("q.qv", "qs.qqv")} AS score
       |  FROM q CROSS JOIN qs WHERE q.media_id <> qs.query_id)
       |SELECT query_id, neighbor_id, score,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |       ORDER BY score DESC, neighbor_id) AS INT) AS rank
       |FROM scored
       |QUALIFY rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB twin of [[multimodalFrames]]: the payload body is the document
    * text (ASCII by construction — `strlen == length` holds corpus-wide,
    * so char-based `substr` chunks exactly like the byte-based codec) and
    * the frame fingerprint is the md5-prefix-48 idiom of the sketch
    * oracles. */
  val multimodalFramesSql: String = {
    val hex12 = (1 to 12).map(i =>
      s"((strpos('0123456789abcdef', substr(mh, $i, 1)) - 1)::BIGINT << ${4 * (12 - i)})")
      .mkString(" + ")
    s"""WITH v AS (
       |  SELECT doc_id AS media_id, text,
       |    CAST(strlen(text) // $FrameBytes AS INT) AS n_frames
       |  FROM documents WHERE doc_id % 3 = 2
       |), idx AS (
       |  SELECT media_id, n_frames, text,
       |    unnest(range(0, n_frames)) AS j
       |  FROM v
       |), fr AS (
       |  SELECT media_id, n_frames, CAST(j AS INT) AS frame_idx,
       |    md5(substr(text, 1 + CAST(j AS INT) * $FrameBytes, $FrameBytes)) AS mh
       |  FROM idx WHERE j % $FrameStride = 0)
       |SELECT media_id, n_frames, frame_idx,
       |  CAST($hex12 AS BIGINT) AS frame_h48
       |FROM fr ORDER BY media_id, frame_idx""".stripMargin
  }

  /** Shared pHash CTE chain over `corpus` (any SQL yielding (media_id,
    * text)): the payload body is the document text (ASCII — char `substr`
    * chunks exactly like the byte codec), the region hash is the
    * md5-prefix signed-64 parse of Sketch.simhashFpCtes, the
    * sign-sum/assembly replays the same CASE tree. Yields `v` (with fmt
    * for consumers that need it) and `fps` (media_id, fp). */
  private def phashCtes(corpus: String): String = {
    val nibbleTerms = (1 to 16).map { i =>
      s"(strpos('0123456789abcdef', substr(m, $i, 1)) - 1)::HUGEINT * ${BigInt(16).pow(16 - i)}"
    }.mkString(" + ")
    val pow2Rows = (0 until 64).map(b => s"($b, ${BigInt(2).pow(b)})").mkString(", ")
    s"""v AS (
       |  SELECT media_id,
       |    CASE CAST(media_id % 3 AS INT) WHEN 0 THEN 'img' WHEN 1 THEN 'aud'
       |         ELSE 'vid' END AS fmt,
       |    text, CAST(strlen(text) // $FrameBytes AS INT) AS n_frames
       |  FROM ($corpus) WHERE strlen(text) >= $FrameBytes
       |), fr AS (
       |  SELECT media_id,
       |    md5(substr(text, 1 + CAST(j AS INT) * $FrameBytes, $FrameBytes)) AS m
       |  FROM (SELECT media_id, text, unnest(range(0, n_frames)) AS j FROM v)
       |), th AS (
       |  SELECT media_id,
       |    CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
       |              THEN u - 18446744073709551616::HUGEINT ELSE u END AS BIGINT) AS h
       |  FROM (SELECT media_id, $nibbleTerms AS u FROM fr)
       |), bits AS (
       |  SELECT media_id, b,
       |    CASE WHEN SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) > 0
       |         THEN 1 ELSE 0 END AS bit
       |  FROM th CROSS JOIN range(0, 64) t(b) GROUP BY 1, 2
       |), pw(b, p) AS (VALUES $pow2Rows),
       |fps AS (
       |  SELECT media_id,
       |    CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
       |              THEN u - 18446744073709551616::HUGEINT ELSE u END AS BIGINT) AS fp
       |  FROM (SELECT bits.media_id, SUM(bit::HUGEINT * p) AS u
       |        FROM bits JOIN pw ON bits.b = pw.b GROUP BY 1)
       |)""".stripMargin
  }

  private val phashBands = 64 / PhashBandBits
  private val phashMask = (1 << PhashBandBits) - 1

  /** DuckDB twin of [[multimodalDedup]]: banding masks make
    * arithmetic-vs-logical shift immaterial. */
  val multimodalDedupSql: String =
    s"""WITH ${phashCtes("SELECT doc_id AS media_id, text FROM documents")}, bd AS (
       |  SELECT f.media_id, v.fmt, fp, t.b,
       |    (fp >> ($PhashBandBits * t.b)) & $phashMask AS bkt
       |  FROM fps f JOIN v ON f.media_id = v.media_id, range(0, $phashBands) t(b)
       |), cand AS (
       |  SELECT DISTINCT x.media_id AS media_a, y.media_id AS media_b,
       |    x.fmt AS fmt_a, y.fmt AS fmt_b, x.fp AS fa, y.fp AS fb
       |  FROM bd x JOIN bd y
       |    ON x.b = y.b AND x.bkt = y.bkt AND x.media_id < y.media_id
       |)
       |SELECT media_a, media_b, fmt_a, fmt_b,
       |  CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
       |FROM cand WHERE bit_count(xor(fa, fb)) <= $PhashMaxHamming
       |ORDER BY media_a, media_b""".stripMargin

  /** DuckDB twin of [[multimodalIndexProbe]]: the corpus is history ∪ the
    * leaked batch; candidacy keeps only cross-group band collisions. */
  val multimodalIndexProbeSql: String = {
    import graft.operators.CorpusOps.{BenchmarkMod, ContaminatedShift}
    val corpus =
      s"""SELECT doc_id AS media_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + $ContaminatedShift AS media_id,
         |    text || ' leaked' AS text
         |  FROM documents WHERE doc_id % $BenchmarkMod = 0""".stripMargin
    s"""WITH ${phashCtes(corpus)}, bd AS (
       |  SELECT media_id, fp, t.b,
       |    (fp >> ($PhashBandBits * t.b)) & $phashMask AS bkt
       |  FROM fps, range(0, $phashBands) t(b)
       |), cand AS (
       |  SELECT DISTINCT
       |    CASE WHEN x.media_id >= $ContaminatedShift THEN x.media_id ELSE y.media_id END AS batch_id,
       |    CASE WHEN x.media_id >= $ContaminatedShift THEN y.media_id ELSE x.media_id END AS hist_id,
       |    CASE WHEN x.media_id >= $ContaminatedShift THEN x.fp ELSE y.fp END AS bfp,
       |    CASE WHEN x.media_id >= $ContaminatedShift THEN y.fp ELSE x.fp END AS hfp
       |  FROM bd x JOIN bd y
       |    ON x.b = y.b AND x.bkt = y.bkt AND x.media_id < y.media_id
       |  WHERE (x.media_id >= $ContaminatedShift) <> (y.media_id >= $ContaminatedShift)
       |)
       |SELECT batch_id, hist_id,
       |  CAST(bit_count(xor(bfp, hfp)) AS INT) AS hamming
       |FROM cand WHERE bit_count(xor(bfp, hfp)) <= $PhashMaxHamming
       |ORDER BY batch_id, hist_id""".stripMargin
  }

  /** DuckDB twin of [[multimodalContainment]]: frames re-derived from the
    * document text (body bytes == text, ASCII — see [[multimodalFramesSql]]),
    * hashes via the md5-prefix-48 idiom, τ-gate as an exact-integer
    * division. The clip body is the same char-substring slice the Spark
    * generator takes. */
  val multimodalContainmentSql: String = {
    val hex12 = (1 to 12).map(i =>
      s"((strpos('0123456789abcdef', substr(mh, $i, 1)) - 1)::BIGINT << ${4 * (12 - i)})")
      .mkString(" + ")
    def frames(src: String, idCol: String) =
      s"""SELECT DISTINCT $idCol, CAST($hex12 AS BIGINT) AS frame_h48
         |  FROM (
         |    SELECT $idCol,
         |      md5(substr(body, 1 + CAST(j AS INT) * $FrameBytes, $FrameBytes)) AS mh
         |    FROM (SELECT $idCol, body,
         |            unnest(range(0, CAST(strlen(body) // $FrameBytes AS BIGINT))) AS j
         |          FROM $src))""".stripMargin
    s"""WITH hist AS (
       |  SELECT doc_id AS hist_id, text AS body FROM documents
       |  WHERE doc_id % 3 = 2
       |), clips AS (
       |  SELECT doc_id + $ClipShift AS clip_id,
       |    substr(text, ${ClipSkipFrames * FrameBytes + 1},
       |           ${ClipFrames * FrameBytes}) AS body
       |  FROM documents
       |  WHERE doc_id % 3 = 2 AND doc_id % $ClipMod = 0
       |    AND strlen(text) >= ${(ClipSkipFrames + ClipFrames) * FrameBytes}
       |), hf AS (${frames("hist", "hist_id")}),
       |cf AS (${frames("clips", "clip_id")}),
       |nc AS (SELECT clip_id, COUNT(*) AS n_clip FROM cf GROUP BY 1),
       |m AS (
       |  SELECT clip_id, hist_id, COUNT(*) AS n_match
       |  FROM cf JOIN hf USING (frame_h48) GROUP BY 1, 2)
       |SELECT m.clip_id, hist_id, n_match, n_clip,
       |  CAST(n_match AS DOUBLE) / n_clip AS containment
       |FROM m JOIN nc ON m.clip_id = nc.clip_id
       |WHERE CAST(n_match AS DOUBLE) / n_clip >= $ContainTau
       |ORDER BY 1, 2""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "multimodal_meta" -> multimodalMetaSql,
    "multimodal_similar" -> multimodalSimilarSql,
    "multimodal_frames" -> multimodalFramesSql,
    "multimodal_dedup" -> multimodalDedupSql,
    "multimodal_containment" -> multimodalContainmentSql,
    "phash_index_probe" -> multimodalIndexProbeSql
  )
}
