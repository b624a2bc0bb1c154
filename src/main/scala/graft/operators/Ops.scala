package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.vectors._
import graft.functions.textsketch._

/** The engine's reusable operator API. The `SparkEntry` queries are canned
  * demonstrations over the test star schema; real users call these.
  *
  * Every operator documents its shuffle budget — the number of exchanges it
  * contributes at any scale — because that, not row count, is what survives
  * a 100× scale-up.
  */

/** As-of (nearest-past) join — Spark has no native one.
  * Shuffle budget: ONE exchange (both sides co-partitioned by key, one
  * window sort). No range explosion, no broadcast requirement on either
  * side, skew handled by AQE like any other shuffle.
  */
object AsofJoin {

  /** For each left row, attach `valueCols` from the latest right row with
    * `right.timeCol <= left.timeCol` within the same `keyCol` group.
    * On exact time ties the right row wins (matches ASOF `>=` semantics).
    * `tieCol` must make (timeCol, tieCol) unique per key for fully
    * deterministic output.
    */
  def asof(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
      tieCol: String, valueCols: Seq[String]): DataFrame = {
    val l = left.withColumn("_side", lit(1))
    val r = right.withColumn("_side", lit(0))
    val lCols = left.columns.toSet
    val rOnly = valueCols.filterNot(lCols.contains)
    // align schemas: left gets null right-value columns and vice versa
    val lAligned = rOnly.foldLeft(l)((df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType)))
    val rAligned = left.columns.filterNot(right.columns.contains)
      .foldLeft(r)((df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = lAligned.select(
      (left.columns ++ rOnly :+ "_side").map(col).toIndexedSeq: _*)
      .unionByName(rAligned.select(
        (left.columns ++ rOnly :+ "_side").map(col).toIndexedSeq: _*))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("_side"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry ONE struct of all value columns (not per-column last()): a
    // matched right row with a legitimately NULL value field must surface
    // that NULL, not an older row's value — per-column carry would mix
    // fields from different right rows.
    val carried = unioned.withColumn("_carry",
      last(when(col("_side") === 0, struct(valueCols.map(col): _*)),
        ignoreNulls = true).over(w))
    val unpacked = valueCols.foldLeft(carried) { (df, c) =>
      df.withColumn(c, col("_carry").getField(c))
    }
    unpacked.filter(col("_side") === 1).drop("_side", "_carry")
  }

  /** Nearest-neighbor as-of: attach the right row whose time is CLOSEST to
    * the left row's, in either direction (backward `<=` or forward `>`),
    * within the same key. Δ ties break backward (and an exact time match
    * IS a backward match at Δ = 0 — same `>=` convention as [[asof]]).
    * `rTimeCol` names the carried right-time value column the Δ compare
    * reads; it must be one of `valueCols`.
    *
    * Shuffle budget: still ONE exchange — both carries (backward `last`
    * over unbounded-preceding, forward `first` over unbounded-following)
    * ride the SAME union sort; the nearest pick is a pure row-local
    * expression. This is the shape a naive "min(abs(Δ))" join can't reach
    * without a per-left-row aggregation over all right rows. */
  def asofNearest(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, tieCol: String, valueCols: Seq[String],
      rTimeCol: String): DataFrame = {
    require(valueCols.contains(rTimeCol),
      s"rTimeCol $rTimeCol must be carried in valueCols")
    val l = left.withColumn("_side", lit(1))
    val r = right.withColumn("_side", lit(0))
    val lCols = left.columns.toSet
    val rOnly = valueCols.filterNot(lCols.contains)
    val lAligned = rOnly.foldLeft(l)((df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType)))
    val rAligned = left.columns.filterNot(right.columns.contains)
      .foldLeft(r)((df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = lAligned.select(
      (left.columns ++ rOnly :+ "_side").map(col).toIndexedSeq: _*)
      .unionByName(rAligned.select(
        (left.columns ++ rOnly :+ "_side").map(col).toIndexedSeq: _*))
    val order = Seq(col(timeCol), col("_side"), col(tieCol))
    val wB = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val rStruct = when(col("_side") === 0, struct(valueCols.map(col): _*))
    // same-time right rows sort BEFORE the left row (side 0 < 1): they
    // land in the backward frame (Δ = 0) and are excluded from the
    // forward frame — ASOF ">=" semantics fall out of the sort order
    val carried = unioned
      .withColumn("_b", last(rStruct, ignoreNulls = true).over(wB))
      .withColumn("_f", first(rStruct, ignoreNulls = true).over(wF))
    val dB = col(timeCol) - col("_b").getField(rTimeCol)
    val dF = col("_f").getField(rTimeCol) - col(timeCol)
    val picked = carried
      .withColumn("_pick",
        when(col("_b").isNull, col("_f"))
          .when(col("_f").isNull, col("_b"))
          .when(dB <= dF, col("_b")).otherwise(col("_f")))
      .withColumn("matched_direction",
        when(col("_b").isNull && col("_f").isNull, lit(null).cast("string"))
          .when(col("_b").isNull, lit("f"))
          .when(col("_f").isNull, lit("b"))
          .when(dB <= dF, lit("b")).otherwise(lit("f")))
    val unpacked = valueCols.foldLeft(picked) { (df, c) =>
      df.withColumn(c, col("_pick").getField(c))
    }
    unpacked
      .withColumn("delta_us",
        when(col("_pick").isNull, lit(null).cast("long"))
          .otherwise(abs(col(timeCol) - col(rTimeCol)).cast("long")))
      .filter(col("_side") === 1)
      .drop("_side", "_b", "_f", "_pick")
  }
}

/** Range (point-in-interval) join — Spark's other missing join. A naive
  * `t BETWEEN start AND end` condition plans as BroadcastNestedLoopJoin
  * (quadratic). Bucketizing turns it into an equi-join:
  * intervals explode into the buckets they span (bounded by
  * maxInterval/bucketWidth + 1 per row), points map to ONE bucket, the join
  * keys on the bucket, and the exact range predicate filters residuals.
  * Shuffle budget: one exchange keyed by bucket; no replication of the
  * point side, no nested loop.
  */
object RangeJoin {

  /** Inner-join each point row to every interval row (same `keyCol`) whose
    * [startCol, endCol] contains `tCol`. All three are numeric (e.g. epoch
    * micros). `bucketWidth` should be ≥ the typical interval length. */
  def pointInInterval(points: DataFrame, intervals: DataFrame, keyCol: String,
      tCol: String, startCol: String, endCol: String, bucketWidth: Long): DataFrame = {
    val p = points.withColumn("_bkt", floor(col(tCol) / bucketWidth))
    val i = intervals.withColumn("_bkt",
      explode(sequence(floor(col(startCol) / bucketWidth),
        floor(col(endCol) / bucketWidth))))
    p.join(i, Seq(keyCol, "_bkt"))
      .filter(col(tCol) >= col(startCol) && col(tCol) <= col(endCol))
      .drop("_bkt")
  }

  /** Interval-OVERLAP equi-join (closed intervals, numeric bounds): every
    * (a, b) pair with `[sA,eA] ∩ [sB,eB] ≠ ∅`, sharing `keys` if given.
    * Each side explodes into its covered fixed-width buckets and the range
    * predicate becomes a hash equi-join on (keys, bucket) — no nested
    * loop, no side replication beyond span/bucketWidth rows per interval.
    *
    * A pair sharing several buckets would duplicate; the OWNERSHIP rule
    * dedups for free — a pair counts only in the first bucket BOTH
    * intervals cover, `max(⌊sA/w⌋, ⌊sB/w⌋)`, a pure filter instead of a
    * distinct shuffle. Pick `bucketWidth` near the typical interval length
    * (shorter → more replication; longer → fatter buckets). */
  def intervalOverlap(a: DataFrame, b: DataFrame, keys: Seq[String],
      sA: String, eA: String, sB: String, eB: String,
      bucketWidth: Long): DataFrame = {
    def bucketed(df: DataFrame, s: String, e: String) =
      df.withColumn("_bkt", explode(sequence(
        floor(col(s) / bucketWidth), floor(col(e) / bucketWidth))))
    bucketed(a, sA, eA).join(bucketed(b, sB, eB), keys :+ "_bkt")
      .filter(col(sA) <= col(eB) && col(sB) <= col(eA))
      .filter(col("_bkt") === greatest(floor(col(sA) / bucketWidth),
        floor(col(sB) / bucketWidth)))
      .drop("_bkt")
  }
}

/** Gap-based sessionization.
  * Shuffle budget: ONE exchange (partition by entity, one window sort);
  * the session aggregation reuses the same partitioning. */
object Sessionize {

  /** Assign a per-entity `session_id` (1-based) using a max-gap rule over
    * an epoch-microsecond time column. */
  def assign(df: DataFrame, entityCol: String, tsUsCol: String,
      gapUs: Long, tieCol: String): DataFrame = {
    val ord = Window.partitionBy(col(entityCol)).orderBy(col(tsUsCol), col(tieCol))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_prev", lag(col(tsUsCol), 1).over(ord))
      .withColumn("_new",
        when(col("_prev").isNull || col(tsUsCol) - col("_prev") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("_new")).over(run))
      .drop("_prev", "_new")
  }
}

/** Deduplication family. All variants emit candidate/duplicate PAIRS or
  * keeper groups; callers decide the survivorship policy. */
object Dedup {

  /** Exact dedup groups by content hash.
    * Shuffle budget: ONE exchange with map-side partial aggregation. */
  def exactGroups(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(sha2(col(contentCol), 256).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keeper_id"))

  /** Exact n-gram Jaccard pairs via a shingle inverted index.
    * Shuffle budget: shingle-keyed self-join + pair aggregation. Exact —
    * use as the verify stage behind [[minhashLshPairs]] at corpus scale.
    *
    * `maxShingleDf` is the scale guard: a shingle appearing in d documents
    * contributes d² join rows, so stop-shingles (boilerplate, headers)
    * dominate cost while contributing almost nothing to high-Jaccard pairs.
    * Capping document frequency bounds the join quadratically; the result
    * becomes a (tight) under-count, so keep it None when exactness is
    * required and the corpus allows it.
    *
    * `sampleDenomB` is the other scale guard, for CENSUS consumers (the
    * C88 board): restrict the LARGER pair member (`id_b`, the side a
    * keep-min policy removes) to the deterministic `id % denom == 0`
    * slice. Each slice doc still pairs against the FULL corpus, so the
    * slice's removal rate is the exact removal rate of those docs — an
    * unbiased estimate of the corpus rate whose join cost is 1/denom of
    * the full self-join (linear in corpus size when denom tracks the
    * corpus growth, vs quadratic). Pairs themselves are a 1/denom subset,
    * so keep it None when the PAIR LIST (not the rate) is the product. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxShingleDf: Option[Int] = None,
      sampleDenomB: Option[Long] = None): DataFrame = {
    val d = df.select(col(idCol).as("_id"), word_shingles(col(textCol), n).as("_sh"))
    val exAll = d.select(col("_id"), explode(col("_sh")).as("_s"))
    val ex = maxShingleDf match {
      case None => exAll
      case Some(cap) =>
        // one extra partial-agg shuffle to measure df, then an equi-join
        // (broadcast while the hot-shingle list is small) to drop them
        val hot = exAll.groupBy(col("_s")).count().filter(col("count") > cap)
          .select(col("_s"))
        exAll.join(broadcast(hot), Seq("_s"), "left_anti")
    }
    val exB = sampleDenomB.fold(ex)(den => ex.filter(col("_id") % den === 0))
    val sizes = d.select(col("_id"), size(col("_sh")).as("_n"))
    val pairs = ex.as("a").join(exB.as("b"),
        col("a._s") === col("b._s") && col("a._id") < col("b._id"))
      .groupBy(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .agg(count(lit(1)).as("intersection"))
    pairs
      .join(sizes.select(col("_id").as("id_a"), col("_n").as("size_a")), "id_a")
      .join(sizes.select(col("_id").as("id_b"), col("_n").as("size_b")), "id_b")
      .withColumn("jaccard", col("intersection").cast("double") /
        (col("size_a") + col("size_b") - col("intersection")))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact Jaccard pairs via PREFIX FILTERING (Chaudhuri et al. ICDE'06's
    * SSJoin principle, the candidate stage PPJoin builds on — Xiao et
    * al. WWW'08): under ANY global total order of shingles, two sets
    * with J ≥ t must share a shingle inside their first
    * |X| − ⌈t·|X|⌉ + 1 shingles, so the candidate join keys on PREFIX
    * shingles only instead of all of them. The order is ascending
    * document frequency (ties by shingle text) — rare-first prefixes
    * minimize fanout, and a boilerplate shingle shared by a million
    * docs lands in almost no prefix at all (the hot-key problem C4's
    * full inverted join needs `maxShingleDf` to dodge becomes
    * self-limiting). `t` is the exact rational tNum/tDen: ⌈t·n⌉ runs in
    * INTEGER arithmetic ((tNum·n + tDen − 1) div tDen) — a float ceil
    * of 0.4·5 lands on 3, silently shortening the prefix below the
    * sound bound (a real false-negative hazard, found at design time).
    * Verification fetches candidate pairs' full shingle sets BY ID and
    * intersects per-row (no shingle is ever a join key there), emitting
    * exactly [[ngramJaccardPairs]]'s columns — same output, same
    * oracle, different (and at scale strictly smaller) candidate set.
    *
    * Scale shape: one shingle-df partial agg, one doc-key window for
    * the per-doc order, the prefix-keyed candidate join (bounded by
    * prefix df², with prefixes rare-first), two id-keyed verify joins
    * bounded by |candidates|. */
  def ngramJaccardPrefixPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, tNum: Int, tDen: Int): DataFrame = {
    // NOT checkpointed: the shingle frame feeds the prefix explode and
    // both verify joins, but the codegen shingle kernel re-computes
    // cheaper than materializing 260 k packed arrays buys back
    // (re-measured after the r15 window-df rewrite: lazy checkpoint
    // 3.62 s vs recompute 3.59 s at sf0.1 — the kernel is not the tail)
    val d = df.select(col(idCol).as("_id"),
      word_shingles(col(textCol), n).as("_sh"))
    // |doc| rides the explode row (size() before the generator), so the
    // prefix stage needs NO second window; the df board and every join
    // key are the shingle's xxhash64 — strings never ride the hash-keyed
    // shuffles (r14 verdict #1 overhead cuts). A hash collision only
    // MERGES two shingles' df and candidate buckets — a candidate-set
    // superset, discharged by the exact verify stage.
    val ex = d.select(col("_id"), size(col("_sh")).as("_n"),
        explode(col("_sh")).as("_s"))
      .withColumn("_hsh", xxhash64(col("_s")))
    // df as ONE hash-key window over the exploded stream — a groupBy df
    // board costs a second corpus scan (the agg branch re-runs the
    // shingle kernel) plus a join; the window is one exchange on the
    // same rows (r15 plan audit: the join spelling re-scanned documents)
    val byHash = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_hsh"))
    // the global shingle order is (df-of-hash, SHINGLE STRING): the
    // string tie-break keeps the order TOTAL even across hash collisions
    // — with ties broken per-doc by row_number alone, two docs could
    // rank colliding shingles oppositely and the prefix-filtering
    // theorem's shared-prefix guarantee would silently break
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_id")).orderBy(col("_f"), col("_s"))
    val prefix = ex.withColumn("_f", count(lit(1)).over(byHash))
      .withColumn("_rn", row_number().over(byDoc))
      // ⌈t·n⌉ in exact integers; prefix keeps rn ≤ n − ⌈t·n⌉ + 1
      .filter(col("_rn") <=
        col("_n") - expr(s"($tNum * _n + ${tDen - 1}) div $tDen") + 1)
      .select(col("_id"), col("_hsh"), col("_rn"), col("_n"))
    // PPJoin's two candidate pruners, both in exact integers:
    //  - LENGTH: J ≥ t forces t·|A| ≤ |B| ≤ |A|/t (cross-multiplied);
    //  - POSITION: the required overlap is α = ⌈t/(1+t)·(nA+nB)⌉, and
    //    the FIRST common token (at ranks rA, rB under the shared
    //    global order — inside both prefixes by the filtering theorem)
    //    bounds it: o ≤ min(nA−rA, nB−rB)+1, so a pair whose BEST
    //    matched-prefix bound misses α cannot reach t. Without these
    //    the prefix join alone left 12 s of stop-shingle candidate
    //    fanout at sf0.1 (r14 bench finding) — these are the filters
    //    that make prefix joins beat the inverted index in the paper.
    // hint: SORT-MERGE self-join, not broadcast — the two sides are the
    // IDENTICAL subplan, so SMJ plans ONE hash-keyed exchange and reuses
    // it (ReusedExchange), while a broadcast side re-computes the whole
    // explode+df+window chain a second time (r15 plan audit: the
    // broadcast shape ran the shingle kernel twice and measured slower
    // even at sf0.1's 260 k rows). At deploy the prefix table is
    // corpus-sized, where broadcast is not even an option.
    val cands = prefix.as("a").hint("merge")
      .join(prefix.as("b").hint("merge"),
        col("a._hsh") === col("b._hsh") && col("a._id") < col("b._id") &&
        col("b._n") * tDen >= col("a._n") * tNum &&
        col("a._n") * tDen >= col("b._n") * tNum)
      .groupBy(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .agg(max(least(col("a._n") - col("a._rn"),
          col("b._n") - col("b._rn")) + 1).as("_ub"),
        first(col("a._n")).as("_na"), first(col("b._n")).as("_nb"))
      .filter(col("_ub") >=
        expr(s"($tNum * (_na + _nb) + ${tNum + tDen - 1}) " +
          s"div ${tNum + tDen}"))
      .select(col("id_a"), col("id_b"))
    cands
      .join(d.select(col("_id").as("id_a"), col("_sh").as("_sha")), "id_a")
      .join(d.select(col("_id").as("id_b"), col("_sh").as("_shb")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("_sha"), col("_shb"))).cast("long")
          .as("intersection"), // ngramJaccardPairs' COUNT is BIGINT
        size(col("_sha")).as("size_a"), size(col("_shb")).as("size_b"))
      .withColumn("jaccard", col("intersection").cast("double") /
        (col("size_a") + col("size_b") - col("intersection")))
      .filter(col("jaccard") >= lit(tNum.toDouble / tDen))
  }

  /** Exact-Jaccard verification of CANDIDATE pairs — the scale-shaped verify
    * stage behind [[minhashLshPairs]]/[[simhashPairs]]: instead of the
    * shingle-keyed self-join of [[ngramJaccardPairs]] (quadratic in shingle
    * document frequency), each candidate pair fetches both shingle sets by
    * id and intersects them per-row.
    * Shuffle budget: two id-keyed equi-joins, each bounded by |candidates| —
    * a boilerplate shingle shared by a million documents costs nothing here,
    * because no shingle is ever a join key. */
  def verifyJaccardPairs(candidates: DataFrame, df: DataFrame, idCol: String,
      textCol: String, n: Int, threshold: Double): DataFrame = {
    val sh = df.select(col(idCol).as("_id"), word_shingles(col(textCol), n).as("_sh"))
    candidates.select(col("id_a"), col("id_b"))
      .join(sh.select(col("_id").as("id_a"), col("_sh").as("_sha")), "id_a")
      .join(sh.select(col("_id").as("id_b"), col("_sh").as("_shb")), "id_b")
      .withColumn("intersection", size(array_intersect(col("_sha"), col("_shb"))))
      .withColumn("jaccard", col("intersection").cast("double") /
        (size(col("_sha")) + size(col("_shb")) - col("intersection")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Per-document duplicated-substring statistics (the exact-substring
    * dedup signal of Lee et al., "Deduplicating Training Data Makes
    * Language Models Better", arXiv:2107.06499): a document's w-token
    * windows that also occur in ANOTHER document mark memorization-prone
    * boilerplate; `dup_frac` is the removal/masking criterion.
    *
    * Windows are the distinct-per-document word shingles (within-doc
    * repeats count once — the cross-document signal is the target), so a
    * window's document frequency is exactly the number of docs containing
    * it.
    *
    * Scale shape — LINEAR where pair-joins are quadratic: one window-keyed
    * partial aggregation measures df, one window-keyed 1:df equi-join flags
    * each (doc, window) occurrence, one doc-keyed aggregation rolls up. A
    * boilerplate window in a million docs costs a million join rows (not a
    * trillion pair rows); AQE skew-split handles the hottest keys. */
  def duplicatedWindowStats(df: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    val sh = df.select(col(idCol).as("_id"),
      explode(word_shingles(col(textCol), w)).as("_s"))
    val dfreq = sh.groupBy(col("_s")).agg(count(lit(1)).as("_df"))
    sh.join(dfreq, "_s")
      .groupBy(col("_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("_df") > 1, 1L).otherwise(0L)).as("dup_windows"))
      .select(col("_id").as("doc_id"), col("n_windows"), col("dup_windows"),
        (col("dup_windows").cast("double") / col("n_windows")).as("dup_frac"))
  }

  /** The REMOVAL companion to [[duplicatedWindowStats]] (Lee et al.,
    * arXiv:2107.06499, ExactSubstr): every token covered by a w-token
    * window that also occurs in ANOTHER document is scrubbed — from
    * EVERY carrier, the memorization-prevention reading (a span the
    * corpus repeats is masked wherever it appears; the keep-one-copy
    * variant composes a keeper policy like C17's min-id on top of the
    * same df census). Within-doc-only repeats survive, matching C44's
    * cross-document signal.
    *
    * Scale shape — LINEAR like C44, never a pair join: one positional
    * window explode (map), the SAME distinct-per-doc window df census,
    * one window-keyed 1:df equi-join back to flag dup starts, one
    * doc-keyed aggregation collecting the (bounded by doc length) start
    * list, and the scrub itself is pure array algebra per row. The
    * per-token coverage test is exists() over the start list — O(len ×
    * starts) per doc, fine at document scale; an interval-merge fold
    * drops it to O(len) if ever needed. */
  /** Tokenization parity with the word_shingles kernel (Java
    * trim/split): SQL trim strips only ' ' and SQL split keeps edge
    * empties, so text edged with '\n'/'\t' would tokenize differently
    * from C44's census — filtering empties after a raw \s+ split is
    * equivalent to Java's trim-then-split for every whitespace edge. */
  private[operators] def scrubToks(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol).as("_id"),
      expr(s"filter(split(`$textCol`, '\\\\s+'), x -> x != '')").as("_t"))

  /** Positional w-windows of each doc: (_id, _i start position, _s text). */
  private[operators] def scrubWindows(toks: DataFrame, w: Int): DataFrame =
    toks
      .select(col("_id"), explode(expr(
        s"IF(size(_t) >= $w, transform(sequence(1, size(_t) - ${w - 1}), " +
          s"i -> struct(i AS i, array_join(slice(_t, i, $w), ' ') AS s)), " +
          "array())")).as("_w"))
      .select(col("_id"), col("_w.i").as("_i"), col("_w.s").as("_s"))

  /** The cross-document duplicated-window census behind
    * [[scrubDuplicatedWindows]] — one `_s` column, every w-window
    * carried by ≥ 2 documents (per-doc distinct, C44's spelling). Split
    * out so a streaming twin can FREEZE it on the corpus snapshot and
    * scrub arrivals against it (the B51/B75 frozen-model discipline). */
  def dupWindowsOf(df: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    val ex = scrubWindows(scrubToks(df, idCol, textCol), w)
    ex.select(col("_id"), col("_s")).distinct()
      .groupBy(col("_s")).agg(count(lit(1)).as("_df"))
      .filter(col("_df") > 1).select(col("_s"))
  }

  def scrubDuplicatedWindows(df: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame =
    scrubWithDupWindows(dupWindowsOf(df, idCol, textCol, w),
      df, idCol, textCol, w)

  /** The scrub half against a PRECOMPUTED dup-window set (O(dup
    * windows), broadcast-class at any corpus the census fits): flag dup
    * starts with one window-keyed equi-join, collect per doc, scrub as
    * pure array algebra. */
  def scrubWithDupWindows(dupWindows: DataFrame, df: DataFrame,
      idCol: String, textCol: String, w: Int): DataFrame = {
    val toks = scrubToks(df, idCol, textCol)
    val ex = scrubWindows(toks, w)
    val dupStarts = ex.join(dupWindows, Seq("_s"))
      .groupBy(col("_id"))
      .agg(sort_array(collect_list(col("_i"))).as("_starts"))
    toks.join(dupStarts, Seq("_id"), "left")
      .select(col("_id").as("doc_id"), col("_t"),
        coalesce(col("_starts"), expr("CAST(array() AS array<int>)"))
          .as("_ss"))
      .select(col("doc_id"), size(col("_t")).cast("bigint").as("n_tokens"),
        expr(s"filter(transform(sequence(1, size(_t)), p -> " +
          s"struct(p AS p, element_at(_t, p) AS t)), x -> " +
          s"NOT exists(_ss, s -> s <= x.p AND x.p <= s + ${w - 1}))")
          .as("_kept"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - size(col("_kept"))).cast("bigint")
          .as("n_removed"),
        expr("array_join(transform(_kept, x -> x.t), ' ')")
          .as("scrubbed_text"))
  }

  /** The SPAN EXTRACTION over a precomputed dup-window set (r11
    * next-round #2's last piece): the merged per-document intervals of
    * duplicated text — exactly the removal plan C96's scrub executes
    * and the span list Lee et al. (arXiv:2107.06499) publish per
    * corpus. Each dup start i covers tokens [i, i+w−1]; with a FIXED
    * width the interval end is monotone in the start, so merging is
    * one gaps-and-islands pass: a new island opens iff the start gap
    * exceeds w (the classic trick, no interval-tree needed). Σ span_len
    * per doc == the scrub's n_removed by construction — pinned in spec
    * as a frame-level conservation law.
    *
    * Scale shape: the same linear census join as the scrub, ONE doc-key
    * window for the island numbering (dup starts only — already a tiny
    * fraction of positions), one (doc, island) rollup. */
  def dupSpansWithDupWindows(dupWindows: DataFrame, df: DataFrame,
      idCol: String, textCol: String, w: Int): DataFrame = {
    val ex = scrubWindows(scrubToks(df, idCol, textCol), w)
    val st = ex.join(dupWindows, Seq("_s")).select(col("_id"), col("_i"))
    dupSpansFromStarts(st, w)
  }

  /** The gaps-and-islands merge over ANY (_id, _i) dup-start frame
    * (1-based token starts of duplicated w-windows) — shared by the
    * window-census path above (C105) and the suffix-array path
    * ([[graft.operators.CorpusOps.dupSpansSaOn]], C106), which derive
    * the SAME start set by different machinery. */
  private[operators] def dupSpansFromStarts(st: DataFrame,
      w: Int): DataFrame = {
    val byI = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_id")).orderBy(col("_i"))
    st.withColumn("_prev", lag(col("_i"), 1).over(byI))
      .withColumn("_brk",
        when(col("_prev").isNull || col("_i") - col("_prev") > w, 1)
          .otherwise(0))
      .withColumn("_isl", sum(col("_brk")).over(byI))
      .groupBy(col("_id"), col("_isl"))
      .agg(min(col("_i")).as("_s0"), max(col("_i")).as("_s1"))
      .select(col("_id").as("doc_id"),
        col("_s0").cast("long").as("span_start"),
        (col("_s1") - col("_s0") + w).cast("long").as("span_len"))
      .orderBy(col("doc_id"), col("span_start"))
  }

  /** MinHash-LSH near-dup candidate pairs with signature-estimated Jaccard.
    * Shuffle budget: band-bucket self-join only — all sketching is
    * map-side. Tune (numHashes, bands) for the recall/cost point. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
      minEstJaccard: Double = 0.35): DataFrame = {
    val rows = numHashes / bands
    val sigs = df
      .select(col(idCol).as("_id"), word_shingles(col(textCol), shingleN).as("_sh"))
      .filter(size(col("_sh")) > 0)
      .select(col("_id"), minhash_signature(col("_sh"), numHashes).as("_sig"))
    // exact band tuples as the join key (not a hash of them): candidacy is
    // precisely "shares >= 1 band", no cross-band hash-collision caveat,
    // and the semantics are replicable by any engine (the DuckDB oracle)
    val bandKeys = array((0 until bands).map { b =>
      struct(lit(b).as("b") +: (0 until rows).map(r =>
        element_at(col("_sig"), b * rows + r + 1).as(s"s$r")): _*)
    }: _*)
    val bucketed = sigs.select(col("_id"), col("_sig"), explode(bandKeys).as("_bkt"))
    // sig_overlap is a codegen'd loop, so estimating on band-duplicated
    // candidates is cheap and only (id_a, id_b, est) survivors reach the
    // dedup shuffle
    bucketed.as("a").join(bucketed.as("b"),
        col("a._bkt") === col("b._bkt") && col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"),
        (sig_overlap(col("a._sig"), col("b._sig")).cast("double") / numHashes)
          .as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
      .dropDuplicates("id_a", "id_b")
  }

  /** MinHash-LSH candidates ACROSS two corpora (left ⋈ right, not a
    * self-join): the fuzzy cross-dedup shape — dedup a new corpus against
    * an old one, or near-dup-decontaminate training data against a
    * benchmark suite. The right side is expected to be the SMALL one
    * (benchmark/eval suites are MBs): its bucketed signatures broadcast, so
    * the left corpus is sketched map-side and never shuffles.
    *
    * Candidacy = "shares ≥ 1 exact band tuple", same definition as
    * [[minhashLshPairs]] — and deliberately NO estimate filter: the exact
    * verify stage ([[verifyJaccardPairs]]) decides, so the result is a
    * deterministic function of the band layout that any engine replays. */
  def minhashLshPairsAcross(left: DataFrame, right: DataFrame, idCol: String,
      textCol: String, shingleN: Int = 3, numHashes: Int = 64,
      bands: Int = 16): DataFrame = {
    val rows = numHashes / bands
    val bandKeys = array((0 until bands).map { b =>
      struct(lit(b).as("b") +: (0 until rows).map(r =>
        element_at(col("_sig"), b * rows + r + 1).as(s"s$r")): _*)
    }: _*)
    def bucketed(df: DataFrame) = df
      .select(col(idCol).as("_id"), word_shingles(col(textCol), shingleN).as("_sh"))
      .filter(size(col("_sh")) > 0)
      .select(col("_id"), minhash_signature(col("_sh"), numHashes).as("_sig"))
      .select(col("_id"), explode(bandKeys).as("_bkt"))
    bucketed(left).as("a")
      .join(broadcast(bucketed(right)).as("b"), col("a._bkt") === col("b._bkt"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  // --- Persisted near-dup index (the ivfBuild discipline for LSH) -----------
  /** Sketch stage shared by the index build and probe: (_id, _sig, _bkt)
    * band-tuple rows, all map-side. */
  private def sketchBands(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    val bandKeys = array((0 until bands).map { b =>
      struct(lit(b).as("b") +: (0 until rows).map(r =>
        element_at(col("_sig"), b * rows + r + 1).as(s"s$r")): _*)
    }: _*)
    df.select(col(idCol).as("_id"), word_shingles(col(textCol), shingleN).as("_sh"))
      .filter(size(col("_sh")) > 0)
      .select(col("_id"), minhash_signature(col("_sh"), numHashes).as("_sig"))
      .select(col("_id"), col("_sig"), explode(bandKeys).as("_bkt"))
  }

  /** Persist the history corpus' MinHash band index: the EXPENSIVE half of
    * recurring near-dup detection — shingling + 64-hash sketching of the
    * full history — runs ONCE here and every subsequent batch probes the
    * stored (band tuple, id, signature) rows instead of re-sketching 100 TB.
    * The layout spreads rows by band-tuple hash so a probe join reads
    * evenly; signatures ride along so the estimate stage needs no text
    * fetch. The ivfBuild discipline applied to dedup. */
  def dedupIndexBuild(history: DataFrame, idCol: String, textCol: String,
      path: String, shingleN: Int = 3, numHashes: Int = 64,
      bands: Int = 16): Unit =
    sketchBands(history, idCol, textCol, shingleN, numHashes, bands)
      .repartition(col("_bkt"))
      .write.mode("overwrite").parquet(s"$path/bands")

  /** ADMIT a probed-clean batch into the persisted band index — the verb
    * between build-once and probe-many that keeps a recurring ingest's
    * index CURRENT without rebuilding history: the batch is sketched
    * map-side (the same [[sketchBands]] spelling as build and probe, so
    * admission cannot fork the sketch) and its band rows append into the
    * stored layout with the same bucket-spread partitioning. Because a
    * MinHash sketch is a deterministic function of the text alone,
    * probe-after-admit is EXACTLY probe-against-a-full-rebuild of
    * history ∪ batch (pinned by spec). Idempotent per `tag` via
    * [[graft.sources.IndexScratch.admitOnce]] — a replayed ingest cannot
    * double-admit. Returns true iff this call appended. */
  def dedupIndexAdmit(path: String, tag: String, batch: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 3, numHashes: Int = 64,
      bands: Int = 16): Boolean =
    graft.sources.IndexScratch.admitOnce(path, tag) {
      sketchBands(batch, idCol, textCol, shingleN, numHashes, bands)
        .repartition(col("_bkt"))
        .write.mode("append").parquet(s"$path/bands")
    }

  /** Count the data files under an index directory (recursive — hive
    * partition layouts count their leaf files) through the Hadoop FS
    * abstraction, so the vacuum verbs report on object-store/HDFS roots
    * too. */
  private[graft] def parquetFileCount(
      spark: org.apache.spark.sql.SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0L
    while (it.hasNext)
      if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    n
  }

  /** Swap a freshly written directory into place through the FS
    * abstraction — the vacuum verbs' commit step. Rename-aside order
    * (dest → dest.old, tmp → dest, drop dest.old): a crash between the
    * renames leaves dest.old intact for manual recovery, never an empty
    * index path — the delete-then-rename order would. Not cross-process
    * atomic: vacuum is a single-writer maintenance op, the same
    * contract [[graft.sources.IndexScratch.admitOnce]] documents for
    * admission. */
  private[operators] def swapDir(spark: org.apache.spark.sql.SparkSession,
      tmp: String, dest: String): Unit = {
    val d = new org.apache.hadoop.fs.Path(dest)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(dest + ".old")
    fs.delete(old, true) // a leftover .old from a prior crash
    require(fs.rename(d, old), s"vacuum: cannot set aside $dest")
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), d),
      s"vacuum: swap into $dest failed — previous layout at $old")
    fs.delete(old, true)
  }

  /** VACUUM the persisted band index — the maintenance verb after the
    * lifecycle's other three (ensure → admit → probe → VACUUM): every
    * [[dedupIndexAdmit]] appends its own file set, so a recurring ingest
    * fragments `bands/` into O(admits × partitions) small files and every
    * later probe pays the open-file overhead (the small-files problem D3
    * compacts for TABLES, applied to the index). Rewrites the rows into
    * one fresh bucket-spread layout (the SAME `_bkt` partitioning the
    * build uses — one layout spelling) and swaps it in. Content-
    * preserving by construction: same rows, so probe-after-vacuum ≡
    * probe-before (the C83 driver key shares C76's rebuild oracle —
    * hash equality IS that guarantee). Returns (files_before,
    * files_after).
    *
    * Serves ALL THREE band-index families as-is — MinHash (this file),
    * SimHash ([[simhashIndexBuild]]), and pHash
    * ([[graft.operators.Multimodal.phashIndexBuild]]) — because they
    * share ONE stored layout spelling: `$path/bands`, `_bkt`-spread
    * (pinned per family by AdmissionSpec's vacuum assertions). */
  def dedupIndexVacuum(spark: org.apache.spark.sql.SparkSession,
      path: String): (Long, Long) = {
    val bands = s"$path/bands"
    val before = parquetFileCount(spark, bands)
    val tmp = s"$path/bands.vacuum"
    spark.read.parquet(bands).repartition(col("_bkt"))
      .write.mode("overwrite").parquet(tmp)
    swapDir(spark, tmp, bands)
    (before, parquetFileCount(spark, bands))
  }

  /** Probe a persisted band index with an arriving batch: the batch is
    * sketched map-side and BROADCAST onto the index scan (batches are
    * small next to history), candidacy is the exact shared-band-tuple
    * rule of [[minhashLshPairs]], and the signature-estimated Jaccard
    * filters to `minEstJaccard` before the only shuffle (pair dedup).
    * Output: (batch_id, hist_id, est_jaccard) — the batch docs that
    * near-duplicate history. */
  def dedupIndexProbe(spark: org.apache.spark.sql.SparkSession, path: String,
      batch: DataFrame, idCol: String, textCol: String, shingleN: Int = 3,
      numHashes: Int = 64, bands: Int = 16,
      minEstJaccard: Double = 0.35): DataFrame = {
    val idx = spark.read.parquet(s"$path/bands")
    val probe = sketchBands(batch, idCol, textCol, shingleN, numHashes, bands)
    idx.as("h")
      .join(broadcast(probe).as("p"), col("h._bkt") === col("p._bkt"))
      .select(col("p._id").as("batch_id"), col("h._id").as("hist_id"),
        (sig_overlap(col("h._sig"), col("p._sig")).cast("double") / numHashes)
          .as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
      .dropDuplicates("batch_id", "hist_id")
  }

  /** Widest simhash band layout that still GUARANTEES recall at
    * `maxHamming`: flipping h bits can touch at most h bands, so a
    * colliding band survives whenever bands ≥ h+1, i.e.
    * bandBits ≤ 64/(h+1). Wider bands = exponentially fewer bucket
    * collisions, so always take the widest admissible power of two.
    *
    * This is also the corpus-size knob: bucket hot-spotting grows with
    * corpus size (measured: 8-bit bands stay cheap to ~100k docs; beyond
    * that drop maxHamming to ≤3 so 16-bit bands apply — 2^16× more bucket
    * space per table). */
  def simhashBandBitsFor(maxHamming: Int): Int = {
    require(maxHamming >= 0 && maxHamming < 32, s"maxHamming=$maxHamming")
    Seq(32, 16, 8, 4, 2, 1).find(_ <= 64 / (maxHamming + 1)).get
  }

  /** Banded bucket keys of a simhash fingerprint: band tag in bits 40+
    * keeps tag and bucket disjoint for any admissible bandBits (≤ 32).
    * `private[operators]` so the multimodal perceptual hash bands with the
    * SAME spelling (one definition of fingerprint candidacy repo-wide). */
  private[operators] def simhashBuckets(fp: Column, bandBits: Int): Column = {
    val bands = 64 / bandBits
    array((0 until bands).map { j =>
      lit(j.toLong << 40).bitwiseOR(
        shiftrightunsigned(fp, j * bandBits)
          .bitwiseAND(if (bandBits == 64) -1L else (1L << bandBits) - 1))
    }: _*)
  }

  /** SimHash near-dup pairs within a hamming radius. Banding guarantees
    * recall while `64/bandBits > maxHamming` (see [[simhashBandBitsFor]]).
    * Sketch is map-side; the hamming filter runs BEFORE pair-dedup so hot
    * buckets never reach a shuffle. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      bandBits: Int = 8, maxHamming: Int = 6): DataFrame = {
    require(64 / bandBits > maxHamming,
      s"bandBits=$bandBits cannot guarantee recall at hamming<=$maxHamming" +
        s" — need bands>maxHamming; use simhashBandBitsFor($maxHamming)")
    val fps = df.select(col(idCol).as("_id"),
      simhash64(split(trim(col(textCol)), "\\s+")).as("_fp"))
    val bucketed = fps.select(col("_id"), col("_fp"),
      explode(simhashBuckets(col("_fp"), bandBits)).as("_bkt"))
    bucketed.as("a").join(bucketed.as("b"),
        col("a._bkt") === col("b._bkt") && col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"),
        bit_count(col("a._fp").bitwiseXOR(col("b._fp"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** SimHash near-dup pairs ACROSS two corpora (left ⋈ right) — the
    * fingerprint analogue of [[minhashLshPairsAcross]]: the right side is
    * the SMALL corpus (benchmark/eval suite), whose banded fingerprints
    * broadcast, so the left corpus is sketched map-side and never
    * shuffles. Within `maxHamming` the pigeonhole recall guarantee of
    * [[simhashPairs]] holds identically (a pair differing in ≤ maxHamming
    * bits leaves ≥ 1 of the `64/bandBits > maxHamming` bands untouched).
    * Candidacy and the hamming verify are deterministic functions of the
    * two fingerprints, so any engine replays the result exactly. */
  def simhashPairsAcross(left: DataFrame, right: DataFrame, idCol: String,
      textCol: String, bandBits: Int = 8, maxHamming: Int = 6): DataFrame = {
    require(64 / bandBits > maxHamming,
      s"bandBits=$bandBits cannot guarantee recall at hamming<=$maxHamming" +
        s" — need bands>maxHamming; use simhashBandBitsFor($maxHamming)")
    def bucketed(df: DataFrame) = df
      .select(col(idCol).as("_id"),
        simhash64(split(trim(col(textCol)), "\\s+")).as("_fp"))
      .select(col("_id"), col("_fp"),
        explode(simhashBuckets(col("_fp"), bandBits)).as("_bkt"))
    bucketed(left).as("a")
      .join(broadcast(bucketed(right)).as("b"), col("a._bkt") === col("b._bkt"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"),
        bit_count(col("a._fp").bitwiseXOR(col("b._fp"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** Banded fingerprint rows (_id, _fp, _bkt) — the sketch stage shared by
    * the SimHash index build, probe, AND admit: one spelling repo-wide. */
  private def simhashBandRows(df: DataFrame, idCol: String, textCol: String,
      bandBits: Int): DataFrame =
    df.select(col(idCol).as("_id"),
        simhash64(split(trim(col(textCol)), "\\s+")).as("_fp"))
      .select(col("_id"), col("_fp"),
        explode(simhashBuckets(col("_fp"), bandBits)).as("_bkt"))

  /** Persist the history corpus' SimHash band index — [[dedupIndexBuild]]'s
    * discipline for the FINGERPRINT family: one 64-bit fingerprint per
    * history doc, banded, stored once; batches probe without re-hashing
    * history. Same pigeonhole recall guarantee as [[simhashPairs]]. */
  def simhashIndexBuild(history: DataFrame, idCol: String, textCol: String,
      path: String, bandBits: Int = 8): Unit =
    simhashBandRows(history, idCol, textCol, bandBits)
      .repartition(col("_bkt"))
      .write.mode("overwrite").parquet(s"$path/bands")

  /** [[dedupIndexAdmit]] for the fingerprint family: append a probed-clean
    * batch's banded fingerprints into the stored index. Fingerprints are
    * deterministic functions of the text, so probe-after-admit ≡
    * probe-against-rebuild of history ∪ batch (pinned by spec); idempotent
    * per `tag`. */
  def simhashIndexAdmit(path: String, tag: String, batch: DataFrame,
      idCol: String, textCol: String, bandBits: Int = 8): Boolean =
    graft.sources.IndexScratch.admitOnce(path, tag) {
      simhashBandRows(batch, idCol, textCol, bandBits)
        .repartition(col("_bkt"))
        .write.mode("append").parquet(s"$path/bands")
    }

  /** Probe a persisted SimHash band index with an arriving batch: batch
    * fingerprints compute map-side and BROADCAST onto the index scan; the
    * hamming verify runs before the only shuffle (pair dedup). Output:
    * (batch_id, hist_id, hamming ≤ maxHamming). */
  def simhashIndexProbe(spark: org.apache.spark.sql.SparkSession, path: String,
      batch: DataFrame, idCol: String, textCol: String, bandBits: Int = 8,
      maxHamming: Int = 6): DataFrame = {
    require(64 / bandBits > maxHamming,
      s"bandBits=$bandBits cannot guarantee recall at hamming<=$maxHamming")
    val idx = spark.read.parquet(s"$path/bands")
    val probe = simhashBandRows(batch, idCol, textCol, bandBits)
    idx.as("h").join(broadcast(probe).as("p"), col("h._bkt") === col("p._bkt"))
      .select(col("p._id").as("batch_id"), col("h._id").as("hist_id"),
        bit_count(col("h._fp").bitwiseXOR(col("p._fp"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("batch_id", "hist_id")
  }

  /** Embedding-cosine near-dup pairs: hyperplane-LSH candidates, exact
    * (integer-quantized, engine-portable) cosine verify. */
  def embeddingPairs(df: DataFrame, idCol: String, embCol: String, dim: Int,
      threshold: Double, tables: Int = 8, bits: Int = 12): DataFrame = {
    val bucketed = df.select(col(idCol).as("_id"), col(embCol).as("_emb"),
      explode(lsh_sign_buckets(col(embCol), tables, bits, dim)).as("_bkt"))
    bucketed.as("a").join(bucketed.as("b"),
        col("a._bkt") === col("b._bkt") && col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"),
        quantized_cosine(col("a._emb"), col("b._emb")).as("score"))
      .filter(col("score") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }
}

/** Similarity search over embedding columns. */
object Ann {

  /** Exact top-k cosine neighbors of each query vector.
    * The query set is broadcast and the corpus scanned ONCE; ranking is the
    * TopKByScore bounded-heap aggregate — each partition emits a k-sized
    * partial heap per query (map-side combine), so the shuffle carries
    * O(queries × k) rows and NOTHING is ever fully sorted. This is the
    * shape that survives a billion-row corpus; a window row_number would
    * sort every query's full score list. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("_q"))
    corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("_e"))
      .crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        quantized_cosine(col("_e"), col("_q")).as("score"))
      .groupBy(col("query_id"))
      .agg(graft.functions.topk.top_k_by_score(col("score"), col("neighbor_id"), k).as("_tk"))
      .select(col("query_id"), posexplode(col("_tk")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        col("col.score").as("score"), (col("pos") + 1).cast("int").as("rank"))
  }

  /** IVF-style top-k: coarse quantization into `nLists` inverted lists
    * (deterministic seed centroids), queries probe their `nProbe` nearest
    * lists, exact scoring only inside probed lists.
    *
    * Scale shape: the centroid set is tiny and broadcast twice (corpus
    * assignment + query probing); the corpus is scanned once to build
    * assignments; the probe join shuffles only (query, list) pairs. In a
    * persisted deployment the assignment pass is computed once and reused
    * across query batches (write `list_id` as a partition column).
    */
  /** Lloyd refinement rounds and the refinement-sample size multiplier. */
  val LloydIters = 3
  val LloydSampleFactor = 32

  /** Deterministic k-means-lite centroids: seeds are the `nLists` smallest
    * md5(id) rows — a content-hash spread over the corpus, not the first-N
    * of an id-ordered (often clustered) layout — refined by [[LloydIters]]
    * Lloyd iterations over a bounded hash-ordered sample.
    *
    * Everything stays deterministic with NO RNG: hash order replaces random
    * sampling, and nearest-centroid ties break on centroid id — so a
    * rebuilt index is always bit-identical. Centroids live on the 1e-6
    * INTEGER grid (`_cent`: array<long>; updates are floor-means of the
    * quantized components, exact in int64 and order-independent under any
    * partitioning), and assignment scores them with
    * `quantized_cosine_preq` — exact integer dot/norms, one IEEE division
    * chain — so the whole chain (seeds → rounds → final assignment) is
    * replayable by ANY engine from the base table: that is what makes
    * `ann_ivf_stats` DuckDB-oracle-checkable (r12 next-round #8). The
    * previous spelling kept decimal-mean DOUBLE centroids; re-quantizing
    * those (`floor(cent·1e6)`) after a decimal→double round-trip is
    * off-by-one at grid boundaries in another engine, which is exactly
    * the parity trap the integer grid removes.
    *
    * Scale shape: both the seed and sample selections plan as
    * TakeOrderedAndProject (bounded per-partition heaps, never a full
    * sort) and each Lloyd round touches only the O(nLists × factor)
    * sample; the corpus-wide passes remain in [[ivfTopK]]/[[ivfBuild]].
    * A seed whose sample cluster empties drops out (standard k-means
    * collapse), leaving at most nLists lists. */
  private def centroids(corpus: DataFrame, idCol: String, embCol: String,
      nLists: Int): DataFrame = {
    val hashed = corpus.select(col(idCol).as("_sid"), col(embCol).as("_semb"),
      md5(col(idCol).cast("string")).as("_h"))
    // r16: each round's centroid set materializes as a DRIVER-LOCAL
    // relation (bounded collect — ≤ nLists codebook rows, the same
    // discipline as the PQ codebook literals): scoring against it is a
    // pure map-side expression (see rankAgainstCodebook), so a Lloyd
    // round is ONE job over the checkpointed bounded sample with zero
    // broadcast builds, and every downstream consumer (posting passes,
    // probe routing) inlines the codebook for free instead of paying a
    // broadcast-build job per use of a checkpointed frame.
    var cents = localizeCodebook(hashed.orderBy(col("_h")).limit(nLists)
      .select(col("_sid").as("_cent_id"),
        expr("transform(_semb, x -> CAST(floor(x * 1000000.0) AS BIGINT))")
          .as("_cent")))
    val sample = hashed.orderBy(col("_h")).limit(nLists * LloydSampleFactor)
      .select(col("_sid"), col("_semb")).localCheckpoint(eager = true)
    for (_ <- 1 to LloydIters) {
      val assigned = nearestLists(cents, sample, "_sid", "_semb", keep = 1)
      cents = localizeCodebook(assigned.select(col("_cent_id"), posexplode(
          expr("transform(_semb, x -> CAST(floor(x * 1000000.0) AS BIGINT))")))
        .groupBy(col("_cent_id"), col("pos"))
        // floor-mean on the grid: |Σ| <= sample · 1e6 — double-exact
        .agg(floor(sum(col("col")).cast("double") / count(lit(1)))
          .cast("long").as("_m"))
        .groupBy(col("_cent_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("_m")))).as("_pm"))
        .select(col("_cent_id"),
          expr("transform(_pm, p -> p._m)").as("_cent")))
    }
    cents
  }

  /** Re-pin a (_cent_id, _cent) centroid frame as a driver-local
    * relation. The collect is BOUNDED (≤ nLists rows — a codebook, like
    * the PQ flat-book literals); a LocalRelation's broadcast builds on
    * the driver thread with no Spark job, where the previous
    * checkpointed frame cost one job per materialization plus one
    * broadcast-build job per consumer. */
  private def localizeCodebook(cents: DataFrame): DataFrame = {
    val spark = cents.sparkSession
    spark.createDataFrame(cents.collectAsList(), cents.schema)
  }

  /** Score `df` against a LOCAL centroid codebook entirely MAP-SIDE and
    * keep each row's `keep` nearest lists: the codebook inlines as an
    * array literal, each row ranks its own scores inside one expression
    * (sort by (−sim, cent_id) ≡ the sim-desc/id-asc window rule), and
    * the per-row top slice explodes to (id, emb, _cent_id, _sim, _rv)
    * rows. Replaces the crossJoin(broadcast) + row_number spelling,
    * which shuffled corpus × nLists scored rows through a window
    * exchange — at 100 TB that was the posting pass's whole shuffle;
    * now the pass shuffles NOTHING (r16, guide §2.3/§2.4). Bit-exact:
    * the same quantized-cosine kernel scores the same integer-grid
    * centroids; double negation is sign-flip-exact, so the sort order
    * equals the window's (sim desc, cent_id asc) including ties. */
  private def rankAgainstCodebook(cents: DataFrame, df: DataFrame,
      id: String, emb: String, keep: Int): DataFrame = {
    val entries: Seq[(Long, Seq[Long])] = cents.collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq))
    val scored = transform(typedLit(entries), c => struct(
      (-quantized_cosine_preq(col(emb), c.getField("_2"))).as("_nsim"),
      c.getField("_1").as("_cent_id")))
    df.select(col(id), col(emb),
        posexplode(slice(array_sort(scored), 1, keep)))
      .select(col(id), col(emb), col("col._cent_id").as("_cent_id"),
        (-col("col._nsim")).as("_sim"), (col("pos") + 1).as("_rv"))
  }

  /** For each row, its `keep` nearest centroids (map-side codebook
    * ranking — see [[rankAgainstCodebook]]; `_cent` is the 1e-6 integer
    * grid, scored by the pre-quantized cosine kernel). `cents` may be a
    * stored-index frame (a bounded read re-pins it locally). */
  private def nearestLists(cents: DataFrame, df: DataFrame, id: String,
      emb: String, keep: Int): DataFrame =
    rankAgainstCodebook(cents, df, id, emb, keep).drop("_sim", "_rv")

  private def probeAndRank(assigned: DataFrame, probes: DataFrame,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    assigned.join(broadcast(probes), "_cent_id")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        quantized_cosine(col("_e"), col("_q")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, nLists: Int, nProbe: Int): DataFrame = {
    val cents = centroids(corpus, idCol, embCol, nLists)
    val assigned = nearestLists(cents,
      corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("_e")),
      "neighbor_id", "_e", 1)
    val probes = nearestLists(cents,
      queries.select(col(idCol).as("query_id"), col(embCol).as("_q")),
      "query_id", "_q", nProbe)
    probeAndRank(assigned, probes, k)
  }

  /** Persist the IVF index: centroids (tiny) + list assignments laid out as
    * `list_id=` partition directories. The corpus-assignment pass — the
    * expensive half of [[ivfTopK]] — runs ONCE here and is amortized over
    * every subsequent query batch; probing then reads only the probed
    * lists' directories (partition pruning), i.e. nProbe/nLists of the
    * corpus instead of all of it. */
  def ivfBuild(corpus: DataFrame, idCol: String, embCol: String,
      nLists: Int, path: String): Unit = {
    val cents = centroids(corpus, idCol, embCol, nLists)
    cents.select(col("_cent_id").as("cent_id"), col("_cent").as("cent"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    val assigned = nearestLists(cents,
      corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("_e")),
      "neighbor_id", "_e", 1)
    graft.sources.Sinks.writePartitionedParquet(
      assigned.select(col("_cent_id").as("list_id"), col("neighbor_id"),
        col("_e").as("emb")),
      s"$path/lists", partitionCols = Seq("list_id"),
      sortCols = Seq("neighbor_id"))
  }

  /** Query a persisted IVF index. The probed list ids reach the scan as a
    * partition filter (IN list over `list_id=` directories), so the read is
    * bounded by nProbe × list size at any corpus scale. */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, idCol: String, embCol: String,
      k: Int, nProbe: Int): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("cent_id").as("_cent_id"), col("cent").as("_cent"))
    val probes = nearestLists(cents,
      queries.select(col(idCol).as("query_id"), col(embCol).as("_q")),
      "query_id", "_q", nProbe)
    // static IN-filter on the partition column: probe batches are small
    // (they were just broadcast), so the collect is a few ints, and the
    // scan prunes to the probed directories without relying on runtime DPP
    val probedIds = probes.select(col("_cent_id")).distinct()
      .collect().map(_.getLong(0))
    val assigned = spark.read.parquet(s"$path/lists")
      .filter(col("list_id").isin(probedIds.toIndexedSeq: _*))
      .select(col("list_id").as("_cent_id"), col("neighbor_id"),
        col("emb").as("_e"))
    probeAndRank(assigned, probes, k)
  }

  // --- C117: graph ANN (kNN-graph + fixed-hop beam search) -----------------

  /** How many nearest lists each vector is POSTED to during graph build.
    * 2 is the NN-Descent-style overlap trick: two vectors whose top-2
    * coarse lists intersect become candidate neighbors, so edges CROSS
    * list boundaries (a pure per-list kNN graph would make the beam
    * search degenerate to IVF nProbe=1). */
  val GraphReplicas = 2

  /** A built kNN graph over the corpus: the coarse centroids (probe
    * router), the directed top-`m` edge list, and one entry point per
    * list (the list's MEDOID — the member nearest its own centroid).
    * All three frames are eagerly checkpointed: build once, search many. */
  final case class GraphIndex(cents: DataFrame, edges: DataFrame,
      medoids: DataFrame, m: Int)

  /** Deterministic kNN-graph construction — the bucketed candidate
    * generation every scalable graph-ANN build uses (NN-Descent's init,
    * DiskANN's sharded build): post each vector to its [[GraphReplicas]]
    * nearest coarse lists, generate exact candidate pairs per bucket, keep
    * each vertex's top-`m` out-edges by exact quantized cosine (ties to
    * the smaller neighbor id — [[graft.functions.TopKByScore]]'s rule).
    *
    * Everything is a deterministic function of the base table (integer-grid
    * centroids + integer-exact scoring), so the whole index — edges,
    * medoids and the search below — replays in SQL: `ann_graph_topk` is
    * HASH-checked against DuckDB, not rows-only.
    *
    * Scale shape (100 TB): ONE corpus pass scores the broadcast centroid
    * set and yields BOTH the posting and the medoids; candidate pairs form
    * only inside shared buckets (O(Σ listSize²) — bounded by raising
    * nLists exactly like IVF); the per-vertex edge cut is the bounded-heap
    * aggregate, so nothing is ever fully sorted and the shuffle carries
    * O(corpus × m) rows. Medoids are a per-list bounded heap (k=1). */
  /** POST each row of `df` to its [[GraphReplicas]] nearest centroids:
    * (_nid, _e, _cent_id, _sim, _rv) — the shared ranked frame the
    * medoids, the pair stage, and the persisted index's admission all
    * derive from (one spelling, so batch build and incremental admit
    * cannot fork). */
  private[operators] def graphPost(cents: DataFrame, df: DataFrame,
      idCol: String, embCol: String): DataFrame =
    // r16: map-side codebook ranking — the crossJoin + per-_nid window
    // shuffled corpus × nLists scored rows; the posting pass now
    // shuffles nothing (see rankAgainstCodebook)
    rankAgainstCodebook(cents,
        df.select(col(idCol).as("_nid"), col(embCol).as("_e")),
        "_nid", "_e", GraphReplicas)

  /** Per-list MEDOIDS (entry points) of a ranked posting frame. */
  private[operators] def graphMedoids(ranked: DataFrame): DataFrame =
    ranked.filter(col("_rv") === 1)
      .groupBy(col("_cent_id"))
      .agg(graft.functions.topk.top_k_by_score(col("_sim"), col("_nid"), 1)
        .as("_tk"))
      .select(col("_cent_id"), col("_tk").getItem(0).getField("id")
        .as("_entry"))

  /** Per-vertex top-`m` cut of a SCORED (src, dst, _s) pair frame —
    * bounded heap, ties to the smaller dst. */
  private[operators] def graphEdgeCut(pairs: DataFrame, m: Int): DataFrame =
    pairs.groupBy(col("src"))
      .agg(graft.functions.topk.top_k_by_score(col("_s"), col("dst"), m)
        .as("_tk"))
      .select(col("src"), explode(col("_tk")).as("_x"))
      .select(col("src"), col("_x").getField("id").as("dst"),
        col("_x").getField("score").as("_s"))

  /** Exact scored candidate pairs inside shared posting buckets. A pair
    * co-posted to BOTH shared buckets yields bit-identical rows (same
    * vectors, same IEEE chain), so distinct() is deterministic. */
  private[operators] def graphBucketPairs(a: DataFrame,
      b: DataFrame): DataFrame =
    a.select(col("_cent_id"), col("_nid").as("src"), col("_e").as("_ea"))
      .join(b.select(col("_cent_id"), col("_nid").as("dst"),
        col("_e").as("_eb")), Seq("_cent_id"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        quantized_cosine(col("_ea"), col("_eb")).as("_s"))
      // r16: ONE src-keyed exchange serves the dedup AND every
      // consumer's per-src edge cut (hash(src) clusters (src,dst,_s)
      // for the distinct, and graphEdgeCut's groupBy(src) reuses the
      // partitioning) — the bare distinct() exchanged on all three
      // columns and the cut re-exchanged on src
      .repartition(col("src"))
      .distinct()

  def graphBuild(corpus: DataFrame, idCol: String, embCol: String,
      m: Int, nLists: Int): GraphIndex = {
    val cents = centroids(corpus, idCol, embCol, nLists)
    // r16: the posting frame checkpoints PARTITIONED BY LIST
    // (localCheckpoint preserves partitioning), so the per-bucket pair
    // self-join and the medoid rollup both read it exchange-free — the
    // map-side posting pass (rankAgainstCodebook) made this the frame's
    // only exchange
    val ranked = graphPost(cents, corpus, idCol, embCol)
      .repartition(col("_cent_id"))
      .localCheckpoint(eager = true)
    // cents is already a driver-local relation (free to reuse) and
    // medoids is a tiny one-consumer derivation of the checkpointed
    // ranked frame — their eager checkpoints were two pure-overhead jobs
    val medoids = graphMedoids(ranked)
    val edges = graphEdgeCut(graphBucketPairs(ranked, ranked), m)
      .drop("_s")
      .localCheckpoint(eager = true)
    GraphIndex(cents, edges, medoids, m)
  }

  /** [[graphBuild]] with the score column kept and nothing checkpointed —
    * the persisted index's build spelling ([[GraphAnnIndex.ensure]]
    * writes these frames; the read side re-cuts per-src over segments,
    * which needs stored scores). */
  private[operators] def graphBuildScored(corpus: DataFrame, idCol: String,
      embCol: String, m: Int, nLists: Int)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val cents = centroids(corpus, idCol, embCol, nLists)
    // r16: list-partitioned checkpoint — same reasoning as graphBuild
    val ranked = graphPost(cents, corpus, idCol, embCol)
      .repartition(col("_cent_id"))
      .localCheckpoint(eager = true)
    (cents, ranked, graphMedoids(ranked),
      graphEdgeCut(graphBucketPairs(ranked, ranked), m))
  }

  /** Beam search over a built [[GraphIndex]] with a FIXED hop count — the
    * deterministic (and SQL-replayable) variant of best-first graph
    * search: queries enter at the medoids of their `entries` nearest
    * lists; each hop expands the top-`beam` NEWLY-visited vertices along
    * the edge list, scores the unseen neighbors exactly, and the final
    * answer is the top-`k` of everything visited (the query's own vertex
    * participates in expansion — its edges are the best frontier — and is
    * excluded only from the final ranking).
    *
    * Scale shape: the frontier is O(queries × beam) and broadcasts onto
    * the edge list (equi-join on src); candidate scoring joins
    * O(queries × beam × m) ids against the corpus on the id key; the
    * visited set stays O(queries × hops × beam × m). Per-hop frames are
    * eagerly checkpointed so the plan depth stays constant in `hops`. */
  def graphTopK(idx: GraphIndex, corpus: DataFrame, queries: DataFrame,
      idCol: String, embCol: String, k: Int, beam: Int, hops: Int,
      entries: Int): DataFrame = {
    val qf = queries.select(col(idCol).as("query_id"), col(embCol).as("_q"))
      .localCheckpoint(eager = true)
    // r16: the query batch pins once (it was re-scanned per broadcast per
    // hop) and its count prices the adaptive broadcast hints below — the
    // frontier (≤ nq×beam), candidates (≤ nq×beam×m) and visited set
    // (≤ nq×(1+hops×beam×m)) are all query-batch-bounded by construction
    // (the docstring's scale shape), but live behind stat-less
    // checkpoint/union plans the planner will never broadcast by itself:
    // every hop paid two-sided sort-merge joins on frames of a few
    // hundred rows (r16 plan audit).
    val nq = qf.count()
    val probes = nearestLists(idx.cents, qf, "query_id", "_q", keep = entries)
    val f0 = probes.join(idx.medoids, "_cent_id")
      .select(col("query_id"), col("_entry").as("node")).distinct()
    val corpusV = corpus.select(col(idCol).as("node"), col(embCol).as("_e"))
    def score(cand: DataFrame, candRows: Long) =
      graft.operators.OlapC.maybeBroadcastRows(cand, candRows)
        .join(corpusV, "node")
        .join(broadcast(qf), "query_id")
        .select(col("query_id"), col("node"),
          quantized_cosine(col("_e"), col("_q")).as("score"))
    val beamW = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("node"))
    // visited = the UNION of per-hop checkpointed frames: each hop's new
    // nodes materialize exactly once, and the union plan is N tiny
    // cached scans — no re-checkpoint of the accumulated set per hop
    var fresh = score(f0, nq * entries).localCheckpoint(eager = true)
    var visited = fresh
    for (_ <- 1 to hops) {
      val frontier = fresh.withColumn("_rn", row_number().over(beamW))
        .filter(col("_rn") <= beam).select(col("query_id"), col("node"))
      val fb = graft.operators.OlapC.maybeBroadcastRows(frontier, nq * beam)
      // the visited anti-join stays with the planner: BOTH sides are
      // query-batch-bounded, so a broadcast buys nothing at scale and
      // costs a broadcast-build job per hop
      val cand = fb.join(idx.edges, fb("node") === idx.edges("src"))
        .select(col("query_id"), col("dst").as("node")).distinct()
        .join(visited, Seq("query_id", "node"), "left_anti")
      fresh = score(cand, nq * beam * idx.m).localCheckpoint(eager = true)
      visited = visited.unionAll(fresh)
    }
    visited.filter(col("node") =!= col("query_id"))
      .withColumn("rank", row_number().over(beamW).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("node").as("neighbor_id"),
        col("score"), col("rank"))
  }

  /** Approximate top-k: LSH-bucketed candidate generation, exact scoring of
    * candidates only. Raise `bits` as the corpus grows to keep buckets
    * bounded; recall is tunable via `tables`. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, dim: Int, k: Int, tables: Int = 16, bits: Int = 4): DataFrame = {
    def bucketed(df: DataFrame, id: String, emb: String) =
      df.select(col(idCol).as(id), col(embCol).as(emb),
        explode(lsh_sign_buckets(col(embCol), tables, bits, dim)).as("_bkt"))
    val q = bucketed(queries, "query_id", "_q")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    bucketed(corpus, "neighbor_id", "_e")
      .join(broadcast(q), "_bkt")
      .filter(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        quantized_cosine(col("_e"), col("_q")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  // --- Product quantization (PQ) --------------------------------------------
  /** PQ geometry: `PqM` subspaces × `PqKs` codewords. A 64-dim vector
    * compresses to 8 bytes (one code per subspace) — the 64× memory/IO cut
    * that keeps a billion-vector corpus scannable in memory (Jégou et al.,
    * "Product Quantization for Nearest Neighbor Search", TPAMI 2011). */
  val PqM = 8
  val PqKs = 64
  val PqSampleFactor = 32

  /** Lloyd rounds for the PQ codebooks — pinned (bounds the oracle's
    * unrolled replay like LloydIters does for the coarse quantizer). */
  val PqLloydIters = 3

  /** Deterministic per-subspace codebooks. The training set is the bounded
    * hash-ordered sample ([[PqKs]] × [[PqSampleFactor]] rows — a driver
    * literal by construction, like the top-K vocabularies), fetched with
    * ONE TakeOrdered job; the [[PqM]] per-subspace Lloyd runs execute
    * driver-side over it — the distributed work of PQ is encoding and
    * scanning the corpus, never training on a fixed-size sample. Seeds are
    * the first [[PqKs]] sample subvectors (content-hash spread); ties
    * break on the lower code, empty clusters keep their previous codeword
    * — rebuilds are bit-identical, no RNG anywhere.
    *
    * r13: the whole run lives on the 1e-6 INTEGER grid (the IVF-v4
    * discipline that made C7b oracle-replayable): inputs quantize via
    * `floor(x·1e6)` — the SAME rule PqEncode applies to the corpus at
    * encode time — distances are exact integer L2, and centroid updates
    * truncate `sum / count` toward zero (Long division == DuckDB `//`),
    * so the trained books, and therefore every code the index stores,
    * replay bit-identically in SQL. */
  private[operators] def pqTrain(corpus: DataFrame, idCol: String,
      embCol: String, dim: Int): Map[(Int, Int), Array[Long]] = {
    require(dim % PqM == 0, s"dim=$dim must split into $PqM subspaces")
    val subDim = dim / PqM
    val sample = corpus
      .select(col(idCol).as("_sid"), col(embCol).as("_semb"),
        md5(col(idCol).cast("string")).as("_h"))
      .orderBy(col("_h"), col("_sid")).limit(PqKs * PqSampleFactor)
      .collect()
      .map(_.getSeq[Double](1).map(x => math.floor(x * 1e6).toLong).toArray)
    require(sample.nonEmpty, "pqTrain: empty corpus — nothing to sample")
    def l2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    (0 until PqM).flatMap { m =>
      val sub = sample.map(_.slice(m * subDim, (m + 1) * subDim))
      var cents = sub.take(PqKs).map(_.clone())
      for (_ <- 1 to PqLloydIters) {
        val sums = Array.fill(cents.length)(new Array[Long](subDim))
        val counts = new Array[Int](cents.length)
        sub.foreach { v =>
          var best = 0; var bestD = l2(v, cents(0)); var c = 1
          while (c < cents.length) {
            val d = l2(v, cents(c))
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          counts(best) += 1
          var i = 0
          while (i < subDim) { sums(best)(i) += v(i); i += 1 }
        }
        cents = cents.zipWithIndex.map { case (old, c) =>
          if (counts(c) == 0) old
          else sums(c).map(_ / counts(c)) // trunc toward zero == `//`
        }
      }
      cents.zipWithIndex.map { case (cw, c) => (m, c) -> cw }
    }.toMap
  }

  /** The codebook as a flat literal laid out [sub][code][dim] — the input
    * shape [[graft.functions.PqEncode]] loops over in codegen. The books
    * are already on the 1e-6 integer grid. Absent (sub, code) slots
    * (empty-cluster collapse) repeat the previous codeword, which is
    * harmless: the argmin just sees a duplicate. */
  private def flatBooks(books: Map[(Int, Int), Array[Long]],
      dim: Int): Seq[Long] = {
    val subDim = dim / PqM
    val out = new Array[Long](PqM * PqKs * subDim)
    var lastQ = new Array[Long](subDim)
    for (m <- 0 until PqM; c <- 0 until PqKs) {
      val q = books.getOrElse((m, c), lastQ)
      lastQ = q
      System.arraycopy(q, 0, out, (m * PqKs + c) * subDim, subDim)
    }
    out.toSeq
  }

  /** Worst-case |Σ_m tbl(m, code_m)| over any encode: Σ_m max_c |tbl| —
    * the exact per-query ceiling on an ADC lookup-sum. */
  private def adcSumBound(tbl: Seq[Long]): BigInt =
    if (tbl.isEmpty) BigInt(0) // no-refine path carries an empty tbl2
    else (0 until PqM).map(m => (0 until PqKs).iterator
      .map(c => BigInt(tbl(m * PqKs + c)).abs).max).sum

  /** int64→double rank-parity guard (r13 ADVICE): Spark ranks the DOUBLE
    * image of the exact BIGINT ADC score while the SQL twin ranks the
    * exact integer — identical orders ONLY inside the 53-bit mantissa.
    * True for unit-scale embeddings at the current dim; an embedding
    * magnitude or dim growth must fail LOUDLY here, not surface as a
    * silent oracle hash mismatch. */
  private def requireAdcDoubleExact(bounds: Iterator[BigInt]): Unit = {
    val worst = bounds.foldLeft(BigInt(0))(_ max _)
    require(worst < (BigInt(1) << 53),
      s"PQ ADC score bound $worst reaches 2^53 — the double image no " +
        "longer preserves the exact integer ranking; re-scale embeddings " +
        "or shrink the quantization grid")
  }

  /** PQ asymmetric-distance top-k with exact re-rank: the corpus is
    * scanned as 8-byte codes, each query's 128-entry distance table makes
    * scoring a pure lookup-sum, the approximate top `rerank × k` survive
    * via bounded heaps (O(queries × rerank·k) shuffle), and ONLY those
    * fetch their full vectors for the exact cosine that decides the final
    * ranking — the standard memory-bound ANN shape at billion-vector
    * scale. Deterministic end to end (codebooks, ties, quantized exact
    * scores); recall vs the brute-force oracle is pinned by spec. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, dim: Int, k: Int, rerank: Int = 10): DataFrame = {
    val books = pqTrain(corpus, idCol, embCol, dim)
    val subDim = dim / PqM
    val flat = flatBooks(books, dim)
    val encoded = corpus.select(col(idCol).as("neighbor_id"),
      pq_encode(col(embCol), typedLit(flat), PqM, PqKs).as("_codes"))
    // per-query lookup tables: table[m*Ks + c] = <q_m, codeword_{m,c}>,
    // quantized exactly like quantized_cosine's integer dot
    val qRows = queries.select(col(idCol).as("query_id"),
      col(embCol).as("_q")).collect()
    val qTables = qRows.map { r =>
      val q = r.getSeq[Double](1).map(x => math.floor(x * 1e6).toLong).toArray
      val tbl = new Array[Long](PqM * PqKs)
      for (m <- 0 until PqM; c <- 0 until PqKs) {
        val base = (m * PqKs + c) * subDim
        var s = 0L
        var i = 0
        while (i < subDim) { s += q(m * subDim + i) * flat(base + i); i += 1 }
        tbl(m * PqKs + c) = s
      }
      (r.getLong(0), tbl.toSeq)
    }
    requireAdcDoubleExact(qTables.iterator.map { case (_, tbl) =>
      adcSumBound(tbl) })
    val spark = corpus.sparkSession
    import spark.implicits._
    val qdf = qTables.toSeq.toDF("query_id", "_tbl")
    val approx = encoded.crossJoin(broadcast(qdf))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        pq_adc_score(col("_codes"), col("_tbl"), PqKs).cast("double")
          .as("approx"))
      .groupBy(col("query_id"))
      .agg(graft.functions.topk.top_k_by_score(col("approx"),
        col("neighbor_id"), rerank * k).as("_tk"))
      .select(col("query_id"), explode(col("_tk")).as("_c"))
      .select(col("query_id"), col("_c.id").as("neighbor_id"))
    // exact re-rank of the surviving candidates only
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    approx
      .join(corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("_e")),
        "neighbor_id")
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(embCol).as("_q"))), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        quantized_cosine(col("_e"), col("_q")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  // --- IVF×PQ: coarse quantizer + residual codes ---------------------------
  /** Build the composed billion-vector index (IVF-PQ, Jégou et al. 2011
    * §IV): the coarse quantizer routes each vector to its nearest of
    * `nLists` centroids, PQ codebooks are trained on the RESIDUALS
    * (vector − its centroid — residuals concentrate near zero, so the
    * same codebook budget quantizes them far more finely than raw
    * vectors), and the persisted layout is `list_id=` partition
    * directories carrying (neighbor_id, 8-byte codes, full vector).
    *
    * Scale shape: one corpus assignment pass + one residual-encode map
    * pass, then a partitioned write — identical exchange budget to
    * [[ivfBuild]] plus the free map-side encode. Probing reads
    * nProbe/nLists of the corpus as CODES (the 64× IO cut) and only the
    * heap survivors fetch full vectors. Deterministic like every other
    * index here: hash-ordered seeds/samples, decimal-exact means,
    * ties-to-lower ids — rebuilds are bit-identical. */
  /** Coarse assignment + residual — the first encode stage shared by
    * [[ivfPqBuild]] and [[ivfPqAdmit]] (one spelling; admission cannot
    * fork the routing it must replay). */
  private def ivfPqAssign(cents: DataFrame, corpus: DataFrame,
      idCol: String, embCol: String): DataFrame =
    nearestLists(cents,
      corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("_e")),
      "neighbor_id", "_e", 1)
      .join(broadcast(cents), "_cent_id")
      .select(col("_cent_id"), col("neighbor_id"), col("_e"),
        // reconstruct the integer-grid centroid as double once, per pair
        zip_with(col("_e"), col("_cent"),
          (x, y) => x - y.cast("double") / lit(1e6)).as("_r"))

  /** Stage-1 residual encode against a FROZEN flat codebook, exposing the
    * stage-2 residual (r − cw₁) the refinement codebook quantizes. */
  private def ivfPqEncodeR2(assigned: DataFrame, flat: Seq[Long],
      dim: Int): DataFrame = {
    val subDim = dim / PqM
    assigned
      .select(col("_cent_id"), col("neighbor_id"), col("_e"), col("_r"),
        pq_encode(col("_r"), typedLit(flat), PqM, PqKs).as("codes"))
      .withColumn("_books", typedLit(flat))
      .withColumn("_r2", expr(
        s"transform(_r, (x, i) -> x - CAST(element_at(_books, CAST(" +
          s"((i div $subDim) * $PqKs + " +
          s"element_at(codes, CAST((i div $subDim) + 1 AS INT))) " +
          s"* $subDim + (i % $subDim) + 1 AS INT)) AS DOUBLE) / 1e6)"))
      .drop("_books")
  }

  /** The stored list-row shape (list_id, neighbor_id, codes, codes2, emb)
    * with the stage-2 codes from a FROZEN refinement codebook. */
  private def ivfPqListRows(withR2: DataFrame, flat2: Seq[Long]): DataFrame =
    withR2.select(col("_cent_id").as("list_id"), col("neighbor_id"),
      col("codes"),
      pq_encode(col("_r2"), typedLit(flat2), PqM, PqKs).as("codes2"),
      col("_e").as("emb"))

  def ivfPqBuild(corpus: DataFrame, idCol: String, embCol: String,
      dim: Int, nLists: Int, path: String): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // r16: centroids() now returns a driver-local relation — the eager
    // checkpoint here was a pure-overhead job
    val cents = centroids(corpus, idCol, embCol, nLists)
    cents.select(col("_cent_id").as("cent_id"), col("_cent").as("cent"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    val assigned = ivfPqAssign(cents, corpus, idCol, embCol)
    val books = pqTrain(assigned, "neighbor_id", "_r", dim)
    val flat = flatBooks(books, dim)
    // Persist (idx, value) rows, not a collect_list array: collect_list
    // ordering after an exchange is not guaranteed on a cluster, and a
    // permuted flat codebook would silently corrupt every ADC score.
    flat.zipWithIndex.map { case (v, i) => (i, v) }.toDF("idx", "q")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    // Second-stage REFINEMENT codebook (ADC+R, Jégou et al. 2011 §V.B):
    // trained on the residual AFTER stage-1 quantization (r − cw₁), so the
    // stored pair (codes, codes2) is a 16-byte reconstruction — the
    // re-ranking stage reads it instead of the full vector.
    // no checkpoint: like `assigned`, the encoded stream is recomputed per
    // consumer (train sample, final write) rather than materialized —
    // at corpus scale two map passes beat caching 3×dim doubles per row
    val withR2 = ivfPqEncodeR2(assigned, flat, dim)
    val books2 = pqTrain(withR2, "neighbor_id", "_r2", dim)
    val flat2 = flatBooks(books2, dim)
    flat2.zipWithIndex.map { case (v, i) => (i, v) }.toDF("idx", "q")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks2")
    graft.sources.Sinks.writePartitionedParquet(
      ivfPqListRows(withR2, flat2),
      s"$path/lists", partitionCols = Seq("list_id"),
      sortCols = Seq("neighbor_id"))
    // Format marker LAST (r6 ADVICE): a v1 index (single-row array
    // codebooks, no codes2) under the same path must fail with an explicit
    // "rebuild required", not an opaque AnalysisException mid-probe. Written
    // through the same FS abstraction as the index itself (object-store
    // safe), and only after every component landed — a marker can never
    // describe a partial build.
    Seq(("ivfpq", IvfPqFormatVersion)).toDF("kind", "version")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/format")
  }

  /** Bumped whenever the persisted layout changes incompatibly (v2 =
    * (idx, q)-row codebooks + the codes2 refinement column). */
  val IvfPqFormatVersion = 2

  /** ADMIT a batch of vectors into the persisted IVF×PQ index — the verb a
    * recurring ingest needs between build-once and probe-many: route each
    * batch vector to its nearest FROZEN coarse centroid, residual-encode
    * with the FROZEN stage-1/stage-2 codebooks ([[ivfPqAssign]] →
    * [[ivfPqEncodeR2]] → [[ivfPqListRows]] — the build's own stages, so
    * admission cannot fork the encoding), and append into the `list_id=`
    * partition directories. Codebooks staying frozen is the production
    * IVF discipline (FAISS's add-after-train): retraining is a separate,
    * rarer REBUILD — so probe-after-admit equals probing an index whose
    * lists hold history ∪ batch encoded under the same codebooks, and
    * split-admission ≡ one-admission (both pinned by spec, as is list
    * occupancy accounting for the admitted rows).
    *
    * Idempotent per `tag` via [[graft.sources.IndexScratch.admitOnce]];
    * returns true iff this call appended. The append itself is one
    * map-side encode pass + a partitioned write — no shuffle of history,
    * O(batch) work at any index scale. */
  def ivfPqAdmit(spark: org.apache.spark.sql.SparkSession, path: String,
      tag: String, batch: DataFrame, idCol: String, embCol: String,
      dim: Int): Boolean =
    graft.sources.IndexScratch.admitOnce(path, tag) {
      checkIvfPqFormat(spark, path)
      val flat = loadFlatBooks(spark, path, "codebooks").toSeq
      val flat2 = loadFlatBooks(spark, path, "codebooks2").toSeq
      val cents = spark.read.parquet(s"$path/centroids")
        .select(col("cent_id").as("_cent_id"), col("cent").as("_cent"))
      ivfPqListRows(
          ivfPqEncodeR2(ivfPqAssign(cents, batch, idCol, embCol), flat, dim),
          flat2)
        .repartition(col("list_id"))
        .sortWithinPartitions(col("list_id"), col("neighbor_id"))
        .write.partitionBy("list_id").mode("append").parquet(s"$path/lists")
    }

  /** VACUUM the persisted IVF×PQ index's posting lists — [[ivfPqAdmit]]
    * appends one file set per admitted batch into the `list_id=` dirs,
    * so a recurring ingest fragments every probed list into O(admits)
    * small files. Rewrites `lists/` through the SAME partitioned-write
    * spelling as the build (one file per list, neighbor-sorted) and
    * swaps it in; centroids, codebooks, and the format marker are
    * untouched — vacuum never re-encodes, so probe-after-vacuum is
    * byte-identical ranking (pinned by spec along with occupancy
    * accounting). Returns (files_before, files_after). */
  def ivfPqVacuum(spark: org.apache.spark.sql.SparkSession,
      path: String): (Long, Long) = {
    checkIvfPqFormat(spark, path)
    val lists = s"$path/lists"
    val before = Dedup.parquetFileCount(spark, lists)
    val tmp = s"$path/lists.vacuum"
    graft.sources.Sinks.writePartitionedParquet(
      spark.read.parquet(lists), tmp,
      partitionCols = Seq("list_id"), sortCols = Seq("neighbor_id"))
    Dedup.swapDir(spark, tmp, lists)
    (before, Dedup.parquetFileCount(spark, lists))
  }

  /** Query a persisted IVF×PQ index: each query probes its `nProbe`
    * nearest lists; within a probed list the asymmetric distance uses a
    * per-(query, list) lookup table built from the query's RESIDUAL
    * against that list's centroid (the table depends on the list — this
    * is what distinguishes IVF-PQ from flat PQ); the approximate top
    * `rerank × k` survive bounded heaps and only they fetch full vectors
    * for the exact cosine that decides the ranking.
    *
    * The probed list ids reach the scan as a partition IN-filter, so the
    * read is nProbe × list size at any corpus scale. The query batch is
    * collected driver-side to build the ADC tables — bounded by the query
    * set × nProbe × (PqM·PqKs) longs, the same contract as [[pqTopK]]. */
  def ivfPqTopK(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, idCol: String, embCol: String, dim: Int,
      k: Int, nProbe: Int, rerank: Int = 10): DataFrame = {
    val ctx = pqProbeCtx(spark, path, queries, idCol, embCol, dim, nProbe,
      withRefine = false)
    pqExactRank(pqCoarseSurvivors(ctx, rerank * k), ctx.lists,
      queries, idCol, embCol, k)
  }

  /** Shared driver-side probe context for BOTH IVF-PQ query paths: the
    * per-(query, probed-list) ADC tables (plus the refinement table when
    * the caller re-ranks from stored codes) and the partition-pruned list
    * scan — ONE spelling, so the stage-1 arithmetic of [[ivfPqTopK]] and
    * [[ivfPqRefineStage]] cannot fork.
    *
    * Approximate similarity decomposes over the coarse + fine parts:
    * <q, x> = <q, c> + <q, r> ≈ <q, c> + Σ_m <q_m, codeword_m(r)>.
    * The lookup table is the query against the RESIDUAL codebooks; the
    * per-(query, list) constant <q, c> makes scores comparable ACROSS
    * probed lists (without it a far list's small residuals would outrank
    * a near list's large ones). */
  private case class PqProbeCtx(tdf: DataFrame, lists: DataFrame)

  /** Format gate shared by every persisted-index READER and by admission:
    * a v1 index under the same path must fail with an explicit "rebuild
    * required", never an opaque AnalysisException mid-probe (or, worse, a
    * silent mixed-format append). */
  private def checkIvfPqFormat(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    import spark.implicits._
    val ver =
      try spark.read.parquet(s"$path/format")
        .filter(col("kind") === "ivfpq").select("version")
        .as[Int].collect().headOption
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    if (!ver.contains(IvfPqFormatVersion))
      throw new IllegalStateException(
        s"IVF-PQ index at $path has format ${ver.getOrElse("<absent>")} but " +
          s"this reader needs v$IvfPqFormatVersion ((idx,q)-row codebooks + " +
          "codes2) — rebuild required via Ann.ivfPqBuild")
  }

  /** Read a persisted flat codebook back in its exact written order. */
  private def loadFlatBooks(spark: org.apache.spark.sql.SparkSession,
      path: String, name: String): Array[Long] = {
    import spark.implicits._
    spark.read.parquet(s"$path/$name")
      .orderBy("idx").select("q").as[Long].collect()
  }

  private def pqProbeCtx(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, idCol: String, embCol: String,
      dim: Int, nProbe: Int, withRefine: Boolean): PqProbeCtx = {
    import spark.implicits._
    val subDim = dim / PqM
    checkIvfPqFormat(spark, path)
    val flat = loadFlatBooks(spark, path, "codebooks")
    val flat2 =
      if (withRefine) loadFlatBooks(spark, path, "codebooks2")
      else Array.empty[Long]
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("cent_id").as("_cent_id"), col("cent").as("_cent"))
    val probes = nearestLists(cents,
      queries.select(col(idCol).as("query_id"), col(embCol).as("_q")),
      "query_id", "_q", nProbe)
      .join(broadcast(cents), "_cent_id")
    val probeRows = probes.select(col("query_id"), col("_cent_id"),
      col("_q"), col("_cent")).collect()
    val qTables = probeRows.map { r =>
      val q = r.getSeq[Double](2).map(x => math.floor(x * 1e6).toLong).toArray
      val c = r.getSeq[Long](3).toArray // centroid already on the 1e-6 grid
      var qc = 0L
      var j = 0
      while (j < dim) { qc += q(j) * c(j); j += 1 }
      def adcTable(fl: Array[Long]): Seq[Long] = {
        val tbl = new Array[Long](PqM * PqKs)
        for (m <- 0 until PqM; cw <- 0 until PqKs) {
          val base = (m * PqKs + cw) * subDim
          var s = 0L
          var i = 0
          while (i < subDim) { s += q(m * subDim + i) * fl(base + i); i += 1 }
          tbl(m * PqKs + cw) = s
        }
        tbl.toSeq
      }
      (r.getLong(0), r.getLong(1), qc, adcTable(flat),
        if (withRefine) adcTable(flat2) else Seq.empty[Long])
    }
    requireAdcDoubleExact(qTables.iterator.map {
      case (_, _, qc, tbl, tbl2) =>
        BigInt(qc).abs + adcSumBound(tbl) + adcSumBound(tbl2) })
    val probedIds = qTables.map(_._2).distinct
    val tdf = qTables.toSeq
      .toDF("query_id", "_cent_id", "_qc", "_tbl", "_tbl2")
    val cols = Seq(col("list_id").as("_cent_id"), col("neighbor_id"),
      col("codes")) ++
      (if (withRefine) Seq(col("codes2")) else Nil) :+ col("emb")
    val lists = spark.read.parquet(s"$path/lists")
      .filter(col("list_id").isin(probedIds.toIndexedSeq: _*))
      .select(cols: _*)
    PqProbeCtx(tdf, lists)
  }

  /** Stage 1: coarse ADC over the 8-byte stage-1 codes only — no vector
    * reads, no codes2. Returns the `keep` best candidate ids per query. */
  private def pqCoarseSurvivors(ctx: PqProbeCtx, keep: Int): DataFrame =
    ctx.lists.select(col("_cent_id"), col("neighbor_id"), col("codes"))
      .join(broadcast(ctx.tdf.select(col("query_id"), col("_cent_id"),
        col("_qc"), col("_tbl"))), "_cent_id")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (col("_qc") + pq_adc_score(col("codes"), col("_tbl"), PqKs))
          .cast("double").as("approx"))
      .groupBy(col("query_id"))
      .agg(graft.functions.topk.top_k_by_score(col("approx"),
        col("neighbor_id"), keep).as("_tk"))
      .select(col("query_id"), explode(col("_tk")).as("_c"))
      .select(col("query_id"), col("_c.id").as("neighbor_id"))

  /** Exact tail shared by both query paths: only the survivor rows fetch
    * full vectors for the exact cosine that decides the ranking. */
  private def pqExactRank(survivors: DataFrame, lists: DataFrame,
      queries: DataFrame, idCol: String, embCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    survivors
      .join(lists.select(col("neighbor_id"), col("emb").as("_e")),
        "neighbor_id")
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(embCol).as("_q"))), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        quantized_cosine(col("_e"), col("_q")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  // --- IVF×PQ two-stage refine: re-rank from stored codes, then fetch ------
  /** Stage products of [[ivfPqRefineTopK]]: the refined survivor ids
    * (exactly `refine × k` per query — the ONLY rows that will pay a
    * full-vector read) plus the probed-list scan they came from, so the
    * exact stage reuses the partition pruning. Exposed so the
    * fetch-budget claim is spec-testable. */
  private[graft] case class PqRefineStage(survivors: DataFrame,
    lists: DataFrame)

  /** Stages 1+2: rank candidates WITHOUT touching full vectors.
    *
    * Stage 1 is [[ivfPqTopK]]'s coarse ADC over the 8-byte stage-1 codes,
    * keeping the usual `rerank × k` margin — wide, but free of vector
    * reads. Stage 2 re-scores ONLY those survivors from the stored
    * 16-byte reconstruction by adding the refinement codebook's
    * contribution (ADC+R):
    *
    *   <q, x̂₂> = <q,c> + Σ_m <q_m, cw₁_m> + Σ_m <q_m, cw₂_m>
    *
    * — one more table lookup per survivor, both tables built driver-side
    * per probed (query, list) exactly like stage 1's ([[pqTopK]]'s
    * contract). Doubling the code budget roughly squares the
    * quantization-error attenuation, so stage 2's ranking needs only a
    * `refine × k` exact-fetch margin where the coarse ranking needed
    * `rerank × k` (measured on the gate corpus: equal recall at 30
    * fetches vs 100) — the 3×+ exact-read cut a deployment with codes
    * in memory and vectors on remote storage actually takes. */
  private[graft] def ivfPqRefineStage(
      spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, idCol: String, embCol: String, dim: Int,
      k: Int, nProbe: Int, rerank: Int, refine: Int): PqRefineStage = {
    val ctx = pqProbeCtx(spark, path, queries, idCol, embCol, dim, nProbe,
      withRefine = true)
    val coarse = pqCoarseSurvivors(ctx, rerank * k)
    // stage 2: re-score survivors from the 16-byte reconstruction
    val survivors = coarse
      .join(ctx.lists.select(col("_cent_id"), col("neighbor_id"),
        col("codes"), col("codes2")), "neighbor_id")
      .join(broadcast(ctx.tdf), Seq("query_id", "_cent_id"))
      .select(col("query_id"), col("neighbor_id"),
        (col("_qc") + pq_adc_score(col("codes"), col("_tbl"), PqKs)
          + pq_adc_score(col("codes2"), col("_tbl2"), PqKs))
          .cast("double").as("refined"))
      .groupBy(col("query_id"))
      .agg(graft.functions.topk.top_k_by_score(col("refined"),
        col("neighbor_id"), refine * k).as("_tk"))
      .select(col("query_id"), explode(col("_tk")).as("_c"))
      .select(col("query_id"), col("_c.id").as("neighbor_id"))
    PqRefineStage(survivors, ctx.lists)
  }

  /** Two-stage IVF-PQ query over the SAME persisted index as
    * [[ivfPqTopK]]: candidates are re-ranked from the stored 16-byte
    * reconstruction ([[ivfPqRefineStage]]) and only `refine × k`
    * survivors — 3.3× fewer than ivfPqTopK's default `rerank × k` margin
    * — fetch full vectors for the exact cosine that decides the ranking. */
  def ivfPqRefineTopK(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, idCol: String, embCol: String, dim: Int,
      k: Int, nProbe: Int, rerank: Int = 10, refine: Int = 3): DataFrame = {
    val st = ivfPqRefineStage(spark, path, queries, idCol, embCol, dim,
      k, nProbe, rerank, refine)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    st.survivors
      .join(st.lists.select(col("neighbor_id"), col("emb").as("_e")),
        "neighbor_id")
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(embCol).as("_q"))), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        quantized_cosine(col("_e"), col("_q")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}

/** Connected components over a pair list — the survivorship step behind
  * every near-dup Dedup variant: candidate PAIRS become clusters, the
  * cluster keeper is its minimum id.
  *
  * Algorithm: min-label propagation with pointer doubling — each round a
  * node takes the min among its own label, its neighbors' labels, AND its
  * label's label (the doubling step, as in Kiveris et al., "Connected
  * Components in MapReduce"). Propagation distance doubles per round, so
  * convergence is O(log diameter): shallow near-dup clusters finish in
  * 2-3 rounds and even a path graph needs only log₂(n). Each round is two
  * joins + one partial-agg groupBy; lineage is cut with localCheckpoint so
  * plans stay flat.
  */
object Cluster {

  /** Label every node (either endpoint of `edges`, plus all of `nodes`)
    * with the minimum node id reachable through the pair graph. Columns
    * out: (id, cluster_id). The result is the true fixpoint — if `maxIter`
    * (ample at O(log diameter) rounds) is exhausted before convergence the
    * call THROWS rather than silently returning partial labels. */
  def connectedComponents(nodes: DataFrame, idCol: String, edges: DataFrame,
      srcCol: String, dstCol: String, maxIter: Int = 25): DataFrame = {
    val e = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
      .unionAll(edges.select(col(dstCol).as("_src"), col(srcCol).as("_dst")))
      .distinct().localCheckpoint(eager = true)
    // iterate over EDGE-TOUCHING nodes only: a node with no edges can never
    // change labels, so the per-round frames scale with the similarity
    // GRAPH (|candidate pairs|), not the corpus — at 100 TB the near-dup
    // graph is orders of magnitude smaller than the document set. Isolated
    // nodes rejoin as singleton clusters after the fixpoint.
    var labels = e.select(col("_src").as("_id"))
      .distinct().withColumn("_lab", col("_id"))
      .localCheckpoint(eager = true)
    // r16: the label-frame cardinality is FIXED across rounds (one row
    // per edge-touching node) — one count up front prices the adaptive
    // broadcast of the label side in every round's joins (checkpointed
    // frames carry no stats, so the planner paid two-sided sort-merge
    // joins on the near-dup graph's few-hundred-row frames)
    val nNodes = labels.count()
    def lb(df: DataFrame): DataFrame =
      graft.operators.OlapC.maybeBroadcastRows(df, nNodes)
    // labels only ever DECREASE, so the label sum strictly decreases while
    // anything changes — one scalar aggregate per round detects the
    // fixpoint, no per-round join against the previous labels. decimal(38)
    // so a billion-node id-sum cannot overflow.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      // null sum = empty label frame (edge-less graph): treat as zero so
      // the loop converges immediately and only singletons are emitted
      Option(df.agg(sum(col("_lab").cast("decimal(38,0)"))).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val viaEdges = e.join(lb(labels), e("_src") === labels("_id"))
        .select(col("_dst").as("_id"), col("_lab"))
      // pointer doubling (adopt the label of my label) engages only after
      // the first rounds: shallow near-dup graphs converge by then and
      // never pay the extra join; deep graphs still finish in O(log d)
      val withNeighbors = labels.unionByName(viaEdges)
      val propagated =
        if (iter < 3) withNeighbors
        else withNeighbors.unionByName(labels.as("a")
          .join(lb(labels.as("b")), col("a._lab") === col("b._id"))
          .select(col("a._id").as("_id"), col("b._lab").as("_lab")))
      labels = propagated
        .groupBy(col("_id")).agg(min(col("_lab")).as("_lab"))
        .localCheckpoint(eager = true)
      val s = labelSum(labels)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds " +
        "(O(log diameter) expected — raise maxIter or check the edge list)")
    val singletons = nodes.select(col(idCol).as("_id")).distinct()
      .join(labels, Seq("_id"), "left_anti")
      .withColumn("_lab", col("_id"))
    labels.unionByName(singletons)
      .select(col("_id").as("id"), col("_lab").as("cluster_id"))
  }

  /** Alternating large-star/small-star connected components (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SoCC'14 — public
    * algorithm): each round rewires every node toward its neighborhood
    * minimum, so intermediate edge sets stay bounded by the INPUT degree
    * distribution. This is the variant for adversarial web-scale graphs:
    * [[connectedComponents]]'s min-label propagation re-emits one labeled
    * row per (edge, round), which a single million-degree hub turns into a
    * million-row fan-out every round, while star operations attach the
    * hub's neighbors directly to the component minimum and shrink the
    * graph as they go. Both converge in O(log) rounds; prefer min-label
    * for shallow near-dup graphs (fewer jobs/round), stars for unknown or
    * hub-heavy topologies. Output matches [[connectedComponents]] exactly:
    * (id, cluster_id = component minimum). */
  def connectedComponentsStars(nodes: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 40): DataFrame = {
    val wU = Window.partitionBy(col("u"))
    // the edge set is kept canonically oriented (u = larger endpoint):
    // every undirected edge appears exactly once, which is what bounds
    // each star's output by |E| + |V| — the paper's size invariant. The
    // operators MUST compose sequentially (small∘large); unioning both
    // stars of the same edge set is a different recurrence that
    // accumulates skip-level edges on long chains.
    def largeStar(e0: DataFrame): DataFrame = {
      val s = e0.unionAll(e0.select("v", "u").toDF("u", "v"))
      // one window pass per star — no self-join against a per-u aggregate
      s.withColumn("_m", least(min(col("v")).over(wU), col("u")))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("_m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
    }
    def smallStar(e0: DataFrame): DataFrame = {
      val withM = e0.withColumn("_m", min(col("v")).over(wU))
      withM.select(col("v").as("u"), col("_m").as("v"))
        .unionAll(withM.select(col("u"), col("_m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
    }
    var e = edges
      .select(col(srcCol).as("u"), col(dstCol).as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(eager = true)
    var iter = 0
    var converged = e.isEmpty
    while (iter < maxIter && !converged) {
      val eNew = smallStar(largeStar(e)).localCheckpoint(eager = true)
      // exact stability check: the edge SET is unchanged (cheap — both
      // sides are checkpointed and the diff short-circuits on first row)
      converged = eNew.count() == e.count() &&
        eNew.exceptAll(e).isEmpty
      e = eNew
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsStars did not converge in $maxIter rounds")
    // at the fixpoint every edge is (child, component-minimum)
    val labels = e.unionAll(e.select("v", "u").toDF("u", "v"))
      .groupBy(col("u"))
      .agg(least(min(col("v")), col("u")).as("_lab"))
      .select(col("u").as("_id"), col("_lab"))
    val singletons = nodes.select(col(idCol).as("_id")).distinct()
      .join(labels, Seq("_id"), "left_anti")
      .withColumn("_lab", col("_id"))
    labels.unionByName(singletons)
      .select(col("_id").as("id"), col("_lab").as("cluster_id"))
  }

  /** Survivorship with a quality policy: given cluster labels and a score
    * per id, the keeper of each cluster is its best-scoring member (ties →
    * lowest id) instead of the minimum id. One partial-agg shuffle on the
    * cluster key. Output: (id, cluster_id, keeper_id, is_keeper). */
  def keepersBy(labels: DataFrame, scores: DataFrame, idCol: String,
      scoreCol: String): DataFrame = {
    val joined = labels.join(
      scores.select(col(idCol).as("id"), col(scoreCol).as("_score")), "id")
    val best = joined.groupBy(col("cluster_id"))
      .agg(min_by(col("id"), struct((-col("_score")).as("n"), col("id")))
        .as("_keeper"))
    joined.join(best, "cluster_id")
      .select(col("id"), col("cluster_id"), col("_keeper").as("keeper_id"),
        (col("id") === col("_keeper")).cast("int").as("is_keeper"))
  }
}

/** Skew-mitigation join helper. AQE's skew-join splitting handles most
  * cases at runtime; explicit salting is for the pathological hot keys a
  * planner cannot split (e.g. one key holding >1 executor's worth of rows
  * on BOTH sides, or non-shuffle-join stages feeding a hot aggregation). */
object Skew {

  /** Inner-join `left` (skewed) with `right` (small-ish but above the
    * broadcast threshold) on `key`, spreading each hot left key across
    * `saltBuckets` partitions. The right side is replicated `saltBuckets`×
    * via an explode — bounded, explicit replication instead of an unbounded
    * hot partition. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    val l = left.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)).cast("int"))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1)).cast("array<int>")))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}

/** Text-analysis column functions (all pure `Column` algebra or
  * row-granular expressions — zero shuffles). */
object TextAnalysis {

  def whitespaceTokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish segmentation count: letter runs, digit runs, punctuation runs. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]+"), lit(0)))

  /** Codegen'd kernel (see [[graft.functions.StopwordCount]]) — the HOF
    * spelling (`size(filter(tokens, _.isin(...)))`) is CodegenFallback:
    * interpreted per-token lambdas AND per-reference re-evaluation of the
    * tokenizing subtree (no subexpression elimination outside codegen),
    * which is what made `quality_filter_chain` pay seconds for a map stage. */
  def stopwordCount(tokens: Column, stopwords: Seq[String]): Column =
    graft.functions.textsketch.stopword_count(tokens, stopwords)

  /** Normalized-content md5 fingerprint. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))
}
