package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {

  test("repetition_stats kernel: known answers via the SQL registration") {
    val r = spark.sql(
      "SELECT repetition_stats('a b a b a') AS r").select(col("r.*")).head()
    // 5 words, 2 distinct; 2-grams: [a b, b a, a b, b a] -> 4 total,
    // 2 distinct, top count 2
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      === ((5, 2, 4, 2, 2)))
    val one = spark.sql(
      "SELECT repetition_stats('solo') AS r").select(col("r.*")).head()
    assert((one.getInt(2), one.getInt(3), one.getInt(4)) === ((0, 0, 0)))
  }

  test("text_repetition: fractions derive from the counters; flag obeys thresholds") {
    CorpusOps.textRepetition(spark, sfDir).collect().foreach { r =>
      val nG = r.getAs[Int]("n_grams")
      val dup = r.getAs[Double]("dup_gram_frac")
      val top = r.getAs[Double]("top_gram_frac")
      if (nG > 0) {
        assert(dup === (nG - r.getAs[Int]("distinct_grams")).toDouble / nG)
        assert(top === r.getAs[Int]("top_gram_n").toDouble / nG)
      } else assert(dup === 0.0 && top === 0.0)
      assert(r.getAs[Int]("repetitive") ===
        (if (top > CorpusOps.TopGramFracMax || dup > CorpusOps.DupGramFracMax) 1 else 0))
    }
  }

  test("decontaminate: matches an independent array-intersect computation") {
    val docs = graft.sources.Tables(spark, sfDir).documents
    val benchShingles = docs
      .filter(col("doc_id") % CorpusOps.BenchmarkMod === 0)
      .select(explode(TextOps.shingles(col("text"), 3)).as("s"))
      .distinct().collect().map(_.getString(0)).sorted
    val expected = docs
      .filter(col("doc_id") % CorpusOps.BenchmarkMod =!= 0)
      .select(col("doc_id"),
        size(array_intersect(TextOps.shingles(col("text"), 3),
          lit(benchShingles))).as("n_shared"))
      .filter(col("n_shared") > 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val got = CorpusOps.decontaminate(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_shared")).toMap
    assert(got === expected)
    assert(got.keys.forall(_ % CorpusOps.BenchmarkMod != 0))
  }

  test("bm25: k rows per query, ranks dense, scores non-increasing, terms matched") {
    val rows = CorpusOps.bm25Search(spark, sfDir).collect()
    val byQuery = rows.groupBy(_.getString(0))
    assert(byQuery.keySet === CorpusOps.Bm25Queries.map(_._1).toSet)
    val docs = graft.sources.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    byQuery.foreach { case (q, qr) =>
      val sorted = qr.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq === (1 to CorpusOps.Bm25TopK))
      val scores = sorted.map(_.getDouble(3)).toSeq
      assert(scores === scores.sorted.reverse, s"$q scores not non-increasing")
      val terms = CorpusOps.Bm25Queries.toMap.apply(q)
      sorted.foreach { r =>
        val text = docs(r.getLong(1))
        val matched = terms.count(t => text.split("\\s+").contains(t))
        assert(matched === r.getAs[Long]("n_terms"), s"$q doc ${r.getLong(1)}")
        assert(matched > 0)
      }
    }
  }

  test("pack_sequences: per-shard contiguous layout covering every token once") {
    val rows = CorpusOps.packSequences(spark, sfDir).collect()
    rows.groupBy(_.getAs[String]("shard")).foreach { case (shard, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("start_off"))
      assert(sorted.head.getAs[Long]("start_off") === 0L, s"shard $shard")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("end_off") === b.getAs[Long]("start_off"),
            s"gap/overlap in shard $shard")
        case _ =>
      }
      sorted.foreach { r =>
        assert(r.getAs[Long]("end_off") ===
          r.getAs[Long]("start_off") + r.getAs[Long]("n_tokens"))
        assert(r.getAs[Long]("first_seq") <= r.getAs[Long]("last_seq"))
        assert(r.getAs[Long]("first_seq") ===
          r.getAs[Long]("start_off") / CorpusOps.PackBudget)
      }
    }
    // the layout is a pure function of doc ids: identical after reshuffling
    val again = CorpusOps.packSequences(spark, sfDir).repartition(7)
      .orderBy(col("shard"), col("start_off")).collect().map(_.toString)
    assert(again.toSeq === rows.sortBy(r =>
      (r.getAs[String]("shard"), r.getAs[Long]("start_off"))).map(_.toString).toSeq)
  }

  test("pack_bestfit: FFD replay matches; no doc splits; bins never overflow") {
    val rows = CorpusOps.packBestfit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    // independent JVM replay of the greedy per shard
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      val order = rs.sortBy(r => (-r._3, r._1))
      val loads = scala.collection.mutable.ArrayBuffer[Long]()
      order.foreach { case (id, _, len, bin, off) =>
        val fit = loads.indexWhere(_ + len <= CorpusOps.PackBudget)
        if (fit >= 0) {
          assert(bin === fit + 1, s"doc $id not first-fit in shard $shard")
          assert(off === loads(fit))
          loads(fit) += len
        } else {
          assert(bin === loads.length + 1 && off === 0L, s"doc $id new-bin")
          loads += len
        }
      }
      // no bin of fitting docs overflows the budget
      rs.groupBy(_._4).foreach { case (bin, docs) =>
        if (docs.forall(_._3 <= CorpusOps.PackBudget))
          assert(docs.map(_._3).sum <= CorpusOps.PackBudget,
            s"shard $shard bin $bin overflows")
      }
    }
    // THE win over C26 at the same budget: concatenate-then-chunk splits
    // documents across sequence boundaries; FFD splits none (whole-doc
    // placement — only a doc longer than the budget would stand alone)
    val c26splits = CorpusOps.packSequences(spark, sfDir).collect()
      .count(r => r.getAs[Long]("first_seq") != r.getAs[Long]("last_seq"))
    assert(c26splits > 0, "fixture corpus should make C26 split documents")
    val oversized = rows.count(_._3 > CorpusOps.PackBudget)
    assert(oversized === 0)
  }

  test("pack_sequences_bpe: lengths are C60's encoded counts; layout invariants hold") {
    val rows = CorpusOps.packSequencesBpe(spark, sfDir).collect()
    // the billed length IS the encoder's, per doc — and strictly less
    // mass than the whitespace layout wherever merges fired
    val enc = CorpusOps.bpeEncodeOn(
      graft.sources.Tables(spark, sfDir).documents, "doc_id", "text",
      CorpusOps.BpeRounds).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    rows.foreach(r =>
      assert(r.getAs[Long]("n_tokens") === enc(r.getAs[Long]("doc_id"))))
    val wsMass = CorpusOps.packSequences(spark, sfDir).collect()
      .map(_.getAs[Long]("n_tokens")).sum
    assert(rows.map(_.getAs[Long]("n_tokens")).sum < wsMass)
    // same contiguity/coverage invariants as C26
    rows.groupBy(_.getAs[String]("shard")).foreach { case (shard, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("start_off"))
      assert(sorted.head.getAs[Long]("start_off") === 0L, s"shard $shard")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("end_off") === b.getAs[Long]("start_off"),
            s"gap/overlap in shard $shard")
        case _ =>
      }
    }
  }

  test("vocab_fertility: per-lang rollup is consistent with the C60 encoder") {
    val rows = CorpusOps.vocabFertility(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    // fertility < 1 wherever merges fired; internal consistency per row
    rows.foreach { case (_, n, ws, enc, f) =>
      assert(n > 0 && enc <= ws)
      assert(f === enc.toDouble / ws.toDouble)
    }
    // cross-operator: totals equal the encoder's summed lengths and the
    // corpus' whitespace mass
    val docs = graft.sources.Tables(spark, sfDir).documents
    val encTotal = CorpusOps.bpeEncodeOn(docs, "doc_id", "text",
      CorpusOps.BpeRounds).agg(sum(col("n_tokens"))).head().getLong(0)
    assert(rows.map(_._4).sum === encTotal)
    val wsTotal = docs
      .agg(sum(org.apache.spark.sql.functions.size(
        graft.operators.TextOps.tokens(col("text"))).cast("long")))
      .head().getLong(0)
    assert(rows.map(_._3).sum === wsTotal)
    assert(rows.map(_._2).sum === docs.count())
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("domain_caps keeps exactly the cap smallest-hash docs per source") {
    val docs = graft.sources.Tables(spark, sfDir).documents
      .select(col("source"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      ds.map(_._2).sortBy(id => (md5hex(s"$id:cap").take(12), id))
        .take(CorpusOps.DomainCap)
        .zipWithIndex.map { case (id, i) => (src, id, i + 1) }
    }.toSet
    val got = CorpusOps.domainCaps(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === expected)
    assert(got.groupBy(_._1).values.forall(_.size <= CorpusOps.DomainCap))
  }

  test("corpus_mixture: thresholds follow the token-budget formula, membership exact") {
    val docs = graft.sources.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.split("\\s+").length.toLong))
    val bySrc = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val tot = bySrc.values.sum
    val n = bySrc.size
    def thr(src: String): Long = math.min(65536L,
      (CorpusOps.MixBudgetNum * 65536L * tot) /
        (CorpusOps.MixBudgetDen * n * bySrc(src)))
    val expected = docs.flatMap { case (id, src, _) =>
      val h16 = Integer.parseInt(md5hex(s"$id:mix").take(4), 16)
      if (h16 < thr(src)) Some((id, src, thr(src).toInt)) else None
    }.toSet
    val got = CorpusOps.corpusMixture(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got === expected)
    // the budget is half the corpus: real downsampling must be happening
    assert(bySrc.keys.exists(s => thr(s) < 65536L))
  }

  test("decontaminate_fuzzy finds every seeded near-dup leak at full recall") {
    val bench = graft.sources.Tables(spark, sfDir).documents
      .filter(col("doc_id") % CorpusOps.BenchmarkMod === 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val got = CorpusOps.decontaminateFuzzy(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every contaminated copy pairs with exactly its source benchmark doc
    val seeded = got.filter(_._1 >= CorpusOps.ContaminatedShift)
    assert(seeded.map(_._1).toSet ===
      bench.map(_ + CorpusOps.ContaminatedShift))
    seeded.foreach { case (t, b, j) =>
      assert(t === b + CorpusOps.ContaminatedShift)
      assert(j >= CorpusOps.FuzzyThreshold && j < 1.0)
    }
    // output sides are well-typed: bench ids on the right, train on the left
    got.foreach { case (t, b, _) =>
      assert(bench.contains(b))
      assert(!bench.contains(t) || t >= CorpusOps.ContaminatedShift)
    }
  }

  test("decontaminate_containment catches whole-quote leaks the Jaccard gate misses") {
    val docs = graft.sources.Tables(spark, sfDir).documents
    val bench = docs.filter(col("doc_id") % CorpusOps.BenchmarkMod === 0)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = CorpusOps.decontaminateContainment(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // every seeded quote-inclusion leak is caught at containment exactly 1.0
    val seeded = got.filter(_._1 >= CorpusOps.ContaminatedShift)
    assert(seeded.map(_._1).toSet ===
      bench.keySet.map(_ + CorpusOps.ContaminatedShift))
    seeded.foreach { case (t, b, shared, bn, c) =>
      assert(t === b + CorpusOps.ContaminatedShift)
      assert(shared === bn && c === 1.0)
    }
    // ...and the SYMMETRIC Jaccard of those same pairs sits below C32's
    // gate — the filler dilutes it — so this leak class needs containment
    def shingleSet(text: String): Set[String] = {
      val t = text.trim.split("\\s+")
      t.sliding(3).map(_.mkString(" ")).toSet
    }
    val filler = (0 until CorpusOps.ContainmentPadTokens)
      .map(i => s"pad$i").mkString(" ")
    bench.foreach { case (_, text) =>
      val b = shingleSet(text)
      val l = shingleSet(s"$filler $text")
      val j = (b & l).size.toDouble / (b | l).size
      assert(j < CorpusOps.FuzzyThreshold,
        s"leak not diluted below the fuzzy gate (j=$j)")
    }
    // sides are typed: bench ids right, train/leak ids left
    got.foreach { case (t, b, _, _, _) =>
      assert(bench.contains(b))
      assert(!bench.contains(t))
    }
  }

  test("decontaminate_simhash: pigeonhole recall within the radius; sides typed") {
    import graft.functions.textsketch.simhash64
    val docs = graft.sources.Tables(spark, sfDir).documents
    val bench = docs.filter(col("doc_id") % CorpusOps.BenchmarkMod === 0)
    // true hamming of every seeded (leak, source) pair, computed directly
    val trueHam = bench.select(col("doc_id"),
        bit_count(simhash64(split(trim(col("text")), "\\s+")).bitwiseXOR(
          simhash64(split(trim(concat(col("text"), lit(" leaked"))), "\\s+"))))
          .as("h"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = CorpusOps.decontaminateSimhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val gotPairs = got.map(p => (p._1, p._2)).toSet
    // GUARANTEE: every seeded pair within MaxHamming is found (pigeonhole)
    trueHam.foreach { case (b, h) =>
      if (h <= Sketch.MaxHamming)
        assert(gotPairs.contains((b + CorpusOps.ContaminatedShift, b)),
          s"missed in-radius leak $b (hamming $h)")
    }
    // the 1-token suffix keeps most leaks in radius: the operator catches
    // a substantial share of the seeded contamination
    val caught = trueHam.count { case (b, _) =>
      gotPairs.contains((b + CorpusOps.ContaminatedShift, b)) }
    assert(caught >= trueHam.size * 6 / 10,
      s"caught $caught of ${trueHam.size} seeded leaks")
    // sides well-typed; reported hamming is the true fingerprint distance
    val benchIds = trueHam.keySet
    got.foreach { case (t, b, h) =>
      assert(benchIds.contains(b))
      assert(!benchIds.contains(t))
      assert(h <= Sketch.MaxHamming)
      if (t == b + CorpusOps.ContaminatedShift) assert(h === trueHam(b))
    }
  }

  test("unigram_logprob: cross-entropy replays from independent token counts") {
    val docs = graft.sources.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
    val counts = docs.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val n = counts.values.sum
    // the bounded top-K cut + OOV bin, replayed independently — and the
    // corpus must actually EXERCISE the OOV path (vocab bigger than K)
    assert(counts.size > CorpusOps.UnigramVocabK,
      s"corpus vocab ${counts.size} must exceed K=${CorpusOps.UnigramVocabK}")
    val kept = counts.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(CorpusOps.UnigramVocabK).toMap
    val oov = math.max(n - kept.values.sum, 1L)
    val expected = docs.map { case (id, toks) =>
      val sq = toks.map(t =>
        math.floor((math.log(n.toDouble) -
          math.log(kept.getOrElse(t, oov).toDouble)) * 1e12).toLong).sum
      val ce = sq.toDouble / 1e12 / toks.size
      id -> ((toks.size, ce, math.min(CorpusOps.LmBucketMax, math.floor(ce).toInt)))
    }.toMap
    val got = CorpusOps.unigramLogprob(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getInt(3))))
      .toMap
    assert(got === expected)
    // the signal separates documents: more than one bucket in the corpus
    assert(got.values.map(_._3).toSet.size >= 1)
    got.values.foreach { case (_, ce, _) => assert(ce > 0.0) }
  }

  test("core APIs survive degenerate inputs (empty history / empty corpus)") {
    import spark.implicits._
    val docs = graft.sources.Tables(spark, sfDir).documents
    // empty history: every batch doc is new
    val emptyHist = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val batch = docs.select(col("doc_id"), col("text")).limit(10)
    assert(CorpusOps.dedupIncrementalOn(emptyHist, batch, "doc_id", "text")
      .count() === 10L)
    // empty k-means corpus fails fast with a clear message
    val emptyEmb = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "emb")
    val e = intercept[IllegalArgumentException] {
      VectorOps.kmeansOn(emptyEmb, "vec_id", "emb", k = 4, rounds = 1)
    }
    assert(e.getMessage.contains("empty corpus"))
    // session-2 guards fail fast instead of dividing by zero downstream
    intercept[IllegalArgumentException] {
      CorpusOps.exportAssignOn(docs, "doc_id", "text", 0) }
    intercept[IllegalArgumentException] {
      CorpusOps.weightedSampleOn(docs, "doc_id", "text", 0) }
    intercept[IllegalArgumentException] {
      CorpusOps.tokenPmiOn(docs, "doc_id", "text", 1, 1L) }
    intercept[IllegalArgumentException] {
      OlapC.pagerankOn(
        Seq.empty[(Long, Long, Long)].toDF("src", "dst", "w"),
        Seq.empty[Long].toDF("node"), 3) }
    intercept[IllegalArgumentException] {
      graft.sources.Sinks.zorderKey(col("doc_id"), col("doc_id"), 40) }
    // zero-weight docs are excluded from the weighted sample, not crashed on
    val withEmpty = docs.select(col("doc_id"), col("text"))
      .unionAll(Seq((999999999L, "")).toDF("doc_id", "text"))
    val s = CorpusOps.weightedSampleOn(withEmpty, "doc_id", "text", 10000)
      .collect()
    // "" tokenizes to one empty token (size 1), so craft a truly empty case:
    // weight > 0 rows all survive; the sample never exceeds the corpus
    assert(s.length <= withEmpty.count())
    // all-equal histogram column lands in one bucket, not NaN
    val const = Seq(("a", 1.0), ("a", 1.0), ("b", 1.0))
      .toDF("event_type", "value")
    val hb = OlapC.valueHistogramOn(const, "event_type", "value", 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(hb === Set(("a", 0, 2L), ("b", 0, 1L)))
  }

  test("phrase_merge: greedy fold replays; merged tokens never chain") {
    val docs = graft.sources.Tables(spark, sfDir).documents
    val phrases = CorpusOps.minePhrases(docs, "doc_id", "text").toSet
    assert(phrases.nonEmpty && phrases.size <= CorpusOps.PhraseK)
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
    def replay(toks: Seq[String]): (Seq[String], Int) =
      toks.tail.foldLeft((Vector(toks.head), 0)) { case ((acc, m), t) =>
        if (phrases.contains(acc.last + "_" + t))
          (acc.init :+ (acc.last + "_" + t), m + 1)
        else (acc :+ t, m)
      }
    val got = CorpusOps.phraseMerge(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    texts.foreach { case (id, toks) =>
      val (merged, m) = replay(toks)
      val (nb, na, nm, fp) = got(id)
      assert(nb === toks.size && na === merged.size && nm === m)
      assert(fp === md5hex(merged.mkString(" ")), s"doc $id")
      // no merged token ever chain-merges (phrases join plain tokens)
      merged.filter(_.contains("_")).foreach(t =>
        assert(t.count(_ == '_') === 1))
    }
    // the pass actually fires somewhere in the corpus
    assert(got.values.map(_._3).sum > 0)
  }

  test("phrase_merge_rounds: round 2 chains round-1 phrases; JVM replay agrees") {
    val docs = graft.sources.Tables(spark, sfDir).documents
    val v1 = CorpusOps.minePhrases(docs, "doc_id", "text").toSet
    def replay(toks: Seq[String], phrases: Set[String]): Seq[String] =
      toks.tail.foldLeft(Vector(toks.head)) { case (acc, t) =>
        if (phrases.contains(acc.last + "_" + t)) acc.init :+ (acc.last + "_" + t)
        else acc :+ t
      }
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
    val merged1 = texts.map { case (id, toks) => id -> replay(toks, v1) }
    // round-2 vocab mined over the merged corpus, replayed independently
    val v2 = merged1.flatMap { case (_, toks) =>
      toks.sliding(2).filter(_.size == 2).map(_.mkString("_")).toSeq.distinct
    }.groupBy(identity).view.mapValues(_.length)
      .filter(_._2 >= CorpusOps.PhraseMinDf).toSeq
      .sortBy { case (bg, df) => (-df, bg) }.take(CorpusOps.PhraseK)
      .map(_._1).toSet
    val got = CorpusOps.phraseMergeRounds(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    texts.foreach { case (id, toks) =>
      val m1 = merged1.toMap.apply(id)
      val m2 = replay(m1, v2)
      val (n0, n1, n2, fp) = got(id)
      assert(n0 === toks.size && n1 === m1.size && n2 === m2.size)
      assert(fp === md5hex(m2.mkString(" ")), s"doc $id")
    }
    // round 2's vocabulary is genuinely NEW: a pair merged in round 1 no
    // longer exists as an adjacency, so it cannot be re-mined
    assert(v2.nonEmpty && (v2 & v1).isEmpty)
    // and round 2 actually fires somewhere
    assert(got.values.exists { case (_, n1, n2, _) => n2 < n1 })
  }

  test("phrase_merge_rounds: chained a_b_c phrases form when frequency warrants") {
    import spark.implicits._
    // "a b c" recurs corpus-wide; round 1 merges a_b (and b_c where a is
    // absent), round 2 mines the now-adjacent (a_b, c) pair and chains it
    val docs = (1L to 6L).map(i => (i, s"a b c u$i v$i")).toDF("doc_id", "text")
    val got = CorpusOps.phraseMergeRoundsOn(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4)))
    got.foreach { case (id, n0, n1, n2, fp) =>
      assert(n0 === 5 && n1 === 4 && n2 === 3) // a_b merged, then a_b_c chained
      assert(fp === md5hex(s"a_b_c u$id v$id"))
    }
  }

  test("bigram_logprob: JVM replay agrees; context lowers average entropy") {
    val texts = graft.sources.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
    val uni = texts.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = uni.values.sum
    // both unigram joins go through the SAME bounded top-K + OOV bin as C31
    val kept = uni.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(CorpusOps.UnigramVocabK).toMap
    val oov = math.max(n - kept.values.sum, 1L)
    val allPairs = texts.flatMap { case (_, t) => t.zip(t.tail) }
    val bi = allPairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    // BigramK exceeds the distinct bigrams at this sf — the cut keeps all
    assert(bi.size <= CorpusOps.BigramK)
    // (1 - 0.9) evaluates in DECIMAL in both engines → exactly 0.1
    val (lam, omLam) = (0.9, 0.1)
    val expected = texts.filter(_._2.size >= 2).map { case (id, t) =>
      val prs = t.zip(t.tail)
      val sq = prs.map { case (a, b) =>
        val p = lam * bi((a, b)).toDouble / kept.getOrElse(a, oov).toDouble +
          omLam * kept.getOrElse(b, oov).toDouble / n.toDouble
        math.floor(-math.log(p) * 1e6).toLong
      }.sum
      val ce = sq.toDouble / 1e6 / prs.size.toDouble
      (id, prs.size.toLong, ce, math.min(9, math.floor(ce).toLong).toInt)
    }.sortBy(_._1)
    val got = CorpusOps.bigramLogprob(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.toSeq === expected.toSeq)
    // the OOV backoff path is actually exercised by the corpus
    assert(texts.exists(_._2.exists(t => !kept.contains(t))),
      "corpus must contain OOV tokens for the backoff to be tested")
    // more context fits the corpus better — on FULLY in-vocab documents,
    // where both models see true counts (the OOV bin deliberately inflates
    // unigram p and deflates the bigram ratio for rare tokens, so the
    // corpus-wide averages are not comparable across models)
    val invocab = texts.filter { case (_, t) =>
      t.size >= 2 && t.forall(kept.contains) }.map(_._1).toSet
    assert(invocab.nonEmpty, "fixture must contain fully in-vocab docs")
    def avg(xs: Seq[Double]) = xs.sum / xs.length
    val ceUni = CorpusOps.unigramLogprob(spark, sfDir).collect()
      .filter(r => invocab.contains(r.getLong(0))).map(_.getDouble(2)).toSeq
    val ceBi = got.filter(r => invocab.contains(r._1)).map(_._3).toSeq
    assert(avg(ceBi) < avg(ceUni),
      s"bigram ${avg(ceBi)} should beat unigram ${avg(ceUni)} on in-vocab docs")
  }

  test("trigram_logprob: JVM replay agrees; unseen-context term backs off") {
    val texts = graft.sources.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
    val uni = texts.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val n = uni.values.sum
    val kept = uni.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(CorpusOps.UnigramVocabK).toMap
    val oov = math.max(n - kept.values.sum, 1L)
    val biAll = texts.flatMap { case (_, t) => t.zip(t.tail) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val triAll = texts.flatMap { case (_, t) =>
      t.lazyZip(t.tail).lazyZip(t.drop(2)).toSeq }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    // the fixture stays under both cuts — the bounded tables keep all
    assert(biAll.size <= CorpusOps.BigramK && triAll.size <= CorpusOps.TrigramK)
    val (l3, l2, l1) = (0.6, 0.3, 0.1)
    val expected = texts.filter(_._2.size >= 3).map { case (id, t) =>
      val trs = t.lazyZip(t.tail).lazyZip(t.drop(2)).toSeq
      val sq = trs.map { case (a, b, c) =>
        val t3 = biAll.get((a, b)) match {
          case Some(cab) => l3 * triAll.getOrElse((a, b, c), 0L).toDouble / cab
          case None => 0.0
        }
        val p = t3 + l2 * biAll.getOrElse((b, c), 0L).toDouble /
          kept.getOrElse(b, oov).toDouble +
          l1 * kept.getOrElse(c, oov).toDouble / n.toDouble
        math.floor(-math.log(p) * 1e6).toLong
      }.sum
      val ce = sq.toDouble / 1e6 / trs.size.toDouble
      (id, trs.size.toLong, ce, math.min(9, math.floor(ce).toLong).toInt)
    }.sortBy(_._1)
    val got = CorpusOps.trigramLogprob(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.toSeq === expected.toSeq)
    // context helps: on fully in-vocab docs the trigram CE beats bigram CE
    val invocab = texts.filter { case (_, t) =>
      t.size >= 3 && t.forall(kept.contains) }.map(_._1).toSet
    assert(invocab.nonEmpty)
    val ceBi = CorpusOps.bigramLogprob(spark, sfDir).collect()
      .filter(r => invocab.contains(r.getLong(0))).map(_.getDouble(2)).toSeq
    val ceTri = got.filter(r => invocab.contains(r._1)).map(_._3).toSeq
    assert(ceTri.sum / ceTri.length < ceBi.sum / ceBi.length,
      s"trigram ${ceTri.sum / ceTri.length} vs bigram ${ceBi.sum / ceBi.length}")
  }

  test("fourgram_logprob: JVM replay agrees; all four tables stay bounded") {
    val texts = graft.sources.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
    val uni = texts.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val n = uni.values.sum
    val kept = uni.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(CorpusOps.UnigramVocabK).toMap
    val oov = math.max(n - kept.values.sum, 1L)
    val biAll = texts.flatMap { case (_, t) => t.zip(t.tail) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val triAll = texts.flatMap { case (_, t) =>
      t.lazyZip(t.tail).lazyZip(t.drop(2)).toSeq }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val quadAll = texts.flatMap { case (_, t) =>
      if (t.size >= 4) t.sliding(4).map(w => (w(0), w(1), w(2), w(3))).toSeq
      else Nil }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    // the fixture stays under every cut — the bounded tables keep all
    assert(biAll.size <= CorpusOps.BigramK && triAll.size <= CorpusOps.TrigramK
      && quadAll.size <= CorpusOps.FourgramK)
    val (l4, l3, l2, l1) = (0.5, 0.25, 0.15, 0.1)
    val expected = texts.filter(_._2.size >= 4).map { case (id, t) =>
      val qs = t.sliding(4).map(w => (w(0), w(1), w(2), w(3))).toSeq
      val sq = qs.map { case (a, b, c, d) =>
        val t4 = triAll.get((a, b, c)) match {
          case Some(cabc) =>
            l4 * quadAll.getOrElse((a, b, c, d), 0L).toDouble / cabc
          case None => 0.0
        }
        val t3 = biAll.get((b, c)) match {
          case Some(cbc) =>
            l3 * triAll.getOrElse((b, c, d), 0L).toDouble / cbc
          case None => 0.0
        }
        val p = t4 + t3 +
          l2 * biAll.getOrElse((c, d), 0L).toDouble /
            kept.getOrElse(c, oov).toDouble +
          l1 * kept.getOrElse(d, oov).toDouble / n.toDouble
        math.floor(-math.log(p) * 1e6).toLong
      }.sum
      val ce = sq.toDouble / 1e6 / qs.size.toDouble
      (id, qs.size.toLong, ce, math.min(9, math.floor(ce).toLong).toInt)
    }.sortBy(_._1)
    val got = CorpusOps.fourgramLogprob(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.nonEmpty && got.toSeq === expected.toSeq)
  }

  test("bpe_vocab: round 1 equals single-round mining; later rounds chain") {
    val docs = graft.sources.Tables(spark, sfDir).documents
    val got = CorpusOps.bpeVocab(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // exactly BpeRounds rounds, each bounded by PhraseK
    val byRound = got.groupBy(_._1)
    assert(byRound.keySet === (1 to CorpusOps.BpeRounds).toSet)
    byRound.values.foreach(v => assert(v.length <= CorpusOps.PhraseK))
    // round 1 is the single-round miner's vocabulary, with its frequencies
    val r1 = got.filter(_._1 == 1).map(_._2).toSeq
    assert(r1 === CorpusOps.minePhrases(docs, "doc_id", "text"))
    // the vocabulary GROWS: every round mines phrases the previous rounds
    // did not have (the merged corpus exposes new adjacencies; at larger
    // corpora these include chained a_b_c phrases — at this fixture scale
    // they are new pairs, which the round-over-round disjointness pins)
    val sets = (1 to CorpusOps.BpeRounds).map(r =>
      got.filter(_._1 == r).map(_._2).toSet)
    sets.sliding(2).foreach { case Seq(prev, next) =>
      assert((next -- prev).nonEmpty, s"round added nothing new: $next")
    }
    // deterministic rebuild
    val again = CorpusOps.bpeVocab(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === again.toSeq)
  }

  test("kn_logprob: JVM replay agrees; continuation beats raw frequency") {
    val texts = graft.sources.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
    val uni = texts.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val kept = uni.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(CorpusOps.UnigramVocabK).map(_._1).toSet
    def proj(t: String) = if (kept(t)) t else "<unk>"
    val pairs = texts.flatMap { case (_, t) =>
      t.zip(t.tail).map { case (a, b) => (proj(a), proj(b)) } }
    val bg = pairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ctx = bg.toSeq.groupBy(_._1._1).view
      .mapValues(v => (v.map(_._2).sum, v.size.toLong)).toMap
    val cont = bg.toSeq.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val dt = bg.size.toLong
    val disc = 0.75
    val expected = texts.filter(_._2.size >= 2).map { case (id, t) =>
      val prs = t.zip(t.tail).map { case (a, b) => (proj(a), proj(b)) }
      val sq = prs.map { case (a, b) =>
        val (ca, n1f) = ctx(a)
        val p = (math.max(bg((a, b)).toDouble - disc, 0.0) +
          disc * n1f.toDouble * (cont(b).toDouble / dt.toDouble)) / ca.toDouble
        math.floor(-math.log(p) * 1e6).toLong
      }.sum
      val ce = sq.toDouble / 1e6 / prs.size.toDouble
      (id, prs.size.toLong, ce, math.min(9, math.floor(ce).toLong).toInt)
    }.sortBy(_._1)
    val got = CorpusOps.knLogprob(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.toSeq === expected.toSeq)
    // the KN signal is a proper distribution ingredient: continuation
    // probabilities sum to 1 over the bigram-type domain
    assert(math.abs(cont.values.map(_.toDouble / dt).sum - 1.0) < 1e-9)
    // and the projection actually binned something
    assert(pairs.exists(p => p._1 == "<unk>" || p._2 == "<unk>"))
  }

  test("bpe_vocab warm-start from a stored merge table equals cold-start") {
    val docs = graft.sources.Tables(spark, sfDir).documents
    val cold3 = CorpusOps.bpeVocabOn(docs, "doc_id", "text", 3)
      .collect().map(_.toString)
    val table2 = CorpusOps.bpeVocabOn(docs, "doc_id", "text", 2)
    // artifact round-trip: the exported merge table survives a partitioned
    // Sinks write/read before the resume consumes it
    val path = java.nio.file.Files.createTempDirectory("graft_bpe")
      .toString + "/merges"
    graft.sources.Sinks.writePartitionedParquet(table2, path,
      partitionCols = Seq("round"), sortCols = Seq("phrase"))
    val warm3 = CorpusOps.bpeVocabResumeOn(docs, "doc_id", "text",
      spark.read.parquet(path), 3).collect().map(_.toString)
    assert(warm3.nonEmpty && warm3.toSeq === cold3.toSeq)
    // full-depth resume degenerates to a pure replay: output == artifact
    val replay = CorpusOps.bpeVocabResumeOn(docs, "doc_id", "text",
      table2, 2).collect().map(_.toString)
    assert(replay.toSeq === table2.collect().map(_.toString).toSeq)
    // a gapped table is refused rather than silently mis-replayed
    intercept[IllegalArgumentException] {
      CorpusOps.bpeVocabResumeOn(docs, "doc_id", "text",
        table2.filter(col("round") === 2), 3)
    }
  }

  test("bpe_encode: bounded id space, OOV-consistent, round-1 == phrase_merge") {
    val docs = graft.sources.Tables(spark, sfDir).documents
    val (enc, ids) = CorpusOps.bpeEncodeIdsOn(docs, "doc_id", "text",
      CorpusOps.BpeRounds)
    val m = CorpusOps.bpeVocabOn(docs, "doc_id", "text", CorpusOps.BpeRounds)
      .count()
    val maxId = m + CorpusOps.EncodeBaseK
    // every id is in the bounded space [0, M+K]; lengths line up per doc
    val rows = enc.select(col("doc_id"), col("toks"), col("ids")).collect()
      .map(r => (r.getLong(0), r.getSeq[String](1), r.getSeq[Int](2))).toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (_, toks, idv) =>
      assert(toks.length === idv.length)
      assert(idv.forall(i => i >= 0 && i <= maxId))
    }
    assert(ids.values.forall(i => i >= 1 && i <= maxId))
    // merge-table phrases take ids <= M (precedence over the base vocab)
    val phrases = CorpusOps.bpeVocabOn(docs, "doc_id", "text",
      CorpusOps.BpeRounds).collect().map(_.getString(1)).toSet
    phrases.foreach(p => assert(ids(p) <= m, s"phrase $p got a base id"))
    // the gate output's n_tokens / n_oov equal the id-level truth
    val out = CorpusOps.bpeEncodeOn(docs, "doc_id", "text",
      CorpusOps.BpeRounds).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    rows.foreach { case (id, toks, idv) =>
      assert(out(id) === ((toks.length, idv.count(_ == 0))))
    }
    // the encoder actually compresses (some merge fired somewhere) and the
    // fixture exercises the OOV path (vocab bound is below the inventory)
    assert(rows.map(_._2.length.toLong).sum <
      docs.select(graft.operators.TextOps.tokens(col("text"))).collect()
        .map(_.getSeq[String](0).length.toLong).sum)
    // the OOV path: a base vocab SMALLER than the merged inventory (the
    // deploy-scale relationship) encodes the tail as id 0, and every
    // in-vocab id keeps its value from the full-K map (cut stability)
    val (encS, idsS) = CorpusOps.bpeEncodeIdsOn(docs, "doc_id", "text",
      CorpusOps.BpeRounds, baseK = 8)
    val sRows = encS.select(col("doc_id"), col("ids")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(sRows.values.exists(_.contains(0)))
    assert(idsS.forall { case (t, i) => ids(t) === i })
    // rounds=1 encode length equals the single-round phrase_merge result
    val e1 = CorpusOps.bpeEncodeOn(docs, "doc_id", "text", 1)
      .select(col("doc_id"), col("n_tokens")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val pm = CorpusOps.phraseMerge(spark, sfDir)
      .select(col("doc_id"), col("n_tokens_after")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(e1 === pm)
  }

  test("bpe_roundtrip: decode inverts encode; merged docs round-trip lossless") {
    val docs = graft.sources.Tables(spark, sfDir).documents
    val rt = CorpusOps.bpeRoundtripOn(docs, "doc_id", "text",
      CorpusOps.BpeRounds).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5)))
    assert(rt.nonEmpty)
    // The documented decode semantics allow lossless = 0 for an in-vocab
    // SOURCE token containing a literal '_' (it splits like a merge), so the
    // exact-roundtrip assertions are guarded to underscore-free docs rather
    // than leaning on the harness corpus happening to contain none.
    val hasUnderscore = docs.filter(col("text").contains("_"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    rt.foreach { case (id, nTok, nOov, nWs, nDec, lossless) =>
      assert(nTok <= nWs, s"doc $id: merges can only compress")
      if (nOov == 0 && !hasUnderscore(id)) {
        // every in-vocab doc round-trips EXACTLY — this is the assertion
        // the r7 separator bug (split on ' ' against '_'-joined merges)
        // would have failed on any doc containing a merge
        assert(nDec === nWs, s"doc $id: decode length drifted")
        assert(lossless === 1, s"doc $id: decode(encode(x)) != x")
      } else {
        // an OOV id decodes to <unk>, which cannot equal its source token
        assert(lossless === 0, s"doc $id: OOV doc claimed lossless")
      }
    }
    // the guarantee is non-vacuous: some doc actually merged AND round-trips
    assert(rt.exists(r => r._2 < r._4 && r._6 == 1),
      "no merged doc round-tripped — the decode never unfolded a merge")
  }

  test("kn scorer is total over unseen deploy tokens (seeded <unk> row)") {
    val s = spark
    import s.implicits._
    // training vocab fits inside UnigramVocabK => no OOV pairs were seen,
    // so without seeding the '<unk>' fallback keys would be absent
    val train = Seq((1L, "a b a b c"), (2L, "a c b a"), (3L, "b c a b"))
      .toDF("doc_id", "text")
    val t = CorpusOps.knTrainTablesOn(train, "doc_id", "text")
    val m = CorpusOps.knCollect(t)
    assert(!m.bg.keysIterator.exists(_.contains("<unk>")))
    assert(m.ca.contains("<unk>") && m.n1f.contains("<unk>") &&
      m.n1p.contains("<unk>"))
    val deploy = Seq((9L, "zz qq a b")).toDF("doc_id", "text")
    val lit = CorpusOps.knScoreWith(m, deploy, "doc_id", "text").collect()
    val jn = CorpusOps.knScoreJoinWith(t, deploy, "doc_id", "text").collect()
    for (r <- lit ++ jn) {
      val ce = r.getAs[Double]("cross_entropy")
      assert(!ce.isNaN && !ce.isInfinity && ce > 0, s"not finite: $r")
    }
    // both spellings back off identically on the unseen input
    assert(lit.map(_.toString).toSeq === jn.map(_.toString).toSeq)
  }

  test("kn literal and broadcast-join scorers agree on the gate corpus") {
    val docs = graft.sources.Tables(spark, sfDir).documents
    val t = CorpusOps.knTrainTablesOn(docs, "doc_id", "text")
    val m = CorpusOps.knCollect(t)
    val lit = CorpusOps.knScoreWith(m, docs, "doc_id", "text")
      .orderBy(col("doc_id")).collect().map(_.toString)
    val jn = CorpusOps.knScoreJoinWith(t, docs, "doc_id", "text")
      .orderBy(col("doc_id")).collect().map(_.toString)
    assert(lit.nonEmpty && lit.toSeq === jn.toSeq)
    // and both equal the C55 batch query on the training corpus
    val batch = CorpusOps.knLogprob(spark, sfDir).collect().map(_.toString)
    assert(lit.toSeq === batch.toSeq)
  }

  test("knScoreWith refuses a model past the literal ceiling") {
    val big = (1 to (CorpusOps.KnLiteralMax.toInt + 1))
      .map(i => s"t$i x" -> 1L).toMap
    val one = Map("x" -> 1L, "<unk>" -> 1L)
    val m = CorpusOps.KnModel(Set("x"), big, one, one, one, big.size.toLong)
    val e = intercept[IllegalArgumentException] {
      CorpusOps.knScoreWith(m, spark.emptyDataFrame, "doc_id", "text")
    }
    assert(e.getMessage.contains("KnLiteralMax"))
  }

  test("bpe_vocab oracle SQL is generated from BpeRounds") {
    val sql = CorpusOps.bpeVocabSql
    (1 to CorpusOps.BpeRounds).foreach(r =>
      assert(sql.contains(s"FROM bg$r"), s"missing round-$r mine"))
    assert(!sql.contains(s"bg${CorpusOps.BpeRounds + 1}"))
    // every non-final round walks its merges forward; the final one only mines
    (1 until CorpusOps.BpeRounds).foreach(r =>
      assert(sql.contains(s"walk$r"), s"missing round-$r walk"))
    assert(!sql.contains(s"walk${CorpusOps.BpeRounds}"))
  }

  test("weighted_sample: replays in the JVM; inclusion tracks the weight") {
    val docs = graft.sources.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split("\\s+").length.toLong))
    val prios = docs.map { case (id, w) =>
      val h48 = java.lang.Long.parseLong(md5hex(s"$id:ws").take(12), 16)
      val u = (h48 + 1).toDouble / 281474976710656.0
      (id, w, math.floor(math.log(u) / w * 1e12).toLong)
    }
    val k = CorpusOps.WsK
    val expected = prios.sortBy(p => (-p._3, p._1)).take(k)
      .zipWithIndex.map { case ((id, w, kp), i) => (id, w, kp, i + 1) }.toSeq
    val got = CorpusOps.weightedSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    assert(got === expected)
    // weighting works: sampled docs are heavier on average than the corpus
    val sampled = got.map(_._1).toSet
    val avgIn = docs.filter(d => sampled.contains(d._1)).map(_._2).sum.toDouble / k
    val avgAll = docs.map(_._2).sum.toDouble / docs.length
    assert(avgIn > avgAll, s"sampled avg $avgIn vs corpus avg $avgAll")
  }

  test("vocab_oov: rates replay against the independent top-K vocabulary") {
    val docs = graft.sources.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
    val vocab = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.length)
      .toSeq.sortBy { case (t, c) => (-c, t) }.take(CorpusOps.OovVocabK)
      .map(_._1).toSet
    val got = CorpusOps.vocabOov(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3))))
      .toMap
    docs.foreach { case (id, ts) =>
      val oov = ts.count(!vocab.contains(_))
      val (n, o, rate) = got(id)
      assert(n === ts.size && o === oov)
      assert(rate === oov.toDouble / ts.size)
    }
    // the audit discriminates: rates vary across the corpus
    assert(got.values.map(_._3).toSet.size > 1)
  }

  test("token_pmi: co-occurrence PMI replays from independent doc sets") {
    val docs = graft.sources.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").distinct.toSet)
    val vocab = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.length)
      .toSeq.sortBy { case (t, c) => (-c, t) }.take(CorpusOps.PmiVocabK)
      .map(_._1).toSet
    val n = docs.length.toLong
    val dfc = vocab.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    val expected = docs.flatMap { case (_, ts) =>
      val vt = ts.intersect(vocab).toSeq.sorted
      for (i <- vt.indices; j <- i + 1 until vt.size) yield (vt(i), vt(j))
    }.groupBy(identity).view.mapValues(_.length.toLong)
      .filter(_._2 >= CorpusOps.PmiMinPairs)
      .map { case ((a, b), cab) =>
        (a, b) -> ((cab, math.floor(math.log(n.toDouble * cab /
          (dfc(a).toDouble * dfc(b))) * 1e12).toLong))
      }.toMap
    val got = CorpusOps.tokenPmi(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
    assert(got.nonEmpty)
    // PMI separates: both positively and negatively associated pairs exist
    assert(got.values.exists(_._2 > 0) && got.values.exists(_._2 < 0))
  }

  test("export_shards: manifest replays from scratch; sink round-trips per shard") {
    val docs = graft.sources.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // independent manifest: JVM md5, JVM xor
    val expected = docs.map { case (id, text) =>
      val shard = (java.lang.Long.parseLong(md5hex(s"$id:export").take(12), 16)
        % CorpusOps.ExportNumShards).toInt
      val c48 = java.lang.Long.parseLong(md5hex(text).take(12), 16)
      (shard, text.trim.split("\\s+").length.toLong,
        text.getBytes("UTF-8").length.toLong, c48)
    }.groupBy(_._1).map { case (shard, rows) =>
      shard -> ((rows.size.toLong, rows.map(_._2).sum, rows.map(_._3).sum,
        rows.map(_._4).reduce(_ ^ _)))
    }
    val got = CorpusOps.exportShards(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got === expected)
    // the sink lays data out by shard dir; the read-back manifest matches,
    // proving the checksum verifies an export AFTER the write reshuffles it
    val out = java.nio.file.Files.createTempDirectory("graft_export").toString
    try {
      val assigned = CorpusOps.exportAssignOn(
        graft.sources.Tables(spark, sfDir).documents, "doc_id", "text",
        CorpusOps.ExportNumShards)
      graft.sources.Sinks.writePartitionedParquet(assigned, out,
        Seq("shard"), Seq("doc_id"))
      val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
        .map(_.getName).filter(_.startsWith("shard=")).sorted
      assert(dirs.length === got.keySet.size)
      val readBack = CorpusOps.exportManifestOn(spark.read.parquet(out))
        .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
      assert(readBack === expected)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("dedup_incremental: equals the naive anti-join; bloom actually prunes") {
    val naive = CorpusOps.incrementalBatch(spark, sfDir)
      .withColumn("ch", sha2(col("text"), 256))
      .join(graft.sources.Tables(spark, sfDir).documents
        .select(sha2(col("text"), 256).as("ch")), Seq("ch"), "left_anti")
      .select(col("doc_id"), col("ch").as("content_hash"))
      .collect().map(_.toString).sorted
    val got = CorpusOps.dedupIncremental(spark, sfDir)
      .collect().map(_.toString).sorted
    assert(got.toSeq === naive.toSeq)
    // every %11 exact copy is a dup (dropped); every %13 fresh doc survives
    val ids = CorpusOps.dedupIncremental(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(ids.forall(_ >= 300000000L))
    val nFresh = graft.sources.Tables(spark, sfDir).documents
      .filter(col("doc_id") % 13 === 0).count()
    assert(ids.size === nFresh.toInt)
  }

  test("unigram kernel: Viterbi min-cost, longest-piece tie rule, unk fallback (C80)") {
    import scala.jdk.CollectionConverters._
    def seg(word: String, costs: Map[String, Long], unk: Long = 99L): Seq[String] = {
      val m = new java.util.HashMap[String, java.lang.Long]()
      costs.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
      val out = new java.util.ArrayList[AnyRef]()
      graft.functions.TextKernels.uniSegmentWord(word, m, 6, unk, out)
      out.asScala.map(_.toString).toSeq
    }
    // equal total cost (10 = 5+5): smallest split point wins → one piece
    assert(seg("ab", Map("a" -> 5L, "b" -> 5L, "ab" -> 10L)) === Seq("ab"))
    // strictly cheaper split beats the whole piece
    assert(seg("ab", Map("a" -> 4L, "b" -> 5L, "ab" -> 10L)) === Seq("a", "b"))
    // characters absent from the vocab segment as unk-cost singles
    assert(seg("xq", Map.empty[String, Long], unk = 7L) === Seq("x", "q"))
    // global optimum, not greedy-longest-prefix: ab+c (6) beats a+bc (12)
    assert(seg("abc", Map("ab" -> 3L, "c" -> 3L, "a" -> 9L, "b" -> 9L,
      "bc" -> 3L)) === Seq("ab", "c"))
  }

  test("unigram_vocab: multi-char pieces prune monotonically, counts positive") {
    val rows = CorpusOps.unigramVocab(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val byRound = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byRound.keySet === (0 to CorpusOps.UniEmRounds).toSet)
    // hard-EM counts only include pieces USED by a best segmentation, and
    // a dropped MULTI can never return (no arc without a vocab entry);
    // dropped SINGLES can re-enter through the unk-cost totality valve,
    // so the monotonicity claim is pinned for multis only
    (1 to CorpusOps.UniEmRounds).foreach { r =>
      val entered = byRound(r) -- byRound(r - 1)
      assert(entered.forall(_.length == 1),
        s"round $r grew multi-char pieces: ${entered.filter(_.length > 1)}")
      assert(byRound(r).nonEmpty)
    }
    assert(rows.forall(_._3 > 0))
  }

  test("unigram_encode: every token covered, concat-lossless, deterministic") {
    val rows = CorpusOps.unigramEncode(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3),
        r.getString(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nt, np, f, _) =>
      assert(np >= nt, s"doc $id: fewer pieces than tokens")
      assert(f === np.toDouble / nt, s"doc $id fertility")
    }
    // losslessness: the pieces of every doc concatenate back to its
    // tokens exactly (the DP never drops or invents characters)
    val docs = graft.sources.Tables(spark, sfDir).documents
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    val snaps = CorpusOps.uniTrain(docs)
    val (costs, unk) = CorpusOps.uniCostsOf(snaps.last)
    docs.select(col("toks"),
        graft.functions.textsketch.unigram_segment_all(col("toks"), costs,
          CorpusOps.UniMaxPieceLen, unk).as("pieces"))
      .collect().foreach { r =>
        assert(r.getSeq[String](1).mkString("") ===
          r.getSeq[String](0).mkString(""))
      }
    // determinism: a second full train+encode reproduces every fingerprint
    val again = CorpusOps.unigramEncode(spark, sfDir).collect()
      .map(_.getString(4))
    assert(again.toSeq === rows.map(_._5).toSeq)
  }

  test("wordpiece kernel: longest-match-first, ## continuations, whole-word unk (C81)") {
    import graft.functions.TextKernels
    def seg(word: String, vocab: Seq[String]): Seq[String] = {
      val s = new java.util.HashSet[String](); vocab.foreach(s.add)
      val out = new java.util.ArrayList[AnyRef]()
      TextKernels.wpSegmentWord(word, s, out)
      (0 until out.size).map(i => out.get(i).toString)
    }
    // longest match wins over a shorter valid split
    assert(seg("abc", Seq("a", "ab", "##b", "##c")) === Seq("ab", "##c"))
    // continuation pieces probe the ##-spelling, never the bare one
    assert(seg("abc", Seq("a", "bc", "##bc")) === Seq("a", "##bc"))
    // any positional miss fails the WHOLE word, discarding partial pieces
    assert(seg("abc", Seq("ab")) === Seq("[UNK]"))
    assert(seg("xyz", Seq("a", "##y", "##z")) === Seq("[UNK]"))
    // single-char word, present and absent
    assert(seg("a", Seq("a")) === Seq("a"))
    assert(seg("q", Seq("a")) === Seq("[UNK]"))
  }

  test("wordpiece trainer: likelihood argmax with deterministic tiebreak (C81)") {
    // histogram {aaab:3, aab:2}: unit counts a:5 ##a:8 ##b:5; pair counts
    // (a,##a):5 (##a,##a):3 (##a,##b):5 -> scores 5/40, 3/64, 5/40: the
    // two 1/8s tie on the micro-nat grid and '##a' < 'a' breaks the tie
    val merges = CorpusOps.wpTrain(Seq("aaab" -> 3L, "aab" -> 2L), rounds = 2)
    assert(merges.head.a === "##a" && merges.head.b === "##b" &&
      merges.head.merged === "##ab")
    // every merged spelling strips the continuation marker of b
    merges.foreach { m =>
      assert(m.b.startsWith("##"))
      assert(m.merged === m.a + m.b.drop(2))
    }
    assert(merges.map(_.round) === Seq(1, 2))
    // the full corpus supports all WpRounds rounds (the require() inside
    // wpTrain is the loud-failure guard the oracle's walk depends on)
    val full = CorpusOps.wpTrain(
      CorpusOps.wpWordsOf(graft.sources.Tables(spark, sfDir).documents,
        "doc_id", "text"))
    assert(full.map(_.round) === (1 to CorpusOps.WpRounds))
    assert(full.map(_.merged).distinct.size === CorpusOps.WpRounds)
  }

  test("wordpiece_encode: unk-free docs round-trip; pieces never exceed chars (C81)") {
    import graft.functions.textsketch.wordpiece_segment_all
    val docs = graft.sources.Tables(spark, sfDir).documents
    val enc = CorpusOps.wordpieceEncode(spark, sfDir).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      assert(r.getInt(2) >= r.getInt(1), s"doc ${r.getLong(0)}: fewer pieces than words")
      assert(r.getInt(3) >= 0 && r.getInt(3) <= r.getInt(1))
    }
    // recompute pieces with the kernel under the same trained vocab: on
    // unk-free words, stripping ## and concatenating restores the word
    val words = CorpusOps.wpWordsOf(docs, "doc_id", "text")
    val vocab = CorpusOps.wpVocabOf(words, CorpusOps.wpTrain(words))
    val rows = docs.select(col("doc_id"),
        graft.operators.TextOps.tokens(col("text")).as("toks"))
      .select(explode(col("toks")).as("w")).distinct()
      .select(col("w"), wordpiece_segment_all(array(col("w")), vocab).as("p"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    assert(rows.nonEmpty)
    rows.foreach { case (w, p) =>
      if (!p.contains("[UNK]"))
        assert(p.map(_.stripPrefix("##")).mkString === w, s"word $w broke")
      else assert(p === Seq("[UNK]"), s"word $w: partial unk emit")
    }
    // the training corpus must not be all-unk (the vocab LEARNED something)
    assert(rows.count(!_._2.contains("[UNK]")) > rows.length / 2)
  }

  test("tokenizer_compare: one board row per family over the same corpus (C82)") {
    val rows = CorpusOps.tokenizerCompare(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.map(_._1).toSeq === Seq("bpe", "unigram", "wordpiece"))
    // every family tokenized the SAME corpus: identical doc/token masses
    assert(rows.map(_._2).distinct.size === 1)
    assert(rows.map(_._3).distinct.size === 1)
    // fertility is the ratio the row itself carries
    rows.foreach { case (f, _, nt, np, nu, fert, ur) =>
      assert(math.abs(fert - np.toDouble / nt) < 1e-12, s"$f fertility")
      assert(math.abs(ur - nu.toDouble / nt) < 1e-12, s"$f unk_rate")
    }
    // the wordpiece row equals the C81 per-doc outputs summed (the board
    // cannot fork the encoder it reports on)
    val wp = CorpusOps.wordpieceEncode(spark, sfDir)
      .agg(sum(col("n_pieces")), sum(col("n_unk"))).head()
    val board = rows.find(_._1 == "wordpiece").get
    assert(board._4 === wp.getLong(0) && board._5 === wp.getLong(1))
    // BPE merges whole tokens: pieces can only shrink; char-level families
    // split tokens: pieces can only grow
    assert(rows.find(_._1 == "bpe").get._4 <= board._3)
    assert(board._4 >= board._3)
  }

  test("mixture_temperature: low-resource sources upsampled toward parity (C84)") {
    val docs = graft.sources.Tables(spark, sfDir).documents
    val sel = CorpusOps.mixtureTemperature(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(sel.nonEmpty)
    // deterministic: the sample is a pure function of doc ids
    val again = CorpusOps.mixtureTemperature(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(again.toSeq === sel.toSeq)
    // the temperature inverts resourcing: a smaller source must get an
    // inclusion threshold >= any larger source's (p^alpha flattens shares)
    val mass = docs.select(col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .groupBy("source").agg(sum(col("n")).as("m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val thr = sel.map(r => r._2 -> r._3).toMap
    assert(thr.size > 1, "degenerate corpus: single source")
    for (a <- thr.keys; b <- thr.keys if mass(a) < mass(b))
      assert(thr(a) >= thr(b), s"$a (${mass(a)}) thr ${thr(a)} < $b (${mass(b)}) thr ${thr(b)}")
    // and the smallest source's SAMPLED share must strictly exceed its
    // natural share (the whole point of temperature sampling)
    val small = mass.minBy(_._2)._1
    val selBySrc = sel.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val natural = mass(small).toDouble / mass.values.sum
    val sampled = selBySrc(small) / sel.length
    assert(sampled > natural, s"no upsampling: $sampled <= $natural")
  }

  test("epoch_plan: integer plan conserves the budget; small sources repeat (C85)") {
    val rows = CorpusOps.epochPlan(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, mass, target, full, capped, rem) =>
      // the plan's own arithmetic: epochs and remainder derive from target
      assert(full === target / mass, s"$src full_epochs")
      assert(capped === math.min(full, CorpusOps.MaxEpochs), s"$src cap")
      // a capped source runs exactly MaxEpochs full passes and NO
      // fractional pass — rem_thr must not execute past the ceiling
      val expectRem =
        if (full >= CorpusOps.MaxEpochs) 0L
        else math.min(65536L, 65536L * (target % mass) / mass)
      assert(rem === expectRem.toInt, s"$src rem_thr")
      assert(rem >= 0 && rem <= 65536)
    }
    // a 3x-corpus budget must make at least one source genuinely repeat
    assert(rows.exists(_._4 >= 1), "no source repeats under a 3x budget")
    // temperature flattening: the smallest source plans MORE epochs-worth
    // of its own mass than the largest (target/mass anti-monotone in mass)
    val smallest = rows.minBy(_._2); val largest = rows.maxBy(_._2)
    assert(smallest._2 < largest._2, "degenerate corpus")
    assert(smallest._3.toDouble / smallest._2 >
      largest._3.toDouble / largest._2, "temperature did not flatten")
    // budget conservation: total target within integer-rounding of 3x
    val budget = 3L * rows.map(_._2).sum
    val planned = rows.map(_._3).sum
    assert(planned <= budget && planned > budget - 1000L * rows.length,
      s"plan lost the budget: $planned of $budget")
  }

  test("vocab_growth: monotone curves, exact totals, concave type growth (C91)") {
    val rows = CorpusOps.vocabGrowth(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === (1 to CorpusOps.VocabGrowthBins))
    // strictly monotone doc/token masses; non-decreasing types
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 > a._2 && b._3 > a._3, s"mass not growing at ${b._1}")
      assert(b._4 >= a._4, s"types shrank at ${b._1}")
    }
    // the final checkpoint is EXACTLY the corpus totals
    val docs = graft.sources.Tables(spark, sfDir).documents
    val last = rows.last
    assert(last._2 === docs.count())
    val totTok = docs.select(size(split(trim(col("text")), "\\s+"))
        .cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(last._3 === totTok)
    val totTypes = docs.select(explode(split(trim(col("text")), "\\s+"))
      .as("t")).distinct().count()
    assert(last._4 === totTypes)
    // Heaps-law shape: the first half of the corpus discovers at least
    // as many new types as the second (sublinear vocabulary growth)
    val mid = rows(rows.length / 2 - 1)
    assert(mid._4 >= last._4 - mid._4, "type growth not concave")
  }

  test("line_dedup: seeded boilerplate removed from every carrier; " +
      "unique footnotes and base content retained (C92)") {
    import org.apache.spark.sql.functions._
    val rows = CorpusOps.lineDedup(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val base = graft.sources.Tables(spark, sfDir).documents
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(rows.keySet === base.toSet)
    for (id <- base) {
      val (nLines, nRemoved, retainedH) = rows(id)
      // seeded geometry: 1 base line + the injected chrome/footnote lines
      val injected = (if (id % 3 == 0) 1 else 0) + (if (id % 5 == 0) 1 else 0) +
        (if (id % 97 == 0) 1 else 0)
      assert(nLines === 1L + injected, s"doc $id line count")
      // EVERY injected chrome line is removed (df = n/3 and n/5 >> minDf);
      // the footnote and the base line are unique -> retained. Natural
      // base-text duplicates would show as extra removals; the corpus has
      // none at the gate sf (asserted here, so a testdata change is loud).
      assert(nRemoved === ((if (id % 3 == 0) 1L else 0L) +
        (if (id % 5 == 0) 1L else 0L)), s"doc $id removed count")
      assert(retainedH !== 0L, s"doc $id retained fingerprint empty")
    }
    // the boilerplate table itself is the SMALL side: exactly 2 lines
    val boiler = CorpusOps.boilerLinesOf(
      CorpusOps.lineCorpus(spark, sfDir), "doc_id", "text").collect()
    assert(boiler.length === 2)
  }

  test("C95 ppl_band_select: tercile bands partition the corpus, banding " +
      "is monotone in cross-entropy, and the t-digest deploy path agrees") {
    val docs = graft.sources.Tables(spark, sfDir).documents
    val rows = CorpusOps.pplBandSelectOn(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getString(3), r.getInt(4)))
    assert(rows.nonEmpty)
    // every scored doc is banded, and kept == (band != tail) — the CCNet
    // head+middle retention rule
    rows.foreach { case (id, _, band, kept) =>
      assert(Set("head", "middle", "tail")(band), s"$id band $band")
      assert(kept === (if (band == "tail") 0 else 1), s"$id kept")
    }
    // bands are monotone: max(head) <= min(middle), max(middle) <= min(tail)
    def ceOf(b: String) = rows.filter(_._3 == b).map(_._2)
    assert(ceOf("head").max <= ceOf("middle").min)
    assert(ceOf("middle").max <= ceOf("tail").min)
    // interpolated terciles split ~n/3 each (exact thirds up to ties and
    // the interpolation boundary)
    val n = rows.length
    Seq("head", "middle", "tail").foreach { b =>
      val m = ceOf(b).length
      assert(math.abs(m - n / 3.0) <= math.max(2, n / 10.0), s"$b mass $m/$n")
    }
    // deploy path: t-digest thresholds band nearly every doc identically
    // (the approx error only moves docs hugging a threshold)
    val approx = CorpusOps.pplBandSelectOn(docs, "doc_id", "text",
        exact = false).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val moved = rows.count { case (id, _, band, _) => approx(id) != band }
    assert(moved <= math.max(1, n / 20), s"$moved of $n docs changed band")
  }

  test("tfidf_topterms: hand-checked board on a seeded corpus, exact " +
      "brute-force parity over the real corpus (C98)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "apple apple banana common"),
      (2L, "banana cherry common"),
      (3L, "common common")).toDF("doc_id", "text")
    val got = CorpusOps.tfidfTopTermsOn(docs, "doc_id", "text", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    def idf(n: Long, df: Long): Long =
      math.floor(math.log(n.toDouble / df) * 1e12).toLong
    assert(got.toSeq === Seq(
      (1L, 1L, "apple", 2L, 2 * idf(3, 1)),
      (1L, 2L, "banana", 1L, idf(3, 2)),
      (1L, 3L, "common", 1L, 0L),
      (2L, 1L, "cherry", 1L, idf(3, 1)),
      (2L, 2L, "banana", 1L, idf(3, 2)),
      (2L, 3L, "common", 1L, 0L),
      (3L, 1L, "common", 2L, 0L)))

    // real corpus: exact brute-force recomputation in plain Scala
    val texts = graft.sources.Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
    val n = texts.length.toLong
    val dfm = texts.flatMap { case (_, ts) => ts.distinct }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = texts.flatMap { case (id, ts) =>
      ts.groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .map { case (t, tf) => (t, tf, tf * idf(n, dfm(t))) }
        .sortBy { case (t, _, s) => (-s, t) }
        .take(CorpusOps.TfidfTopK).zipWithIndex
        .map { case ((t, tf, s), i) => (id, i + 1L, t, tf, s) }
    }.sortBy(r => (r._1, r._2))
    val real = CorpusOps.tfidfTopTerms(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(real.nonEmpty && real.toSeq === expected)
  }

  test("zipf_slope: driver-side brute-force parity on the real corpus, " +
      "and the slope is negative (frequencies decay in rank) (C100)") {
    val docs = graft.sources.Tables(spark, sfDir).documents
      .select(col("source"), col("text")).collect()
      .map(r => r.getString(0) -> r.getString(1))
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      // exact TextOps.tokens semantics: split(trim(x), "\s+"), no
      // empty-filter (an all-whitespace doc would yield one "" token in
      // BOTH engines — parity over prettiness)
      val freq = ds.flatMap(_._2.trim.split("\\s+"))
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      val head = freq.sortBy { case (t, f) => (-f, t) }
        .take(CorpusOps.ZipfTopRanks).zipWithIndex
        .map { case ((_, f), i) =>
          (math.floor(math.log((i + 1).toDouble) * 1e3).toLong,
            math.floor(math.log(f.toDouble) * 1e3).toLong) }
      val n = head.size.toLong
      val sx = head.map(_._1).sum; val sy = head.map(_._2).sum
      val sxy = head.map(t => t._1 * t._2).sum
      val sxx = head.map(t => t._1 * t._1).sum
      src -> (n, n * sxy - sx * sy, n * sxx - sx * sx)
    }
    val real = CorpusOps.zipfSlope(spark, sfDir).collect()
    assert(real.nonEmpty && real.length === expected.size)
    real.foreach { r =>
      val (n, num, den) = expected(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((n, num, den)),
        s"source ${r.getString(0)}")
      assert(r.getDouble(4) < 0.0, // Zipf: frequency decays in rank
        s"source ${r.getString(0)} slope ${r.getDouble(4)}")
    }
  }

  test("suffix_lcp: banana's LCP array is the textbook fixture; " +
      "driver-side parity on the gate slice; the codegen kernel matches " +
      "a Scala reference on random strings (C101)") {
    import spark.implicits._
    // SA order of banana: a(5) ana(3) anana(1) banana(0) na(4) nana(2)
    // LCP:                 0    1      3        0         0     2
    val one = Seq((0L, "banana")).toDF("doc_id", "text")
    val got = CorpusOps.suffixLcpOn(one, "doc_id", "text").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 5L, 0L), (2L, 3L, 1L), (3L, 1L, 3L),
      (4L, 0L, 0L), (5L, 4L, 0L), (6L, 2L, 2L)))

    // gate slice: lcp equals a driver-side common-prefix computation
    // over the materialized suffixes
    val real = CorpusOps.suffixLcp(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(real.nonEmpty)
    val wins = graft.sources.Tables(spark, sfDir).documents
      .filter(col("doc_id") % CorpusOps.SaDocMod === 0)
      .select(col("doc_id"),
        substring(lower(regexp_replace(col("text"), "[^a-z0-9 ]", "")),
          1, CorpusOps.SaWindow).as("w"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def lcpOf(a: String, b: String): Long =
      a.zip(b).takeWhile { case (x, y) => x == y }.size.toLong
    real.groupBy(_._1).foreach { case (id, rows) =>
      val w = wins(id)
      val byRank = rows.sortBy(_._2)
      byRank.sliding(2).foreach {
        case Array(p, c) =>
          val expect = lcpOf(w.substring(p._3.toInt), w.substring(c._3.toInt))
          assert(c._4 === expect, s"doc $id rank ${c._2}")
        case _ => ()
      }
      assert(byRank.head._4 === 0L) // rank 1: no predecessor
    }

    // the kernel itself: interpreted eval vs a Scala reference on
    // random sanitized strings and positions (codegen parity is what
    // the distributed runs above execute)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val w = (1 to (1 + rnd.nextInt(40)))
        .map(_ => "ab0 "(rnd.nextInt(4))).mkString
      val pa = rnd.nextInt(w.length).toLong
      val pb = rnd.nextInt(w.length).toLong
      val expr = graft.functions.CommonPrefixLengthAt(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(w),
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.catalyst.expressions.Literal(pa),
        org.apache.spark.sql.catalyst.expressions.Literal(pb))
      val got = expr.eval(null).asInstanceOf[Long]
      val expect = lcpOf(w.substring(pa.toInt), w.substring(pb.toInt))
      assert(got === expect, s"w=$w pa=$pa pb=$pb")
    }
  }

  test("lrs_per_doc: banana's longest repeated substring is 'ana' (3); " +
      "the board is exactly the suffix_lcp rollup (C102)") {
    import spark.implicits._
    val one = Seq((0L, "banana")).toDF("doc_id", "text")
    val lcp = CorpusOps.suffixLcpOn(one, "doc_id", "text")
    // max lcp over banana's array [0,1,3,0,0,2] = 3 = |"ana"|
    assert(lcp.agg(max(col("lcp"))).head().getLong(0) === 3L)

    val board = CorpusOps.lrsPerDoc(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(board.nonEmpty)
    val expect = CorpusOps.suffixLcp(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
      .groupBy(_._1).map { case (id, xs) =>
        (id, xs.map(_._2).max,
          xs.count(_._2 >= CorpusOps.LrsMinSpan).toLong)
      }.toSeq.sortBy(_._1)
    assert(board.toSeq === expect)
  }

  test("suffix_array: banana is the textbook fixture; ranks are a " +
      "1..len permutation and match a driver-side suffix sort (C99)") {
    import spark.implicits._
    // the classic: suffixes of "banana" in order are
    // a(5) < ana(3) < anana(1) < banana(0) < na(4) < nana(2)
    val one = Seq((0L, "banana")).toDF("doc_id", "text")
    val got = CorpusOps.suffixArrayOn(one, "doc_id", "text").collect()
      .map(r => r.getLong(2) -> r.getLong(1)).sortBy(_._1).map(_._2)
    assert(got.toSeq === Seq(5L, 3L, 1L, 0L, 4L, 2L))

    // real corpus slice: the doubling chain equals a materialized
    // suffix sort, per doc, for every doc in the gate slice
    val docs = graft.sources.Tables(spark, sfDir).documents
      .filter(col("doc_id") % CorpusOps.SaDocMod === 0)
      .select(col("doc_id"),
        substring(lower(regexp_replace(col("text"), "[^a-z0-9 ]", "")),
          1, CorpusOps.SaWindow).as("w"))
      .filter(length(col("w")) > 0)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(docs.nonEmpty)
    val expected = docs.flatMap { case (id, w) =>
      w.indices.sortBy(w.substring(_)).zipWithIndex
        .map { case (pos, i) => (id, pos.toLong, i + 1L) }
    }.sortBy(t => (t._1, t._3))
    val real = CorpusOps.suffixArray(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(real.toSeq === expected.toSeq)
    // ranks are a permutation 1..len per doc
    real.groupBy(_._1).foreach { case (id, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1L to rs.length).toSeq, s"doc $id")
    }
  }
}
