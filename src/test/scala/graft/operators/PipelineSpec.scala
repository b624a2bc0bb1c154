package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  import spark.implicits._

  test("scrub redacts emails, ssns, and phones with typed placeholders") {
    val out = Seq("mail a.b+c@test.org ssn 123-45-6789 call 555-0199 done")
      .toDF("text").select(Pipeline.scrub(col("text"))).head().getString(0)
    assert(out === "mail [EMAIL] ssn [SSN] call [PHONE] done")
  }

  test("pii scrub counts match the injected corpus pattern") {
    val rows = Pipeline.textPiiScrub(spark, sfDir).collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("n_emails") === (if (id % 3 == 0) 1 else 0))
      assert(r.getAs[Int]("n_phones") === (if (id % 4 == 0) 1 else 0))
      assert(r.getAs[Int]("n_ssns") === (if (id % 5 == 0) 1 else 0))
    }
  }

  test("sample split is deterministic and near the 80/10/10 design point") {
    val counts = Pipeline.sampleSplit(spark, sfDir)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    assert(counts("train") / n > 0.7 && counts("train") / n < 0.9)
    assert(counts.getOrElse("val", 0L) > 0 && counts.getOrElse("test", 0L) > 0)
    // rerun gives the identical assignment (content-hash, not random())
    val a = Pipeline.sampleSplit(spark, sfDir).collect().map(_.toString)
    val b = Pipeline.sampleSplit(spark, sfDir).collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("stratified sample: per-stratum rates near target, layout-invariant") {
    val docs = graft.sources.Tables(spark, sfDir).documents
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Pipeline.stratifiedSample(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // a stratum absent from the spec is kept in full, never dropped
    val listed = Pipeline.StrataThresholds.map(_._1).toSet
    (totals.keySet -- listed).foreach { lang =>
      assert(kept.getOrElse(lang, 0L) === totals(lang),
        s"unlisted stratum $lang must keep all rows")
    }
    Pipeline.StrataThresholds.foreach { case (lang, thr) =>
      val rate = kept.getOrElse(lang, 0L).toDouble / totals(lang)
      val target = Integer.parseInt(thr, 16) / 65536.0
      assert(math.abs(rate - target) < 0.15,
        s"$lang rate $rate vs target $target")
    }
    // membership is a pure function of (doc_id, lang): identical under
    // any repartitioning — the property sampleBy's per-partition RNG lacks
    val a = Pipeline.stratifiedSample(spark, sfDir).collect().map(_.toString)
    val b = Pipeline.stratifiedSample(spark, sfDir)
      .repartition(13).orderBy(col("doc_id")).collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("quality filter chain: passes=1 iff every rule passes, reason=ok") {
    Pipeline.qualityFilterChain(spark, sfDir).collect().foreach { r =>
      val flags = Seq("pass_min_words", "pass_max_words", "pass_word_len",
        "pass_stopwords").map(r.getAs[Int])
      assert(r.getAs[Int]("passes") === flags.product)
      assert((r.getAs[String]("reject_reason") == "ok") === (flags.product == 1))
    }
  }

  test("ngram topk is ordered by document frequency with stable ties") {
    val rows = Pipeline.ngramTopk(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= Pipeline.NgramTopK)
    val keys = rows.map(r => (-r.getAs[Long]("df"), r.getAs[String]("gram")))
    assert(keys.toSeq === keys.sortBy(identity).toSeq)
  }

  test("heavy hitters: exact when capacity covers the vocabulary") {
    val words = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(5)("c")
    val got = words.toDF("w").repartition(7)
      .agg(graft.functions.heavyhitters.heavy_hitters(col("w"), 8).as("hh"))
      .select(explode(col("hh"))).select("col.item", "col.count")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got === Seq("a" -> 40L, "b" -> 25L, "c" -> 5L))
  }

  test("heavy hitters: retains all items above n/(k+1) under tight capacity") {
    // skewed stream: one dominant item + 50 rare ones, capacity 4
    val words = Seq.fill(300)("hot") ++ (1 to 50).flatMap(i => Seq(s"w$i", s"w$i"))
    val got = words.toDF("w").repartition(5)
      .agg(graft.functions.heavyhitters.heavy_hitters(col("w"), 4).as("hh"))
      .select(explode(col("hh"))).select("col.item", "col.count")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = words.size
    assert(got.contains("hot"), s"dominant item lost: $got")
    // Misra-Gries undercount bound: count >= true - n/(k+1)
    assert(got("hot") >= 300 - n / 5)
    assert(got("hot") <= 300)
  }

  test("token_freq exactness precondition: vocabulary fits the MG capacity at every sf") {
    // the oracle equality of token_freq holds only in the EXACT regime
    // (capacity >= distinct tokens); this enforces the precondition at
    // every driver scale factor so a corpus change fails loudly here
    // rather than nondeterministically in the gate
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val vocab = graft.sources.Tables(spark, s"/root/testdata/$sf").documents
        .select(explode(split(trim(col("text")), "\\s+")).as("t"))
        .agg(countDistinct(col("t"))).head().getLong(0)
      assert(vocab < Pipeline.HeavyHitterCapacity,
        s"$sf vocabulary $vocab >= capacity ${Pipeline.HeavyHitterCapacity}: " +
          "token_freq would leave the exact regime")
    }
  }

  test("connectedComponents converges in O(log n) rounds on a path graph") {
    // a 400-node chain has diameter 399: pure neighbor propagation would
    // need 399 rounds; pointer doubling must finish well inside 25
    val nodes = (1L to 400L).toDF("id")
    val edges = (1L until 400L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Cluster.connectedComponents(nodes, "id", edges, "a", "b")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_id"))
    assert(got.length === 400)
    assert(got.forall(_._2 === 1L), got.filter(_._2 != 1L).take(3).toSeq.toString)
  }

  test("connectedComponents labels every node with its component minimum") {
    val nodes = (1L to 7L).toDF("id")
    // chain 1-2-3 (diameter 2), pair 5-6, isolated 4 and 7
    val edges = Seq((2L, 1L), (2L, 3L), (6L, 5L)).toDF("a", "b")
    val got = Cluster.connectedComponents(nodes, "id", edges, "a", "b")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_id")).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("verifyJaccardPairs matches inverted-index exact scores under full candidacy") {
    val docs = graft.sources.Tables(spark, sfDir).documents
      .filter(col("doc_id") < 60)
    val ids = docs.select(col("doc_id"))
    val cands = ids.select(col("doc_id").as("id_a"))
      .crossJoin(ids.select(col("doc_id").as("id_b")))
      .filter(col("id_a") < col("id_b"))
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("jaccard")).toMap
    val got = toMap(Dedup.verifyJaccardPairs(cands, docs, "doc_id", "text",
      n = 3, threshold = TextOps.JaccardThreshold))
    val exact = toMap(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = TextOps.JaccardThreshold)
      .select(col("id_a"), col("id_b"), col("jaccard")))
    assert(got === exact)
  }

  test("C20 dedup stage: no join is ever keyed by a shingle attribute") {
    // the round-2 scale risk: a shingle-keyed self-join makes one
    // boilerplate shingle a quadratic hot key. The composed LSH-candidate +
    // per-pair-verify plan must join only on band buckets and doc ids.
    val docs = graft.sources.Tables(spark, sfDir).documents
    val cands = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 3, numHashes = Sketch.NumHashes, bands = Sketch.Bands,
      minEstJaccard = Sketch.MinEstJaccard)
    val edges = Dedup.verifyJaccardPairs(cands, docs, "doc_id", "text",
      n = 3, threshold = TextOps.JaccardThreshold)
    val joins = edges.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      val refs = j.condition.toSeq.flatMap(_.references.toSeq).map(_.name)
      assert(!refs.contains("_s"), s"shingle-keyed join found: $refs")
    }
  }

  test("large-star/small-star CC matches min-label CC on every topology") {
    def check(nodes: Seq[Long], edges: Seq[(Long, Long)]): Unit = {
      val n = nodes.toDF("id")
      val e = edges.toDF("a", "b")
      val a = Cluster.connectedComponents(n, "id", e, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val b = Cluster.connectedComponentsStars(n, "id", e, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(a === b)
    }
    // path (diameter = n-1), the doubling/star worst case
    check(1L to 60L, (1L until 60L).map(i => (i, i + 1)))
    // high-degree hub + chain tail: the topology star ops exist for
    check(1L to 250L,
      (2L to 200L).map(i => (200L, i)) ++ (200L until 250L).map(i => (i, i + 1)))
    // disconnected mix incl. singletons and a triangle
    check(1L to 12L, Seq((1L, 2L), (2L, 3L), (3L, 1L), (5L, 6L), (9L, 8L)))
    // edge-less graph: all singletons
    check(1L to 5L, Seq.empty)
  }

  test("curate pipeline: output is quality-passing keepers with stable splits") {
    val out = Pipeline.curatePipeline(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val passing = Pipeline.qualityFilterChain(spark, sfDir)
      .filter(col("passes") === 1).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(out.keySet.subsetOf(passing), "curated docs must pass the quality gate")
    val splits = Pipeline.sampleSplit(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    out.foreach { case (id, s) => assert(splits(id) === s) }
    assert(out.nonEmpty && out.size < passing.size + 1)
  }

  test("keepersBy picks the best-scoring cluster member, ties to lowest id") {
    val nodes = (1L to 6L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a", "b")
    val labels = Cluster.connectedComponents(nodes, "id", edges, "a", "b")
    val scores = Seq((1L, 0.2), (2L, 0.9), (3L, 0.9), (4L, 0.5), (5L, 0.1),
      (6L, 0.0)).toDF("id", "q")
    val keepers = Cluster.keepersBy(labels, scores, "id", "q")
      .filter(col("is_keeper") === 1)
      .collect().map(r => r.getAs[Long]("cluster_id") -> r.getAs[Long]("id")).toMap
    assert(keepers === Map(1L -> 2L, 4L -> 4L, 6L -> 6L)) // 2 beats tie with 3
  }

  test("dedup clusters: keepers are cluster minima and cover all docs") {
    val rows = Pipeline.dedupClusters(spark, sfDir).collect()
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_.getAs[Long]("doc_id")).min === cid)
      assert(members.count(_.getAs[Int]("is_keeper") == 1) === 1)
    }
    val nDocs = graft.sources.Tables(spark, sfDir).documents.count()
    assert(rows.length.toLong === nDocs)
  }

  test("dedup_keep_best: same clusters as C17, keeper is the quality argmax") {
    val rows = Pipeline.dedupKeepBest(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("keeper_id"), r.getAs[Int]("is_keeper")))
    // cluster assignment is C17's, independent of the retention policy
    val c17 = Pipeline.dedupClusters(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(rows.nonEmpty && rows.forall { case (d, c, _, _) => c17(d) == c })
    // exactly one keeper per cluster; keeper_id is a member and is shared
    val byCluster = rows.groupBy(_._2)
    val quality = graft.operators.TextOps.textQuality(spark, sfDir)
      .select(col("doc_id"), col("quality_score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    byCluster.foreach { case (_, members) =>
      assert(members.count(_._4 == 1) === 1)
      val ks = members.map(_._3).distinct
      assert(ks.length === 1 && members.exists(_._1 == ks.head))
      // the keeper is the (quality desc, doc_id) argmax over the cluster
      val want = members.map(_._1).minBy(d => (-quality(d), d))
      assert(ks.head === want)
    }
    // the policy DIFFERS from min-id somewhere on the fixture (a cluster
    // whose best copy is not the smallest id), so the operator is not C17
    assert(rows.exists { case (_, c, k, _) => k != c })
  }

  test("prepare_pretrain: survivors are gated dedup keepers, layout tiles") {
    import org.apache.spark.sql.functions._
    val rows = Pipeline.preparePretrain(spark, sfDir).collect()
    val packed = rows.map(_.getAs[Long]("doc_id")).toSet
    // survivor set = quality-passing ∩ non-repetitive ∩ min-id per content
    val docs = graft.sources.Tables(spark, sfDir).documents
    val q = Pipeline.qualityFlagsOn(docs).filter(col("passes") === 1)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val rep = CorpusOps.textRepetitionOn(docs, "doc_id", "text")
      .filter(col("repetitive") === 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val byContent = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(d => q.contains(d._1) && rep.contains(d._1))
      .groupBy(_._2).map(_._2.map(_._1).min).toSet
    assert(packed === byContent)
    assert(packed.nonEmpty && packed.size < docs.count())
    // per-shard contiguity (the pack invariant) holds over the composition
    rows.groupBy(_.getAs[String]("shard")).foreach { case (s, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("start_off"))
      assert(sorted.head.getAs[Long]("start_off") === 0L, s"shard $s")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("end_off") === b.getAs[Long]("start_off"))
        case _ =>
      }
    }
  }

  test("mine_pairs: seeded partial-overlap variants surface as in-band pairs") {
    import org.apache.spark.sql.functions._
    val got = Pipeline.minePairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    assert(got.nonEmpty)
    got.foreach { case (a, p, j, split) =>
      assert(a < p)
      assert(j >= Pipeline.MinePairLo && j < Pipeline.MinePairHi)
      assert(Set("train", "val", "test").contains(split))
    }
    // the seeded (source, truncated-variant) pairs are the positives this
    // op exists to find: band candidacy at J≈0.6 catches nearly all
    val seeds = graft.sources.Tables(spark, sfDir).documents
      .filter(col("doc_id") % Pipeline.MinePairMod === 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val found = got.count { case (a, p, _, _) =>
      seeds.contains(a) && p == a + Pipeline.MinePairShift }
    assert(found >= seeds.size * 3 / 4, s"found $found of ${seeds.size}")
    // split is the anchor's C14 assignment — pairs never straddle splits
    val bySplit = Pipeline.sampleSplit(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    got.foreach { case (a, _, _, s) =>
      bySplit.get(a).foreach(exp => assert(s === exp))
    }
  }

  test("chunk_documents: geometry covers every token with the declared overlap") {
    val docs = graft.sources.Tables(spark, sfDir).documents
      .selectExpr("doc_id", "size(split(trim(text), '\\\\s+')) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val (w, s) = (Pipeline.ChunkWidth, Pipeline.ChunkStride)
    val chunks = Pipeline.chunkDocuments(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .groupBy(_._1)
    assert(chunks.keySet === docs.keySet.filter(docs(_) > 0))
    chunks.foreach { case (doc, cs) =>
      val n = docs(doc)
      val sorted = cs.sortBy(_._2)
      // expected chunk count: ceil(max(n-w,0)/s) + 1
      assert(sorted.length === (math.max(n - w, 0) + s - 1) / s + 1)
      sorted.zipWithIndex.foreach { case ((_, idx, start, len), i) =>
        assert(idx === i && start === i * s + 1)
        assert(len === math.min(w, n - i * s)) // last chunk may be short
      }
      // coverage: last chunk reaches the last token; overlap is w - s
      val last = sorted.last
      assert(last._3 + last._4 - 1 === n)
    }
  }

  test("quality_classifier: NB scores every doc; learns past the majority baseline (C78)") {
    val rows = Pipeline.qualityClassifier(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3),
        if (r.isNullAt(4)) None else Some(r.getInt(4))))
    // one scored row per document — scoring never drops the off-seed corpus
    val docs = graft.sources.Tables(spark, sfDir).documents.count()
    assert(rows.length === docs)
    // seed labels ride exactly on the seed rows, and are the C15 gate's
    // own pass bit (one spelling — recompute via qualityFlagsOn)
    val gate = Pipeline.qualityFlagsOn(
      graft.sources.Tables(spark, sfDir).documents)
      .select(col("doc_id"), col("passes")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { case (id, _, _, _, lbl) =>
      assert(lbl.isDefined === (id % Pipeline.NbSeedMod == 0), s"doc $id")
      lbl.foreach(l => assert(l === gate(id), s"doc $id label forked"))
    }
    // pred is the sign of the integer log-odds sum
    rows.foreach { case (id, _, lo, p, _) =>
      assert((lo >= 0) === (p == 1), s"doc $id pred/log_odds disagree")
    }
    // the classifier must LEARN the heuristic from token evidence alone:
    // seed agreement strictly above the majority-class baseline
    // (deterministic corpus — 152 vs 147 at this sf)
    val seed = rows.flatMap { case (_, _, _, p, l) => l.map(p -> _) }
    val agree = seed.count { case (p, l) => p == l }
    val maj = math.max(seed.count(_._2 == 1), seed.count(_._2 == 0))
    assert(agree > maj, s"agree=$agree not above majority=$maj")
  }

  test("dsir_select: Gumbel-top-k sample shifts toward the target distribution (C79)") {
    val docs = graft.sources.Tables(spark, sfDir).documents
    val sel = Pipeline.dsirSelect(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3),
        r.getInt(4)))
    // exactly k survivors, ranks contiguous from 1, ordered by (key desc, id)
    assert(sel.length === Pipeline.DsirK)
    assert(sel.map(_._5).toSeq === (1 to Pipeline.DsirK))
    sel.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 > b._4 || (a._4 == b._4 && a._1 < b._1),
        s"rank order broken at ${b._1}")
    }
    // deterministic: the "random" sample is a pure function of doc ids
    val again = Pipeline.dsirSelect(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(again.toSeq === sel.map(r => (r._1, r._4)).toSeq)
    // the model must SEPARATE target from raw: among seed docs, mean log
    // importance weight of gate-passing docs strictly above gate-failing
    val frame = Pipeline.nbFrameOf(docs, "doc_id", "text")
    val feats = Pipeline.dsirFeats(frame)
    val scores = Pipeline.dsirScores(Pipeline.dsirTrain(feats), feats)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val gate = Pipeline.qualityFlagsOn(docs)
      .select(col("doc_id"), col("passes")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val seedIds = gate.keys.filter(_ % Pipeline.NbSeedMod == 0).toSeq
    def mean(ids: Seq[Long]) = ids.map(scores(_).toDouble).sum / ids.size
    val (pass, fail) = seedIds.partition(gate(_) == 1)
    assert(pass.nonEmpty && fail.nonEmpty, "degenerate seed at this sf")
    assert(mean(pass) > mean(fail),
      s"no separation: pass=${mean(pass)} fail=${mean(fail)}")
    // and the SAMPLE must shift toward the target: selected docs' mean
    // log importance weight strictly above the corpus mean
    val all = scores.keys.toSeq
    assert(mean(sel.map(_._1).toSeq) > mean(all),
      s"selection did not shift: sel=${mean(sel.map(_._1).toSeq)} corpus=${mean(all)}")
  }

  test("quality_ensemble: three signals vote; each signal matches its own operator (C87)") {
    val rows = Pipeline.qualityEnsemble(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5)))
    val docs = graft.sources.Tables(spark, sfDir).documents
    assert(rows.length === docs.count())
    // vote arithmetic is internally consistent
    rows.foreach { case (id, g, nb, lm, s, v) =>
      assert(s === g + nb + lm, s"doc $id score")
      assert(v === (if (s >= 2) 1 else 0), s"doc $id verdict")
    }
    // every signal varies at this sf (a constant column would mean the
    // ensemble degenerates to a 2-of-2 vote)
    assert(rows.map(_._2).distinct.length === 2, "gate constant")
    assert(rows.map(_._3).distinct.length === 2, "nb constant")
    assert(rows.map(_._4).distinct.length === 2, "lm constant")
    // and the ensemble genuinely disagrees with each single signal
    // somewhere — the reason to vote at all
    assert(rows.exists(r => r._6 != r._2), "verdict == gate everywhere")
    assert(rows.exists(r => r._6 != r._3), "verdict == nb everywhere")
    // signal columns match the standalone operators (one spelling)
    val gate = Pipeline.qualityFlagsOn(docs)
      .select(col("doc_id"), col("passes")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { case (id, g, _, _, _, _) =>
      assert(g === gate(id), s"doc $id gate forked") }
  }

  test("uncertainty_sample: the k docs nearest the decision boundary (C90)") {
    val sel = Pipeline.uncertaintySample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getInt(5)))
    assert(sel.length === Pipeline.UncertaintyK)
    assert(sel.map(_._3).toSeq === (1 to Pipeline.UncertaintyK))
    // ranks are ordered by |log_odds| with doc_id tiebreak
    sel.sliding(2).foreach { case Array(a, b) =>
      assert(math.abs(a._2) < math.abs(b._2) ||
        (math.abs(a._2) == math.abs(b._2) && a._1 < b._1),
        s"order broken at ${b._1}")
    }
    // acquisition property: every selected doc is nearer the boundary
    // than every unselected doc (recompute all scores via C78 itself)
    val all = Pipeline.qualityClassifier(spark, sfDir).collect()
      .map(r => r.getLong(0) -> math.abs(r.getDouble(2))).toMap
    val selIds = sel.map(_._1).toSet
    val maxSel = sel.map(r => math.abs(r._2)).max
    val minUnsel = all.filterNot(kv => selIds.contains(kv._1)).values.min
    assert(maxSel <= minUnsel,
      s"a selected doc ($maxSel) is farther from the boundary than an unselected one ($minUnsel)")
  }

  test("leakage_safe_split (C112): near-dup pairs never straddle splits, " +
      "and the doc-level C14 split PROVABLY would") {
    val split = Pipeline.leakageSafeSplit(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(3)))).toMap
    // every doc assigned exactly once, clusters assign as one block
    split.groupBy(_._2._1).foreach { case (c, ms) =>
      assert(ms.values.map(_._2).toSet.size === 1,
        s"cluster $c straddles splits")
    }
    // the LEAKAGE property, asserted off the edge list independently of
    // the cluster construction: every near-dup pair co-assigns
    val pairs = TextOps.jaccardPairs(spark, sfDir)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "corpus must exercise the positive path")
    pairs.foreach { case (a, b) =>
      assert(split(a)._2 === split(b)._2,
        s"near-dup pair ($a, $b) split across ${split(a)._2}/${split(b)._2}")
    }
    // the key is load-bearing: C14's doc-level hash split DOES separate
    // at least one near-dup pair on this corpus — the contamination this
    // key exists to prevent
    val docSplit = Pipeline.sampleSplit(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(pairs.exists { case (a, b) => docSplit(a) != docSplit(b) },
      "corpus cannot demonstrate the doc-level leakage this key prevents")
    // proportions stay in C14's ballpark (cluster granularity coarsens
    // them, it must not collapse a split)
    val frac = split.values.groupBy(_._2).view.mapValues(
      _.size.toDouble / split.size).toMap
    assert(frac("train") > 0.6 && frac("val") > 0.02 && frac("test") > 0.02,
      s"split proportions degenerate: $frac")
  }
}
