package graft.operators

import graft.SparkSpec
import graft.functions.vectors._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

class VectorSpec extends SparkSpec {

  private def embDouble = graft.sources.Tables(spark, sfDir).embeddings
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  test("quantized_cosine matches an independent Scala computation") {
    val rows = embDouble.limit(4).collect()
    val a = rows(0).getSeq[Double](1).toArray
    val b = rows(1).getSeq[Double](1).toArray
    def q(v: Array[Double]) = v.map(x => math.floor(x * 1e6).toLong)
    val (qa, qb) = (q(a), q(b))
    val dot = qa.zip(qb).map { case (x, y) => x * y }.sum
    val expected = dot.toDouble / math.sqrt(qa.map(x => x * x).sum.toDouble) /
      math.sqrt(qb.map(x => x * x).sum.toDouble)
    val got = embDouble.limit(2).agg(collect_list(col("emb"))).collect()(0)
    // evaluate via the expression on a two-row cross join of the same rows
    val df = embDouble.filter(col("vec_id").isin(rows(0).getLong(0), rows(1).getLong(0)))
    val pair = df.as("x").crossJoin(df.as("y"))
      .filter(col("x.vec_id") < col("y.vec_id"))
      .select(quantized_cosine(col("x.emb"), col("y.emb")).as("s"))
      .collect()(0).getDouble(0)
    assert(pair === expected)
  }

  test("cosine_similarity of a vector with itself is ~1") {
    val s = embDouble.limit(5)
      .select(cosine_similarity(col("emb"), col("emb")).as("s"))
      .collect().map(_.getDouble(0))
    s.foreach(v => assert(math.abs(v - 1.0) < 1e-12))
  }

  test("vector expressions stay inside WholeStageCodegen") {
    val df = embDouble.select(quantized_cosine(col("emb"), col("emb")).as("s"))
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().startsWith("*("), plan)
  }

  test("ann_lsh_stats: per-table occupancy partitions the corpus and the " +
      "sum_sq probe-cost numerator replays from the raw buckets (C107)") {
    import graft.functions.vectors._
    val n = VectorOps.emb(spark, sfDir).count()
    val rows = VectorOps.annLshStats(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(rows.keySet === (0L until VectorOps.AnnTables).toSet)
    rows.foreach { case (t, (nb, nv, mx, sq)) =>
      assert(nv === n, s"table $t lost vectors: $nv != $n")
      assert(nb >= 1 && nb <= (1L << VectorOps.AnnBits), s"table $t: $nb")
      assert(mx <= nv && sq >= nv && sq <= mx * nv, s"table $t bounds")
    }
    // independent replay of one table's sizes from the kernel itself
    val t0sizes = VectorOps.emb(spark, sfDir)
      .select(explode(lsh_sign_buckets(col("emb"), VectorOps.AnnTables,
        VectorOps.AnnBits, VectorOps.Dim)).as("b"))
      .filter(col("b") < (1L << 24)) // table 0's key space
      .groupBy(col("b")).count().collect().map(_.getLong(1))
    assert(rows(0L) === ((t0sizes.length.toLong, t0sizes.sum,
      t0sizes.max, t0sizes.map(s => s * s).sum)))
  }

  test("ann_lsh_topk achieves reasonable recall vs brute force") {
    val exact = VectorOps.annBruteTopk(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = VectorOps.annLshTopk(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@10 = $recall")
  }

  test("ann_ivf_topk achieves reasonable recall vs brute force") {
    val exact = VectorOps.annBruteTopk(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = VectorOps.annIvfTopk(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // the synthetic corpus is near-uniform on the sphere — IVF's worst
    // case, since full top-10 neighbors have no cluster structure and the
    // probes cover 8/32 lists. The floor here is the worst-case smoke
    // check (k-means-lite centroids lifted it from ~0.3); the recall claim
    // that matters for dedup is the near-dup spec below.
    assert(recall >= 0.5, s"IVF recall@10 = $recall")
  }

  test("ann_graph_topk: recall vs brute force; edge/visited structure (C117)") {
    val exact = VectorOps.annBruteTopk(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = VectorOps.annGraphTopk(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // same worst-case floor as IVF: the synthetic corpus is near-uniform
    // on the sphere (no cluster structure for the graph to exploit);
    // measured 0.51 (sf0.001) / 0.54 (sf0.01) at beam 6 × 3 hops
    assert(recall >= 0.45, s"graph recall@10 = $recall")
    // build structure: out-degree <= M, no self-edges, every vertex posted
    val corpus = VectorOps.emb(spark, sfDir)
    val idx = Ann.graphBuild(corpus, "vec_id", "emb",
      m = VectorOps.GraphM, nLists = VectorOps.IvfLists)
    val deg = idx.edges.groupBy("src").count().agg(max("count")).head.getLong(0)
    assert(deg <= VectorOps.GraphM, s"out-degree $deg > ${VectorOps.GraphM}")
    assert(idx.edges.filter(col("src") === col("dst")).count() === 0)
    val nMed = idx.medoids.count()
    assert(nMed >= 1 && nMed <= VectorOps.IvfLists)
    // search visits stay bounded: entries + hops x beam x M per query
    val bound = VectorOps.GraphEntries +
      VectorOps.GraphHops * VectorOps.GraphBeam * VectorOps.GraphM
    val res = VectorOps.annGraphTopk(spark, sfDir)
    val perQ = res.groupBy("query_id").count().agg(max("count")).head.getLong(0)
    assert(perQ <= math.min(bound, VectorOps.TopK), s"per-query rows $perQ")
  }

  test("graph ANN finds near-duplicate neighbors with recall >= 0.9 (perturbed corpus)") {
    // the case the index exists for: a near-identical twin (cosine
    // ~0.99999) quantizes into the same coarse list, so it is reachable
    // from the medoid within the hop budget (dense intra-list edges)
    val corpus = VectorOps.dedupEmbCorpus(spark, sfDir)
    val queries = corpus.filter(col("vec_id") >= 1000000L)
    val idx = Ann.graphBuild(corpus, "vec_id", "emb",
      m = VectorOps.GraphM, nLists = VectorOps.IvfLists)
    val res = Ann.graphTopK(idx, corpus, queries, "vec_id", "emb", k = 10,
      beam = VectorOps.GraphBeam, hops = VectorOps.GraphHops,
      entries = VectorOps.GraphEntries)
    val found = res
      .filter(col("neighbor_id") === col("query_id") - 1000000L)
      .select("query_id").distinct().count()
    val recall = found.toDouble / queries.count()
    assert(recall >= 0.9, s"graph near-dup recall = $recall")
  }

  test("IVF finds near-duplicate neighbors with recall >= 0.9 (perturbed corpus)") {
    import org.apache.spark.sql.functions.col
    // the case IVF exists for: a query and its near-identical neighbor
    // (cosine ~0.99999) must quantize to the same list, so probing finds it
    val corpus = VectorOps.dedupEmbCorpus(spark, sfDir)
    val queries = corpus.filter(col("vec_id") >= 1000000L)
    val res = Ann.ivfTopK(corpus, queries, "vec_id", "emb", k = 10,
      nLists = VectorOps.IvfLists, nProbe = VectorOps.IvfProbes)
    val found = res
      .filter(col("neighbor_id") === col("query_id") - 1000000L)
      .select("query_id").distinct().count()
    val recall = found.toDouble / queries.count()
    assert(recall >= 0.9, s"IVF near-dup recall = $recall")
  }

  test("embed_stats covers every label with exact counts") {
    val rows = VectorOps.embedStats(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("n_vectors")).sum
    assert(total === graft.sources.Tables(spark, sfDir).embeddings.count())
    rows.foreach { r =>
      // unit-norm corpus: per-vector quantized norm ≈ 1, so the norm range
      // brackets 1 and the summed norm mass ≈ n (quantization undershoots)
      assert(r.getAs[Double]("min_norm") > 0.9 && r.getAs[Double]("max_norm") < 1.1)
      assert(r.getAs[Double]("centroid_norm2_q") > 0)
    }
  }

  test("embed_pca: BigInt replay agrees; pc1 dominates every axis; stable") {
    val rows = VectorOps.embedPca(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // independent replay: quantize → Gram → 12 fixed-point iterations →
    // projection, all in plain Scala BigInt
    val embs = graft.sources.Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val d = VectorOps.PcaDim
    val q = embs.view.mapValues(_.map(x =>
      math.floor(x * VectorOps.PcaQ).toLong)).toMap
    val g = Array.ofDim[Long](d * d)
    q.values.foreach { qv =>
      for (i <- 0 until d; j <- 0 until d) g(i * d + j) += qv(i) * qv(j)
    }
    var v = Array.fill(d)(BigInt(VectorOps.PcaVQ))
    for (_ <- 1 to VectorOps.PcaIters) {
      val u = Array.tabulate(d)(i =>
        (0 until d).map(j => BigInt(g(i * d + j)) * v(j)).sum)
      val m = u.map(_.abs).max.max(BigInt(1))
      v = u.map(x => x * VectorOps.PcaVQ / m)
    }
    rows.foreach { case (id, pq, p) =>
      val want = (0 until d).map(k => BigInt(q(id)(k)) * v(k)).sum
      assert(BigInt(pq) === want)
      assert(p === pq.toDouble / (VectorOps.PcaQ * VectorOps.PcaVQ).toDouble)
    }
    // the converged axis dominates: Rayleigh quotient of v beats every
    // coordinate axis (vᵀGv/vᵀv ≥ g_ii, up to fixed-point slack)
    val vd = v.map(_.toDouble)
    val num = (0 until d).map(i => vd(i) *
      (0 until d).map(j => g(i * d + j) * vd(j)).sum).sum
    val den = vd.map(x => x * x).sum
    val axisMax = (0 until d).map(i => g(i * d + i).toDouble).max
    assert(num / den >= axisMax * 0.99)
    // deterministic rebuild
    val again = VectorOps.embedPca(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq === again.toSeq)
  }

  test("ann_ivf_stats: lists partition the corpus; load factors are consistent") {
    val rows = VectorOps.annIvfStats(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val n = graft.sources.Tables(spark, sfDir).embeddings.count()
    // every vector lives in exactly one list; list ids are the k-means ids
    assert(rows.map(_._2).sum === n)
    assert(rows.length <= VectorOps.IvfLists && rows.nonEmpty)
    assert(rows.map(_._1).distinct.length === rows.length)
    // load factors average to 1 by construction and replay exactly
    rows.foreach { case (_, c, lf) =>
      assert(lf === c.toDouble * rows.length / n.toDouble)
    }
    // deterministic rebuild (the index is memoized + deterministic)
    val again = VectorOps.annIvfStats(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(again.toSeq === rows.toSeq)
  }

  test("persisted IVF index returns the same results as the direct operator") {
    val corpus = embDouble.select(col("vec_id"), col("emb"))
    val queries = corpus.limit(10)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf").toString + "/index"
    Ann.ivfBuild(corpus, "vec_id", "emb", nLists = 32, path = path)
    val direct = Ann.ivfTopK(corpus, queries, "vec_id", "emb",
      k = 10, nLists = 32, nProbe = 8).collect().map(_.toString).sorted
    val indexed = Ann.ivfTopKIndexed(spark, path, queries, "vec_id", "emb",
      k = 10, nProbe = 8).collect().map(_.toString).sorted
    assert(indexed.toSeq === direct.toSeq)
    // the probe scan must prune to the probed list_id partitions
    val scan = Ann.ivfTopKIndexed(spark, path, queries, "vec_id", "emb",
      k = 10, nProbe = 8).queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [list_id"), scan)
  }

  test("simhashBandBitsFor picks the widest recall-guaranteeing layout") {
    assert(Dedup.simhashBandBitsFor(6) === 8)  // 8 bands ≥ 7
    assert(Dedup.simhashBandBitsFor(3) === 16) // 4 bands ≥ 4
    assert(Dedup.simhashBandBitsFor(1) === 32) // 2 bands ≥ 2
    assert(Dedup.simhashBandBitsFor(15) === 4)
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(embDouble.withColumn("text", lit("x"))
        .withColumnRenamed("vec_id", "id"), "id", "text",
        bandBits = 16, maxHamming = 6)
    }
  }

  test("dedup_embedding finds exactly the seeded near-dup pairs") {
    val pairs = VectorOps.dedupEmbedding(spark, sfDir).collect()
    val n = embDouble.filter(col("vec_id") % 10 === 0).count()
    assert(pairs.length === n.toInt)
    pairs.foreach { r =>
      assert(r.getLong(1) === r.getLong(0) + 1000000L) // copy pairs with its base
      assert(r.getDouble(2) >= VectorOps.DedupThreshold)
    }
  }

  test("kmeans_clusters matches a plain-Scala Lloyd replay") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val vecs = graft.sources.Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Double](1).map(x => math.floor(x * 1e6).toLong).toArray)
      .toMap
    def dist(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assign(cents: Seq[(Long, Array[Long])]): Map[Long, (Long, Long)] =
      vecs.map { case (id, q) =>
        id -> cents.map { case (cid, cq) => (dist(q, cq), cid) }.min
      }
    var cents: Seq[(Long, Array[Long])] = vecs.keys.toSeq
      .sortBy(id => (md5hex(id.toString), id)).take(VectorOps.KmeansK)
      .sorted.map(id => id -> vecs(id))
    for (_ <- 1 to VectorOps.KmeansRounds) {
      val members = assign(cents).toSeq.groupBy(_._2._2)
      cents = members.map { case (cid, ms) =>
        val qs = ms.map(m => vecs(m._1))
        cid -> Array.tabulate(qs.head.length)(d =>
          math.floor(qs.map(_(d)).sum.toDouble / qs.size).toLong)
      }.toSeq.sortBy(_._1)
    }
    val expected = assign(cents)
    val got = VectorOps.kmeansClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(1)))).toMap
    assert(got === expected)
    // a real clustering: more than one cluster survives, distances bounded
    assert(got.values.map(_._2).toSet.size > 1)
  }

  test("embedding_quantize: codes replay in the JVM; error within one step") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS emb").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    val got = VectorOps.embeddingQuantize(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3), r.getDouble(4))))
      .toMap
    embs.foreach { case (id, v) =>
      val (vmin, vmax) = (v.min, v.max)
      val rng = vmax - vmin
      val codes = v.map(x => if (rng == 0) 0
        else math.min(255, math.floor((x - vmin) * 255 / rng).toInt))
      val wsum = codes.zipWithIndex.map { case (c, i) => c.toLong * (i + 1) }.sum
      val maxErr = v.zip(codes)
        .map { case (x, c) => math.abs(x - (vmin + c.toDouble * rng / 255)) }.max
      val (gMin, gMax, gSum, gErr) = got(id)
      assert(gMin === vmin && gMax === vmax && gSum === wsum && gErr === maxErr)
      // the contract an ANN consumer budgets against: one quantization step
      assert(gErr <= rng / 255 + 1e-12, s"vec $id err $gErr step ${rng / 255}")
    }
  }

  test("ann_pq_topk achieves reasonable recall vs brute force and is deterministic") {
    val exact = VectorOps.annBruteTopk(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val run1 = VectorOps.annPqTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val approx = run1.map(t => (t._1, t._2)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.75, s"PQ recall@10 = $recall")
    // deterministic codebooks + quantized ties: rerun is bit-identical
    val run2 = VectorOps.annPqTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(run1.toSeq === run2.toSeq)
  }

  test("ann_ivfpq_topk: recall vs brute force, bit-identical rebuild, pruned scan") {
    val exact = VectorOps.annBruteTopk(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val run1 = VectorOps.annIvfPqTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val approx = run1.map(t => (t._1, t._2)).toSet
    // IVF routing costs recall vs flat PQ (a probe can miss a true
    // neighbor's list); the residual codes claw most of it back
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF-PQ recall@10 = $recall")
    // repeat driver call (memoized index this JVM) is identical
    val run2 = VectorOps.annIvfPqTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(run1.toSeq === run2.toSeq)
    // two INDEPENDENT builds into different dirs probe bit-identically
    // (rebuild determinism, not memoization), and the probe scan prunes
    // to the probed list_id partitions
    val corpus = embDouble.select(col("vec_id"), col("emb"))
    def buildAndProbe(): (Seq[String], String) = {
      val path = java.nio.file.Files
        .createTempDirectory("graft_ivfpq_spec").toString + "/index"
      Ann.ivfPqBuild(corpus, "vec_id", "emb", VectorOps.Dim,
        nLists = 32, path = path)
      val probe = Ann.ivfPqTopK(spark, path, corpus.limit(10), "vec_id",
        "emb", VectorOps.Dim, k = 10, nProbe = 8)
      (probe.collect().map(_.toString).toSeq,
        probe.queryExecution.executedPlan.toString)
    }
    val (a, planA) = buildAndProbe()
    val (b, _) = buildAndProbe()
    assert(a.nonEmpty && a === b)
    assert(planA.contains("PartitionFilters: [list_id"), planA)
  }

  test("ann_ivfpq_refine: recall >= plain C50 with 3.3x fewer exact fetches") {
    val exact = VectorOps.annBruteTopk(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(rows: Array[(Long, Long)]): Double =
      (exact & rows.toSet).size.toDouble / exact.size
    val plain = recallOf(VectorOps.annIvfPqTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))))
    val run1 = VectorOps.annIvfPqRefineTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val refined = recallOf(run1.map(t => (t._1, t._2)))
    // the ADC+R re-rank must not give back what the 3.3x smaller
    // survivor margin saves: same-or-better recall than rerank×k=100
    assert(refined >= plain, s"refine recall $refined < plain $plain")
    // deterministic replay (memoized index, quantized integer proxy)
    val run2 = VectorOps.annIvfPqRefineTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(run1.toSeq === run2.toSeq)
    // the fetch budget itself: stage 2 hands the exact stage EXACTLY
    // refine×k survivors per query — 30 ids vs ivfPqTopK's 100
    val corpus = embDouble.select(col("vec_id"), col("emb"))
    val path = graft.sources.IndexScratch.path(VectorOps.IvfPqIndexKind, sfDir)
    val queries = corpus.filter(col("vec_id") % 50 === 0)
    val st = Ann.ivfPqRefineStage(spark, path, queries, "vec_id", "emb",
      VectorOps.Dim, VectorOps.TopK, VectorOps.IvfProbes, rerank = 10,
      refine = 3)
    val perQuery = st.survivors.groupBy(col("query_id")).count()
      .select("count").collect().map(_.getLong(0))
    val nQueries = queries.count()
    assert(perQuery.length.toLong === nQueries)
    assert(perQuery.forall(_ === 3L * VectorOps.TopK),
      s"survivor counts ${perQuery.distinct.toSeq} != ${3 * VectorOps.TopK}")
  }

  test("semantic_dedup drops exactly the seeded copies, keeping originals") {
    val rows = VectorOps.semanticDedup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, dupOf, score) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      // only the seeded perturbed copies are dropped — the natural corpus
      // has no τ-similar pairs, so precision here is exact
      assert(id >= 1000000L, s"original $id wrongly dropped")
      // the keeper of each copy is its own original (smallest-id policy)
      assert(dupOf === id - 1000000L)
      assert(score >= VectorOps.DedupThreshold)
    }
    // every seeded copy is found: the cluster+LSH candidate composition has
    // full recall on the τ-pairs (originals and copies co-cluster)
    val expected = embDouble.filter(col("vec_id") % 10 === 0).count()
    assert(rows.length.toLong === expected)
  }

  test("diverse_topk: independent JVM replay of the MMR walk agrees") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def qz(v: Seq[Double]) = v.map(x => math.floor(x * 1e6).toLong).toArray
    def qcos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot.toDouble / math.sqrt(a.map(x => x * x).sum.toDouble) /
        math.sqrt(b.map(x => x * x).sum.toDouble)
    }
    val vecs = embDouble.collect()
      .map(r => r.getLong(0) -> qz(r.getSeq[Double](1))).toMap
    val q0 = vecs.keys.toSeq.sortBy(id => (md5hex(id.toString), id)).head
    val pool = vecs.toSeq.map { case (id, v) => (id, qcos(v, vecs(q0))) }
      .sortBy { case (id, rel) => (-rel, id) }.take(VectorOps.MmrPoolSize)
    def sim(a: Long, b: Long) = qcos(vecs(a), vecs(b))
    val chosen = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double)]
    for (rank <- 1 to VectorOps.MmrK) {
      val picked = chosen.map(_._2).toSet
      val best = pool.iterator.filterNot(p => picked(p._1)).map { case (id, rel) =>
        val ms = if (picked.isEmpty) 0.0 else picked.iterator.map(sim(id, _)).max
        (id, rel, rel - VectorOps.MmrLambda * ms)
      }.reduceLeft((x, y) =>
        if (y._3 > x._3 || (y._3 == x._3 && y._1 < x._1)) y else x)
      chosen += ((rank, best._1, best._2, best._3))
    }
    val got = VectorOps.diverseTopk(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq === chosen.toSeq)
    // the selection actually diversifies: it differs from pure top-k
    assert(got.map(_._2).toSet !== pool.take(VectorOps.MmrK).map(_._1).toSet)
  }

  test("nearestCentroid: small-k and large-k forms agree, ties to lower cid") {
    // k = 20 (> the 16-centroid dispatch threshold) with cid-sorted
    // centroids, including an exact DUPLICATE pair (cids 18 and 19) so the
    // tie-break is exercised: both forms must pick the LOWER cid.
    val sample = embDouble.orderBy(col("vec_id")).limit(19).collect()
      .map(_.getSeq[Double](1).map(x => math.floor(x * 1e6).toLong).toArray)
    val cents: Seq[(Long, Array[Long])] =
      sample.zipWithIndex.map { case (q, i) => (i.toLong, q) }.toSeq :+
        (19L, sample.last) // duplicate of cid 18 under a higher cid
    val both = embDouble
      .select(col("vec_id"),
        VectorOps.nearestCentroidSmall(cents).as("s"),
        VectorOps.nearestCentroidLarge(cents).as("l"))
      .collect()
    both.foreach { r =>
      val (s, l) = (r.getStruct(1), r.getStruct(2))
      assert(s.getLong(0) == l.getLong(0) && s.getLong(1) == l.getLong(1),
        s"vec ${r.getLong(0)}: small=(${s.getLong(0)},${s.getLong(1)}) " +
          s"large=(${l.getLong(0)},${l.getLong(1)})")
    }
    // at least one vector is nearest the duplicated centroid, and it
    // resolved to the lower of the two identical cids
    val dupHits = both.filter(_.getStruct(1).getLong(0) == 0L)
    assert(dupHits.nonEmpty, "the duplicated centroid's own vector must hit it")
    assert(both.forall(_.getStruct(1).getLong(1) != 19L),
      "ties on the duplicated centroid must resolve to the lower cid (18)")
  }

  test("diverse_topk_multi: per-query MMR invariants hold") {
    val rows = VectorOps.diverseTopkMulti(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.size === VectorOps.MmrMultiQ)
    byQ.foreach { case (qid, sel) =>
      // exactly k distinct picks per query, ranks 1..k
      assert(sel.map(_._2).sorted.toSeq === (1 to VectorOps.MmrK).toSeq)
      assert(sel.map(_._3).distinct.length === sel.length)
      // rank 1 is pure relevance (nothing selected yet): mmr == rel, and
      // the anchor's own vector (rel = 1) is the first pick
      val first = sel.find(_._2 == 1).get
      assert(first._4 === first._5)
      assert(first._3 === qid, s"rank-1 pick ${first._3} is not anchor $qid")
      // the diversity penalty only ever subtracts
      sel.foreach { s => assert(s._5 <= s._4 + 1e-12) }
    }
    // different anchors select different-leading pools: not all queries
    // pick the identical set (the corpus is not degenerate)
    assert(byQ.values.map(_.map(_._3).toSet).toSet.size > 1)
  }

  test("hybrid_search: RRF fusion invariants hold") {
    val rows = VectorOps.hybridSearch(spark, sfDir).collect().map { r =>
      (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        if (r.isNullAt(3)) None else Some(r.getInt(3)),
        r.getDouble(4), r.getInt(5))
    }
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet === CorpusOps.Bm25Queries.map(_._1).toSet)
    byQ.foreach { case (q, sel) =>
      // contiguous ranks from 1, capped at k, no duplicate docs
      assert(sel.map(_._6).sorted.toSeq === (1 to sel.length).toSeq)
      assert(sel.length <= VectorOps.HybridK)
      assert(sel.map(_._2).distinct.length === sel.length)
      // each row came from at least one ranker, and BOTH rankers
      // contribute to the fused board
      sel.foreach { s => assert(s._3.isDefined || s._4.isDefined) }
      assert(sel.exists(_._3.isDefined), s"$q: no lexical contribution")
      assert(sel.exists(_._4.isDefined), s"$q: no semantic contribution")
      // the RRF score is exactly the two-term reciprocal sum of the ranks
      sel.foreach { case (_, _, lex, sem, score, _) =>
        val expect = lex.map(r => 1.0 / (VectorOps.RrfK + r)).getOrElse(0.0) +
          sem.map(r => 1.0 / (VectorOps.RrfK + r)).getOrElse(0.0)
        assert(score === expect)
      }
      // board is ordered by (score desc, doc_id) — the rank is real
      val resorted = sel.sortBy(s => (-s._5, s._2)).map(_._2).toSeq
      assert(sel.sortBy(_._6).map(_._2).toSeq === resorted)
    }
  }

  test("hybrid_search_probe: fusion recall >= 0.9 of the brute hybrid") {
    def topk(rows: Array[Row]) = rows
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, s) => q -> s.map(_._2).toSet }
    val brute = topk(VectorOps.hybridSearch(spark, sfDir).collect())
    val probed = topk(VectorOps.hybridSearchProbe(spark, sfDir).collect())
    assert(probed.keySet === brute.keySet)
    // per-query fused-board recall at the pinned probe budget (IvfProbes
    // of IvfLists cells): the probed semantic ranker may miss a candidate
    // a full scan finds, but the FUSION must retain >= 0.9 of the brute
    // hybrid's top-k — the C7/C50 recall discipline applied to C70b
    val recalls = brute.map { case (q, exact) =>
      (probed(q) & exact).size.toDouble / exact.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean fused recall = $mean (${recalls.toSeq.sorted})")
    // determinism: a second probe of the same persisted index is identical
    val again = topk(VectorOps.hybridSearchProbe(spark, sfDir).collect())
    assert(again === probed)
  }

  test("lsh buckets are deterministic across evaluations") {
    val a = embDouble.select(lsh_sign_buckets(col("emb"), 4, 8, 64).as("b")).collect()
    val b = embDouble.select(lsh_sign_buckets(col("emb"), 4, 8, 64).as("b")).collect()
    assert(a.map(_.getSeq[Long](0)).toSeq === b.map(_.getSeq[Long](0)).toSeq)
  }

  test("cluster_sample: deterministic, assignment-consistent, and the " +
      "smallest cluster keeps a larger share than the largest (C93)") {
    import graft.operators.VectorOps
    val a = VectorOps.clusterSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = VectorOps.clusterSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.nonEmpty && a.toSeq === b.toSeq)
    // every sampled doc carries its k-means cluster, not a forked one
    val assign = VectorOps.kmeansClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    a.foreach { case (id, cl, _) => assert(assign(id) === cl, s"doc $id") }
    // the diversity property: equal token share per cluster means the
    // SMALLEST cluster's sampled token fraction is at least the
    // LARGEST's (parity capped at 1 via the 65536 threshold clamp)
    val docs = graft.sources.Tables(spark, sfDir).documents
      .select(col("doc_id"),
        size(graft.operators.TextOps.tokens(col("text"))).cast("bigint")
          .as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mass = assign.toSeq.filter(kv => docs.contains(kv._1))
      .groupBy(_._2).map { case (cl, xs) => cl -> xs.map(x => docs(x._1)).sum }
    val sampled = a.groupBy(_._2).map { case (cl, xs) => cl -> xs.map(_._3).sum }
    val big = mass.maxBy(_._2)._1
    val small = mass.minBy(_._2)._1
    def frac(cl: Long) = sampled.getOrElse(cl, 0L).toDouble / mass(cl)
    assert(frac(small) >= frac(big),
      s"small-cluster share ${frac(small)} < large-cluster share ${frac(big)}")
  }
}
