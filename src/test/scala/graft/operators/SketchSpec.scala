package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {

  private lazy val trueJaccard = TextOps.dedupNgramJaccard(spark, sfDir)
    .select("doc_a", "doc_b", "jaccard").collect()
    .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("minhash-LSH recovers the high-Jaccard pairs") {
    val found = Sketch.dedupMinhashLsh(spark, sfDir)
      .select("doc_a", "doc_b", "est_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val strong = trueJaccard.filter(_._2 >= 0.6).keySet
    val missed = strong -- found.keySet
    assert(missed.isEmpty, s"LSH missed strong pairs: $missed")
  }

  test("minhash estimate tracks true Jaccard within 0.25") {
    val found = Sketch.dedupMinhashLsh(spark, sfDir)
      .select("doc_a", "doc_b", "est_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    found.foreach { case (pair, est) =>
      trueJaccard.get(pair).foreach { truth =>
        assert(math.abs(est - truth) < 0.25, s"$pair est=$est true=$truth")
      }
    }
  }

  test("simhash: recall is exact within the hamming radius") {
    val pairs = Sketch.dedupSimhash(spark, sfDir).collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(r.getInt(2) <= Sketch.MaxHamming))
    // 8×8-bit banding guarantees recall for hamming <= 7 > MaxHamming, so
    // EVERY in-radius pair among the true near-dups must be found.
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val fps = Sketch.simhashes(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inRadius = trueJaccard.keySet.filter { case (a, b) =>
      java.lang.Long.bitCount(fps(a) ^ fps(b)) <= Sketch.MaxHamming
    }
    assert(inRadius.nonEmpty, "expected some near-dup pairs inside the radius")
    assert((inRadius -- found).isEmpty,
      s"simhash missed in-radius pairs: ${inRadius -- found}")
  }

  test("near_dup_eval: confusion counts reconcile with the two pair sets") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables(spark, sfDir).documents
    val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = TextOps.JaccardThreshold)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val det = Dedup.minhashLshPairs(docs, "doc_id", "text",
        minEstJaccard = Sketch.MinEstJaccard)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val r = Sketch.nearDupEval(spark, sfDir).head()
    val (tp, fp, fn) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(tp === (det intersect truth).size.toLong)
    assert(fp === (det diff truth).size.toLong)
    assert(fn === (truth diff det).size.toLong)
    assert(tp > 0)
    assert(r.getDouble(3) === tp.toDouble / (tp + fp))
    assert(r.getDouble(4) === tp.toDouble / (tp + fn))
  }

  test("dedup_index_probe: seeded copies found at est 1.0; sides typed; index persists") {
    val rows = Sketch.dedupIndexProbe(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // sides: batch ids on the left (shifted), history on the right
    rows.foreach { case (b, h, est) =>
      assert(b >= 200000000L && h < 200000000L)
      assert(est >= Sketch.MinEstJaccard && est <= 1.0)
    }
    // every EXACT seeded copy (doc_id % 11, shifted +2e8) pairs with its
    // source at estimated Jaccard exactly 1.0 (identical signatures)
    val exactSeeds = graft.sources.Tables(spark, sfDir).documents
      .filter(col("doc_id") % 11 === 0).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val got = rows.map(p => (p._1, p._2)).toSet
    exactSeeds.foreach { src =>
      assert(got.contains((src + 200000000L, src)), s"missing exact copy of $src")
    }
    rows.filter { case (b, h, _) => b - 200000000L == h }
      .foreach { case (_, _, est) => assert(est === 1.0) }
    // the index is a real persisted artifact (at the IndexScratch-derived
    // path — the pre-r5 hashCode spelling only passed on stale tmpdirs)
    val path = graft.sources.IndexScratch.path("dedupidx", sfDir)
    assert(new java.io.File(s"$path/bands").exists())
    // probing again (memoized index) is identical
    val again = Sketch.dedupIndexProbe(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(again.toSeq === rows.toSeq)
  }

  test("simhash_index_probe equals the direct cross operator; index persists") {
    import graft.operators.CorpusOps.{BenchmarkMod, ContaminatedShift}
    val rows = Sketch.simhashIndexProbe(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (b, h, ham) =>
      assert(b >= ContaminatedShift && h < ContaminatedShift)
      assert(ham >= 0 && ham <= Sketch.MaxHamming)
    }
    // the persisted probe equals the direct (non-persisted) cross operator
    val docs = graft.sources.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text"))
    val batch = docs.filter(col("doc_id") % BenchmarkMod === 0)
      .select((col("doc_id") + ContaminatedShift).as("doc_id"),
        concat(col("text"), lit(" leaked")).as("text"))
    val direct = graft.operators.Dedup.simhashPairsAcross(docs, batch,
        "doc_id", "text", bandBits = Sketch.SimhashBandBits,
        maxHamming = Sketch.MaxHamming)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getInt(2))).toSet
    assert(rows.toSet === direct)
    // persisted artifact exists; memoized rerun identical
    val path = graft.sources.IndexScratch.path("shidx", sfDir)
    assert(new java.io.File(s"$path/bands").exists())
    val again = Sketch.simhashIndexProbe(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(again.toSeq === rows.toSeq)
  }

  test("minhash signature is deterministic and 64 wide") {
    val d = graft.sources.Tables(spark, sfDir).documents.limit(3)
      .select(col("doc_id"), TextOps.shingles(col("text")).as("sh"))
    val a = d.select(Sketch.minhashSig(col("sh"))).collect().map(_.getSeq[Long](0))
    val b = d.select(Sketch.minhashSig(col("sh"))).collect().map(_.getSeq[Long](0))
    assert(a.map(_.length).forall(_ == Sketch.NumHashes))
    assert(a.toSeq === b.toSeq)
  }

  test("dedup_compare: no single family covers all three duplication modes (C88)") {
    val rows = Sketch.dedupCompare(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq ===
      Seq("exact", "minhash_lsh", "ngram_jaccard", "norm", "simhash"))
    // one corpus: every family saw the same document count
    val n = Sketch.dedupBoardCorpus(spark, sfDir).count()
    rows.foreach { case (f, nd, nr, rate) =>
      assert(nd === n, s"$f corpus size")
      assert(math.abs(rate - nr.toDouble / n) < 1e-12, s"$f rate")
      assert(nr > 0, s"$f found nothing — a seeded mode is broken")
    }
    val by = rows.map(r => r._1 -> r._3).toMap
    // byte copies: exact catches at least every seeded %7 copy
    val seeded = graft.sources.Tables(spark, sfDir).documents
      .filter(col("doc_id") % 7 === 0).count()
    assert(by("exact") >= seeded)
    // the board's strategy argument, as strict orderings:
    // norm strictly adds the case variants exact cannot see...
    assert(by("norm") > by("exact"), "norm found no case variants")
    // ...and the sketch families strictly add near-dups exact cannot see
    assert(by("minhash_lsh") > by("exact"), "minhash found no near-dups")
    assert(by("ngram_jaccard") > by("exact"))
    assert(by("simhash") > by("exact"))
  }

  test("C88b sampled board: the sampled C4 census IS the full census " +
      "restricted to the slice (sampling = predicate, not approximation)") {
    val c = Sketch.dedupBoardCorpus(spark, sfDir)
    val den = Sketch.NgramSampleDenom
    // the sampleDenomB plan must equal filtering the FULL pair list on the
    // larger member — same pairs, exactly (the slice doc still sees every
    // partner, so its removal verdict is exact, not estimated)
    val sampled = Dedup.ngramJaccardPairs(c, "doc_id", "text", n = 3,
        threshold = TextOps.JaccardThreshold, sampleDenomB = Some(den))
      .select(col("id_a"), col("id_b")).collect().map(_.toString).toSet
    val filtered = Dedup.ngramJaccardPairs(c, "doc_id", "text", n = 3,
        threshold = TextOps.JaccardThreshold)
      .filter(col("id_b") % den === 0)
      .select(col("id_a"), col("id_b")).collect().map(_.toString).toSet
    assert(sampled.nonEmpty && sampled === filtered)
    // board shape: the four linear families report the full corpus, the
    // sampled C4 row reports the slice's own denominator
    val rows = Sketch.dedupCompareSampled(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val n = c.count()
    val nSlice = c.filter(col("doc_id") % den === 0).count()
    rows.foreach { case (f, nd, nr, rate) =>
      assert(nd === (if (f == "ngram_jaccard") nSlice else n), s"$f n_docs")
      assert(math.abs(rate - nr.toDouble / nd) < 1e-12, s"$f rate")
    }
    // the sampled census still sees seeded near-dups (the slice is not
    // degenerate) and its rate lands NEAR the exact rate — loose 3× band:
    // the point is unbiasedness of the mechanism, pinned exactly above
    val exactRate = Sketch.dedupCompare(spark, sfDir).collect()
      .find(_.getString(0) == "ngram_jaccard").get.getDouble(3)
    val sampledRate = rows.find(_._1 == "ngram_jaccard").get._4
    assert(sampledRate > 0)
    assert(sampledRate < 3 * exactRate && exactRate < 3 * sampledRate,
      s"sampled $sampledRate vs exact $exactRate")
  }

  /** Classic full-DP Levenshtein — the spec's independent reference for
    * the banded production kernel. */
  private def refLevenshtein(a: String, b: String): Int = {
    val prev = Array.tabulate(b.length + 1)(identity)
    val cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1),
          prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(b.length)
  }

  test("dedup_edit_distance: banded verify is exact within the band, " +
      "rejects past it, and respects the length guard (C97)") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    // near pair: 1 substitution inside one token (distance 1)
    val near = base.replace("tok30", "tok3x")
    // candidate-but-far: every 3rd token perturbed — shingle overlap
    // stays band-detectable, edit distance blows past the band
    val far = (1 to 60).map(i =>
      if (i % 3 == 0) s"tokX$i" else s"tok$i").mkString(" ")
    // candidate with a 40-char suffix: length guard must reject before
    // the DP ever runs
    val long = base + " " + ("z" * 38)
    val docs = Seq(1L -> base, 2L -> near, 3L -> far, 4L -> long)
      .toDF("doc_id", "text")
    val got = Sketch.editDistancePairsOn(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.contains((1L, 2L)), "missed the seeded near pair")
    assert(got((1L, 2L)) === refLevenshtein(base, near).toLong)
    assert(!got.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      "a past-band pair survived the banded verify")
    assert(!got.keySet.exists(p => p._1 == 4L || p._2 == 4L),
      "a pair past the length guard survived")
    // canonical orientation
    got.keySet.foreach { case (a, b) => assert(a < b) }
    // sanity: the far docs ARE proposed by the bands (the REJECTION is
    // the verify's doing, not a recall accident)
    val cands = graft.operators.Dedup.minhashLshPairs(docs, "doc_id",
      "text", shingleN = 3, numHashes = Sketch.NumHashes,
      bands = Sketch.Bands, minEstJaccard = Sketch.MinEstJaccard)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 3L)) || cands.contains((1L, 4L)),
      "seeded far/long docs never became candidates — test is vacuous")

    // real corpus: every emitted distance equals the reference DP
    val real = Sketch.dedupEditDistance(spark, sfDir).collect()
    assert(real.nonEmpty)
    val txt = graft.sources.Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    real.foreach { r =>
      val d = refLevenshtein(txt(r.getLong(0)), txt(r.getLong(1)))
      assert(r.getLong(2) === d.toLong && d <= Sketch.MaxEditDist)
    }
  }
}
