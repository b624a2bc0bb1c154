package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("media table: binary payload with typed metadata columns") {
    val m = Multimodal.mediaTable(spark, sfDir)
    assert(m.schema("media").dataType === org.apache.spark.sql.types.BinaryType)
    val r = m.limit(3).collect()
    r.foreach { row =>
      val bytes = row.getAs[Array[Byte]]("media")
      assert(new String(bytes.take(4), "UTF-8") === Multimodal.Magic)
    }
  }

  test("decode recovers header metadata exactly") {
    val media = Multimodal.mediaTable(spark, sfDir)
      .select("media_id", "fmt", "meta_width", "meta_height")
      .orderBy("media_id").limit(20).collect()
    val decoded = Multimodal.multimodalMeta(spark, sfDir)
      .orderBy("media_id").limit(20).collect()
    media.zip(decoded).foreach { case (m, d) =>
      assert(m.getLong(0) === d.getLong(0))
      assert(m.getString(1) === d.getString(1))
      assert(m.getInt(2) === d.getInt(2))
      assert(m.getInt(3) === d.getInt(3))
    }
  }

  test("decode is deterministic and emits bounded features") {
    val a = Multimodal.multimodalMeta(spark, sfDir).collect()
    val b = Multimodal.multimodalMeta(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    a.take(50).foreach { r =>
      (0 until 4).foreach { k =>
        val f = r.getDouble(r.fieldIndex(s"feat$k"))
        assert(f >= 0.0 && f < 1.0)
      }
    }
  }

  test("metadata predicates prune BEFORE the decode stage") {
    val ds = Multimodal.decodeFiltered(spark, sfDir, "img", maxWidth = 200)
    val expected = Multimodal.mediaTable(spark, sfDir)
      .filter(col("fmt") === "img" && col("meta_width") <= 200).count()
    assert(ds.count() === expected && expected > 0)
    // plan order (root first): the mapPartitions must sit ABOVE the filter,
    // i.e. only filtered rows reach the decode
    val plan = ds.queryExecution.executedPlan.toString
    val mp = plan.indexOf("MapPartitions")
    val fl = plan.indexOf("Filter")
    assert(mp >= 0 && fl > mp, plan)
  }

  test("frame sampling: stride layout and fingerprints replay from the bytes") {
    val got = Multimodal.multimodalFrames(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(got.nonEmpty)
    // only videos, only every stride-th frame, idx within bounds
    got.foreach { case (id, n, idx, _) =>
      assert(id % 3 === 2)
      assert(idx % Multimodal.FrameStride === 0 && idx < n)
    }
    // fingerprints replay from the raw text bytes
    val texts = graft.sources.Tables(spark, sfDir).documents
      .filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val md5 = java.security.MessageDigest.getInstance("MD5")
    got.foreach { case (id, n, idx, h) =>
      val body = texts(id).getBytes("UTF-8")
      assert(n === body.length / Multimodal.FrameBytes)
      val fb = java.util.Arrays.copyOfRange(body,
        idx * Multimodal.FrameBytes, (idx + 1) * Multimodal.FrameBytes)
      val d = md5.digest(fb)
      val expected = (0 until 6).foldLeft(0L)((a, i) => (a << 8) | (d(i) & 0xffL))
      assert(h === expected, s"frame ($id, $idx)")
    }
    // every video with >= 1 full frame contributes its sampled frames
    val byId = got.groupBy(_._1)
    texts.foreach { case (id, t) =>
      val n = t.getBytes("UTF-8").length / Multimodal.FrameBytes
      val expFrames = (0 until n).count(_ % Multimodal.FrameStride == 0)
      assert(byId.get(id).map(_.length).getOrElse(0) === expFrames, s"media $id")
    }
  }

  test("perceptual near-dup: exact JVM replay + pigeonhole recall (C74)") {
    val got = Multimodal.multimodalDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    assert(got.nonEmpty)
    got.foreach { case (a, b, h) =>
      assert(a < b); assert(h >= 0 && h <= Multimodal.PhashMaxHamming)
    }
    // replay every pHash from the raw text bytes (the media body)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val phashes = graft.sources.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        val body = r.getString(1).getBytes("UTF-8")
        val n = body.length / Multimodal.FrameBytes
        if (n < 1) None else {
          val acc = new Array[Int](64)
          (0 until n).foreach { j =>
            val d = md5.digest(java.util.Arrays.copyOfRange(body,
              j * Multimodal.FrameBytes, (j + 1) * Multimodal.FrameBytes))
            val h = (0 until 8).foldLeft(0L)((a, i) => (a << 8) | (d(i) & 0xffL))
            (0 until 64).foreach(b =>
              acc(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1))
          }
          val fp = (0 until 64).foldLeft(0L)((f, b) =>
            if (acc(b) > 0) f | (1L << b) else f)
          Some(r.getLong(0) -> fp)
        }
      }.sortBy(_._1)
    // pigeonhole recall is EXACT: the banded join must emit precisely the
    // pairs within the hamming radius — no more (verify filter), no fewer
    // (hamming <= MaxHamming < bands leaves >= 1 band untouched)
    val expected = (for {
      i <- phashes.indices.iterator
      j <- (i + 1) until phashes.length
      h = java.lang.Long.bitCount(phashes(i)._2 ^ phashes(j)._2)
      if h <= Multimodal.PhashMaxHamming
    } yield (phashes(i)._1, phashes(j)._1, h)).toSet
    assert(got === expected)
  }

  test("persisted pHash index probe surfaces leaked media (C72)") {
    import graft.operators.CorpusOps.{BenchmarkMod, ContaminatedShift}
    val got = Multimodal.multimodalIndexProbe(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got.nonEmpty)
    got.foreach { case (b, h, ham) =>
      assert(b >= ContaminatedShift && h < ContaminatedShift)
      assert(ham >= 0 && ham <= Multimodal.PhashMaxHamming)
    }
    // pigeonhole-exact replay: probe == ALL cross pairs within the radius,
    // computed from the same decode-stage fingerprints
    def ph(df: org.apache.spark.sql.DataFrame) =
      Multimodal.phashOn(df).select("media_id", "phash").collect()
        .map(r => r.getLong(0) -> r.getLong(1))
    val hist = ph(Multimodal.mediaTable(spark, sfDir))
    val docs = graft.sources.Tables(spark, sfDir).documents
    val batch = ph(Multimodal.mediaTableOf(
      docs.filter(col("doc_id") % BenchmarkMod === 0)
        .select((col("doc_id") + ContaminatedShift).as("doc_id"),
          concat(col("text"), lit(" leaked")).as("text"))))
    val expected = (for {
      (bid, bfp) <- batch.iterator
      (hid, hfp) <- hist.iterator
      ham = java.lang.Long.bitCount(bfp ^ hfp)
      if ham <= Multimodal.PhashMaxHamming
    } yield (bid, hid, ham)).toSet
    assert(got === expected)
    // the sub-region suffix leaves most fingerprints untouched: the bulk
    // of the leaked batch surfaces its own source (hamming 0)
    val selfHits = got.count { case (b, h, ham) =>
      h == b - ContaminatedShift && ham == 0 }
    assert(selfHits * 2 > batch.length,
      s"only $selfHits/${batch.length} leaked docs surfaced their source")
  }

  test("decoded features drive similarity search (C12 -> C6 composition)") {
    val out = Multimodal.multimodalSimilar(spark, sfDir).collect()
    assert(out.nonEmpty)
    val byQuery = out.groupBy(_.getLong(0))
    byQuery.values.foreach { rows =>
      assert(rows.length <= 5)
      val scores = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
    }
  }

  test("frame containment: every seeded clip surfaces its source at 1.0; " +
      "fresh frames match nothing (C77)") {
    val docs = graft.sources.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text"))
    val hist = Multimodal.mediaTable(spark, sfDir).filter(col("fmt") === "vid")
    // clipMod=1: EVERY eligible video doc seeds a clip — full recall check
    val clips = Multimodal.clipLeaksOf(docs, 1)
    val seeded = clips.select(col("media_id")).collect()
      .map(_.getLong(0)).toSet
    assert(seeded.nonEmpty, "no eligible clip sources in the spec corpus")
    val r = Multimodal.frameContainment(hist, clips).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(4)))
    seeded.foreach { cid =>
      val src = cid - Multimodal.ClipShift
      assert(r.exists(p => p._1 == cid && p._2 == src && p._3 == 1.0),
        s"clip $cid did not surface source $src at full containment")
    }
    // negative control: frames of content absent from the corpus match
    // nothing — the frame-hash equijoin cannot manufacture candidates
    val freshText = Iterator.continually("graft-fresh-frame-xyzzy ")
      .take(12).mkString.take(6 * Multimodal.FrameBytes)
    val fresh = Multimodal.mediaTableOf(
      spark.range(1).select(lit(999999998L).as("doc_id"),
        lit(freshText).as("text")))
    assert(Multimodal.frameContainment(hist, fresh).count() === 0L)
  }
}
