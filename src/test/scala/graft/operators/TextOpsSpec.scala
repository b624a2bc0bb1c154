package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {

  import spark.implicits._

  test("compress_ratio separates repetition from varied text, deterministically") {
    val df = Seq(
      ("rep", Array.fill(200)("spam spam").mkString(" ")),
      ("var", (1 to 200).map(i => s"w${i * 7919}").mkString(" "))
    ).toDF("k", "text")
    val got = df.select(col("k"),
        graft.functions.textsketch.compress_ratio(col("text")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("rep") < 0.1, s"repetitive text should compress hard: $got")
    assert(got("var") > got("rep") * 3)
    val again = df.select(graft.functions.textsketch.compress_ratio(col("text")))
      .collect().map(_.getDouble(0)).toSeq
    assert(again === Seq(got("rep"), got("var")))
  }

  test("text_compress_ratio query flags redundant docs consistently") {
    val rows = TextOps.textCompressRatio(spark, sfDir).collect()
    assert(rows.length === graft.sources.Tables(spark, sfDir).documents.count())
    rows.foreach { r =>
      val ratio = r.getAs[Double]("compress_ratio")
      assert(ratio > 0.0 && ratio < 1.5)
      assert(r.getAs[Int]("is_redundant") === (if (ratio < 0.35) 1 else 0))
    }
  }

  test("compress_ratio agrees with the ORACLE-CHECKED redundancy proxies " +
      "(r13 verdict #8: the deterministic half of C21 is cross-checked " +
      "through C25's hash-green board, deflate itself stays rows-only)") {
    // a repetition LADDER (fixed length, rising within-doc duplication):
    // the oracle-checked proxy (dup_gram_frac, C25's spelling) and the
    // deflate ratio must rank every rung the same way — dup_gram_frac
    // strictly rising, compress_ratio strictly falling. 200 words per
    // rung; rung k cycles a vocabulary of 200/2^k distinct words.
    val rungs = Seq(0, 1, 3, 6).map { k =>
      val vocab = 200 >> k
      s"r$k" -> (0 until 200).map(i => s"w${(i % vocab) * 7919}")
        .mkString(" ")
    }
    val fx = rungs.toDF("k", "text")
    val frac = CorpusOps.textRepetitionOn(fx, "k", "text")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("dup_gram_frac"))
      .toMap
    val cr = fx.select(col("k"),
        graft.functions.textsketch.compress_ratio(col("text")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val order = rungs.map(_._1)
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(frac(a) < frac(b),
        s"proxy must rise with repetition: $a=${frac(a)} $b=${frac(b)}")
      assert(cr(a) > cr(b),
        s"deflate must fall with repetition: $a=${cr(a)} $b=${cr(b)}")
    }
  }

  test("substring_dedup: exact copies and their originals are fully duplicated") {
    val rows = TextOps.substringDedup(spark, sfDir).collect()
    val byId = rows.map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val copies = byId.keys.filter(_ >= 100000000L)
    assert(copies.nonEmpty)
    copies.foreach { c =>
      // every window of a seeded copy exists in its original → frac 1.0,
      // and the original carries the identical stats (windows are shared)
      assert(byId(c)._3 === 1.0, s"copy $c not fully duplicated")
      assert(byId(c) === byId(c - 100000000L))
    }
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  test("substring_scrub: dup spans removed from every carrier, clean " +
      "docs untouched, and the scrub reconciles with the C44 stats (C96)") {
    val scrub = TextOps.substringScrub(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val stats = TextOps.substringDedup(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scrub.nonEmpty)
    // seeded exact copies: EVERY window is cross-document dup, so both
    // the copy and its original scrub to nothing (the symmetric
    // mask-all-carriers policy, documented on the operator)
    val copies = scrub.keys.filter(_ >= 100000000L)
    assert(copies.nonEmpty)
    copies.foreach { c =>
      Seq(c, c - 100000000L).foreach { id =>
        val (n, removed, text) = scrub(id)
        if (n >= TextOps.SubstrW)
          assert(removed === n && text === "", s"$id not fully scrubbed")
      }
    }
    scrub.foreach { case (id, (n, removed, text)) =>
      assert(removed >= 0 && removed <= n)
      // reconciliation with C44: dup windows ⇔ removed tokens, and one
      // dup window masks at least its own W tokens
      val dupWindows = stats.getOrElse(id, 0L)
      if (dupWindows == 0)
        assert(removed === 0, s"$id removed $removed with no dup windows")
      else assert(removed >= TextOps.SubstrW, s"$id removed only $removed")
      // untouched docs keep their tokens verbatim (whitespace-normalized)
      if (removed == 0) {
        val toks = text.split("\\s+").filter(_.nonEmpty)
        assert(toks.length === n, s"$id token count changed")
      }
    }
  }

  test("text_entropy: JVM replay agrees; bounds and codegen hold") {
    val rows = TextOps.textEntropy(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val texts = graft.sources.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.nonEmpty && rows.length === texts.size)
    rows.foreach { case (id, n, d, h) =>
      // independent replay of the micro-nat quantization over code points
      val cps = texts(id).codePoints().toArray
      val counts = cps.groupBy(identity).map(_._2.length.toLong)
      assert(n === cps.length.toLong && d === counts.size)
      val sq = counts.map(c => math.floor(c * math.log(c.toDouble) * 1e6).toLong).sum
      val hq = math.floor(n * math.log(n.toDouble) * 1e6).toLong - sq
      assert(h === hq.toDouble / 1e6 / n)
      // Shannon bounds: 0 ≤ H ≤ ln(distinct) (+ quantization slack)
      assert(h >= -1e-6 && h <= math.log(d.toDouble) + 1e-6)
    }
    // degenerate cases: uniform text has zero entropy; two equiprobable
    // chars have exactly ln 2 (quantized)
    val tiny = Seq((1L, "aaaa"), (2L, "abab")).toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.textsketch.char_entropy_stats(col("text")).as("e"))
      .select(col("doc_id"), (col("e.hq").cast("double") / 1e6 /
        col("e.n_chars").cast("double")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(tiny(1L) === 0.0)
    assert(math.abs(tiny(2L) - math.log(2.0)) < 2e-6)
    // the one-pass kernel stays inside whole-stage codegen
    val plan = graft.sources.Tables(spark, sfDir).documents
      .select(graft.functions.textsketch.char_entropy_stats(col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().startsWith("*("), plan)
  }

  test("compress_ratio is callable from SQL and stays in codegen") {
    val r = spark.sql("SELECT compress_ratio('a a a a a a a a a a') AS r")
      .head().getDouble(0)
    assert(r > 0 && r < 2)
    val plan = graft.sources.Tables(spark, sfDir).documents
      .select(graft.functions.textsketch.compress_ratio(col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().startsWith("*("), plan)
  }

  test("norm_dedup: byte-distinct case/punct variants group; C1 cannot see them (C86)") {
    val rows = TextOps.normDedup(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // every injected variant (uppercased + punct noise) lands in its
    // source's normalized group: the group keyed by a %11 keeper holds
    // >= 2 variants of which >= 2 are byte-distinct
    val injected = rows.filter(r => r._4 % 11 == 0 && r._4 < 700000000L)
    assert(injected.nonEmpty)
    injected.foreach { case (h, nv, nbd, keeper) =>
      assert(nv >= 2, s"group of $keeper did not absorb its variant")
      assert(nbd >= 2, s"group of $keeper variants not byte-distinct")
    }
    // the same corpus under C1's byte-exact grouping CANNOT pair them:
    // sha256(text) differs, so each injected doc is its own C1 group
    val c1 = graft.operators.Dedup.exactGroups(
      TextOps.normCorpus(spark, sfDir), "doc_id", "text")
      .filter(col("keeper_id") >= 700000000L).count()
    assert(c1 > 0, "injection produced no byte-distinct rows")
    // normalization idempotence on the real corpus: norm(norm(x)) == norm(x)
    // — built from TextOps.normExpr ITSELF (an expr() re-spelling went
    // through SQL string-escape processing and tested a mangled regex)
    val docs = graft.sources.Tables(spark, sfDir).documents
    val bad = docs.select(TextOps.normExpr(col("text")).as("n1"))
      .select(col("n1"), TextOps.normExpr(col("n1")).as("n2"))
      .filter(col("n1") =!= col("n2")).count()
    assert(bad === 0L, s"$bad non-idempotent normalizations")
    // and the mangling scenario itself: a case/punct-noised sample must
    // normalize to its clean form (catches an escape-level regex fork)
    import spark.implicits._
    val one = Seq("Mass,  Tests!! ").toDF("t")
      .select(TextOps.normExpr(col("t"))).head().getString(0)
    assert(one === "mass tests", s"normExpr mangled: '$one'")
  }
}
