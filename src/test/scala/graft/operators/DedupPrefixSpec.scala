package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C113 `dedup_jaccard_prefix`: the prefix-filtered join equals the full
  * inverted-index join — on the corpus AND on randomized adversarial
  * token sets — while generating strictly fewer candidates. */
class DedupPrefixSpec extends SparkSpec {

  test("corpus frame-identity with C4 (shared-oracle backing)") {
    val a = TextOps.dedupNgramJaccard(spark, sfDir).collect().map(_.toString)
    val b = TextOps.dedupJaccardPrefix(spark, sfDir).collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty, "corpus must exercise the positive path")
  }

  test("randomized soundness: prefix pairs == brute pairs on 80 random " +
      "docs (the completeness theorem, empirically)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // base docs + mutated variants: the variants guarantee Jaccard-heavy
    // pairs; varied lengths exercise every ceil(t·n) residue mod 5
    val base = (1L to 40L).map { id =>
      val len = 6 + rnd.nextInt(17)
      id -> Seq.fill(len)("w" + rnd.nextInt(400)).toVector
    }
    val variants = base.filter(_._1 % 3 == 0).map { case (id, toks) =>
      val i = rnd.nextInt(toks.length)
      (id + 1000L) -> toks.updated(i, "m" + rnd.nextInt(400))
    }
    val docs = (base ++ variants)
      .map { case (id, toks) => (id, toks.mkString(" ")) }
      .toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id_a"), col("id_b"), col("intersection"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    val brute = pairs(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.4))
    val pref = pairs(Dedup.ngramJaccardPrefixPairs(docs, "doc_id", "text",
      n = 3, TextOps.JaccardTNum, TextOps.JaccardTDen))
    assert(pref === brute, {
      val miss = brute -- pref; val extra = pref -- brute
      s"prefix join diverged: missing=$miss extra=$extra"
    })
    assert(brute.nonEmpty, "fixture must produce pairs")
  }

  test("the prefix filter generates strictly fewer candidates than the " +
      "full inverted index on the corpus") {
    val d = graft.sources.Tables(spark, sfDir).documents
      .select(col("doc_id").as("_id"),
        graft.functions.textsketch.word_shingles(col("text"), 3).as("_sh"))
    val ex = d.select(col("_id"), explode(col("_sh")).as("_s"))
    def candCount(e: org.apache.spark.sql.DataFrame): Long =
      e.as("a").join(e.as("b"),
          col("a._s") === col("b._s") && col("a._id") < col("b._id"))
        .select(col("a._id"), col("b._id")).distinct().count()
    val freq = ex.groupBy(col("_s")).agg(count(lit(1)).as("_f"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_id")).orderBy(col("_f"), col("_s"))
    val prefix = ex.join(freq, "_s")
      .withColumn("_rn", row_number().over(byDoc))
      .withColumn("_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("_id"))))
      .filter(col("_rn") <= col("_n") -
        expr(s"(${TextOps.JaccardTNum} * _n + ${TextOps.JaccardTDen - 1}) " +
          s"div ${TextOps.JaccardTDen}") + 1)
      .select(col("_id"), col("_s"))
    val full = candCount(ex)
    val pref = candCount(prefix)
    assert(pref < full,
      s"prefix candidates ($pref) must undercut the full join ($full)")
  }
}
