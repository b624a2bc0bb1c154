package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C109 `text_readability`: hand-counted Flesch components and band
  * edges, plus map-stage invariants on the real corpus. */
class ReadabilitySpec extends SparkSpec {

  test("fixture: hand-counted words, sentences, vowel-group syllables, " +
      "and the Flesch value") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("readability").toString
    // "The cat sat. The dog ran!" — 6 words, 2 sentences,
    // vowel groups: e,a,a,e,o,a = 6
    Seq((1L, "The cat sat. The dog ran!", "en", "s", 25L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextOps.textReadability(spark, dir).collect().head
    assert(r.getLong(1) === 6L && r.getLong(2) === 2L &&
      r.getLong(3) === 6L)
    val expect = 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (6.0 / 6.0)
    assert(r.getDouble(4) === expect)
    assert(r.getString(5) === "easy") // 119.19
  }

  test("fixture: no terminal punctuation floors sentences at 1; dense " +
      "polysyllables land in 'difficult'") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("readability2").toString
    Seq((1L, "no terminals here", "en", "s", 17L),
      (2L, "extraordinarily unconstitutional incomprehensibilities " +
        "overenthusiastically institutionalization misunderstanding " +
        "responsibilities characteristically", "en", "s", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.textReadability(spark, dir).collect()
    assert(rows(0).getLong(2) === 1L)
    assert(rows(1).getString(5) === "difficult",
      s"flesch=${rows(1).getDouble(4)}")
  }

  test("real corpus: one row per doc, positive counts, bands partition " +
      "on the emitted flesch value") {
    val t = graft.sources.Tables(spark, sfDir)
    val rows = TextOps.textReadability(spark, sfDir).collect()
    assert(rows.length.toLong === t.documents.count())
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
      val f = r.getDouble(4)
      val band = if (f >= 60.0) "easy"
        else if (f >= 30.0) "standard" else "difficult"
      assert(r.getString(5) === band)
    }
  }
}
