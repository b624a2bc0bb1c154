package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C86's Unicode deploy knob (r11 next-round #5): `normFormOf(unicode =
  * true)` must absorb the width / ligature / diacritic / case variants
  * the ASCII normal form misses, keep non-Latin text alive, and leave
  * the ORACLE path (`unicode = false`) byte-identical to the shared
  * `normExpr` spelling that `norm_dedup`'s DuckDB twin mirrors.
  */
class NormFoldSpec extends SparkSpec {

  private def norms(texts: Seq[String], unicode: Boolean): Seq[String] = {
    import spark.implicits._
    texts.toDF("text")
      .select(TextOps.normFormOf(col("text"), unicode).as("n"))
      .collect().map(_.getString(0)).toSeq
  }

  test("the fold absorbs width, ligature, diacritic and case variants " +
      "the ASCII form misses") {
    val variants = Seq(
      "cafe menu",
      "Caf\u00e9 menu!",          // composed é + case + punct
      "\uFF23af\u00e9 menu",       // fullwidth C + composed é
      "cafe\u0301 menu",          // combining acute on e
      "CAF\u00c9 menu")           // uppercase composed É
    val folded = norms(variants, unicode = true)
    assert(folded.toSet === Set("cafe menu"),
      s"fold did not converge: $folded")
    // the ASCII form misses them: é is stripped to a space, fullwidth
    // letters vanish — the variants do NOT converge
    val ascii = norms(variants, unicode = false)
    assert(ascii.toSet.size > 1, s"ASCII form unexpectedly converged: $ascii")
  }

  test("non-Latin text survives the unicode tail instead of normalizing " +
      "to empty (the alias-every-CJK-doc failure mode)") {
    val texts = Seq("\u65e5\u672c\u8a9e \u30c6\u30b9\u30c8",
      "\u0440\u0443\u0441\u0441\u043a\u0438\u0439 \u0442\u0435\u043a\u0441\u0442")
    val folded = norms(texts, unicode = true)
    assert(folded.forall(_.nonEmpty), s"non-Latin text wiped: $folded")
    assert(folded.distinct.size === 2, "distinct scripts must stay distinct")
    // the ASCII form DOES wipe them — exactly why it is oracle-only
    assert(norms(texts, unicode = false).forall(_.isEmpty))
  }

  test("unicode = false is the untouched oracle spelling, and the fold " +
      "is idempotent") {
    val texts = Seq("Hello,  World!", "MIXED case\ttabs")
    assert(norms(texts, unicode = false) ===
      Seq("hello world", "mixed case tabs"))
    // on already-folded ASCII the two paths agree (the fold only ADDS
    // absorption, never changes the ASCII normal form)
    assert(norms(texts, unicode = true) === norms(texts, unicode = false))
    // idempotence: folding a folded form is a no-op
    val once = norms(Seq("\uFF23af\u00e9  Menu!"), unicode = true)
    assert(norms(once, unicode = true) === once)
  }

  test("nfkd_fold is callable from SQL via the extensions") {
    val r = spark.sql("SELECT nfkd_fold('\uFF23AF\u00c9') AS f")
      .collect()(0).getString(0)
    assert(r === "cafe")
  }
}
