package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Known-answer tests for the business rules (reference: the rules package). */
class RulesSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c).head().get(0)

  test("categorize follows the ordered-contains rules") {
    val cases = Seq(
      ("GL-5010 BEER", "STANDARD", "BEER"),
      ("GL-5020 WINE", "STANDARD", "WINE"),
      ("x spirit y", "STANDARD", "SPIRITS"),          // case-insensitive
      ("GL NONALCOHOL", "MISCELLANEOUS ITEMS", "MISCELLANEOUS"),
      ("GL NONALCOHOL", "STANDARD", "NON-ALCOHOLIC"),
      ("BEER AND WINE", "STANDARD", "BEER"),          // ordered: BEER wins
      ("other", "STANDARD", "MISCELLANEOUS"),
      (null, null, "MISCELLANEOUS")
    ).toDF("gl", "pc", "expected")
    val got = cases.select(Rules.categorize($"gl", $"pc")).as[String].collect()
    assert(got.toSeq == Seq("BEER", "WINE", "SPIRITS", "MISCELLANEOUS",
      "NON-ALCOHOLIC", "BEER", "MISCELLANEOUS", "MISCELLANEOUS"))
  }

  test("normalizeUom matches reference branches incl. precedence") {
    val cases = Seq("12 OZ", "6 CT", "4 PACK", "CA", "case of 24", "BO",
      "bottle", "EA", "each", "", "nan", "weird", "12 oz pack").toDF("u")
    val got = cases.select(Rules.normalizeUom($"u")).as[String].collect()
    assert(got.toSeq == Seq("oz", "ct", "pack", "case", "case", "bottle",
      "bottle", "each", "each", "unit", "unit", "unit", "oz"))
  }

  test("quantity: bottle passthrough, beer special packs, wine units") {
    val df = Seq(
      // qty, uom_raw, gl, packs, units
      (3.0, "BO", "BEER GL", 12L, 6L),   // bottle → 3
      (2.0, "CA", "BEER GL", 12L, 6L),   // beer special → 2*12*6=144
      (2.0, "CA", "BEER GL", 3L, 6L),    // beer standard → 6
      (2.0, "CA", "WINE GL", 3L, 6L),    // wine → 2*3*6=36
      (2.0, "CA", "SPIRIT GL", 3L, 6L),  // spirits → 6
      (0.0, "CA", "BEER GL", 12L, 6L)    // zero qty → 0
    ).toDF("q", "u", "gl", "p", "un")
    val got = df.select(Rules.quantity($"q", Rules.normalizeUom($"u"),
      Rules.categorize($"gl", lit("STANDARD")), $"p", $"un")).as[Long].collect()
    assert(got.toSeq == Seq(3L, 144L, 6L, 36L, 6L, 0L))
  }

  test("packsLike: 0 and null default to 1, floats truncate") {
    val df = Seq[(java.lang.Double, Int)]((0.0, 0), (null, 1), (2.9, 2), (24.0, 3))
      .toDF("v", "i").orderBy("i")
    val got = df.select(Rules.packsLike($"v")).as[Long].collect()
    assert(got.toSeq == Seq(1L, 1L, 2L, 24L))
  }

  test("upc extraction: priority and zfill(14)") {
    val df = Seq(
      ("123", "456", "789"),
      (null, "456", "789"),
      (null, null, "789"),
      ("", "nan", "123456789012345678")  // over-long truncates to first 14
    ).toDF("pack", "clean", "cse")
    val got = df.select(Rules.extractUpc($"pack", $"clean", $"cse")).as[String].collect()
    assert(got.toSeq == Seq("00000000000123", "00000000000456", "00000000000789",
      "12345678901234"))
  }

  test("notes joins only nonzero adjustments; all-zero → null") {
    val df = Seq((2.5, 0.0, 0.0, 10.0), (0.0, 0.0, 0.0, 0.0)).toDF("d", "dep", "m", "del")
    val got = df.select(Rules.notes($"d", $"dep", $"m", $"del")).collect().map(_.get(0))
    assert(got(0) == "Discount: 2.5000; Delivery: 10.0000")
    assert(got(1) == null)
  }

  test("invoice date parse with deterministic fallback") {
    val df = Seq("3/9/1996", "12/31/2001", "not-a-date").toDF("s")
    val got = df.select(Rules.parseInvoiceDate($"s").cast("string")).as[String].collect()
    assert(got.toSeq == Seq("1996-03-09", "2001-12-31", "1970-01-01"))
  }

  test("rule application is shuffle-free (map-stage only plan)") {
    val plan = EtlQueries.etlPrices(spark, sfDir).queryExecution.executedPlan.toString
    // the only exchanges allowed are the broadcast dims + the final sort
    assert(!plan.contains("hashpartitioning") || plan.contains("rangepartitioning"))
  }
}
