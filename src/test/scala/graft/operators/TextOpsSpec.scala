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

  test("compress_ratio is callable from SQL and stays in codegen") {
    val r = spark.sql("SELECT compress_ratio('a a a a a a a a a a') AS r")
      .head().getDouble(0)
    assert(r > 0 && r < 2)
    val plan = graft.sources.Tables(spark, sfDir).documents
      .select(graft.functions.textsketch.compress_ratio(col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().startsWith("*("), plan)
  }
}
