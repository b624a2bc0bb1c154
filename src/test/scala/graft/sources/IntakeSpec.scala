package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntakeSpec extends SparkSpec {

  test("csv_intake parses good rows and flags exactly the malformed ones") {
    val df = Intake.csvIntake(spark, sfDir)
    val total = df.count()
    val corrupt = df.filter(col("is_corrupt")).count()
    assert(total === 103) // 100 staged + 3 malformed
    assert(corrupt === 3) // bad doc_id, broken quoting, short row
    // parsed values round-trip from the documents table
    val docs = graft.sources.Tables(spark, sfDir).documents
      .select("doc_id", "n_chars").orderBy("doc_id").limit(3).collect()
    val parsed = df.filter(!col("is_corrupt")).orderBy("doc_id").limit(3).collect()
    docs.zip(parsed).foreach { case (d, p) =>
      assert(d.getLong(0) === p.getLong(0))
      assert(d.getLong(1) === p.getLong(2))
    }
  }

  test("intake_listing names every parquet table deterministically") {
    val rows = Intake.intakeListing(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).contains("lineitem.parquet"))
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getString(1).startsWith("intake/2024-01-01_"))
      assert(r.getString(1).endsWith(r.getString(0)))
    }
    val again = Intake.intakeListing(spark, sfDir).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}
