package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class SinksSpec extends SparkSpec {

  private val out = s"${sys.props("java.io.tmpdir")}/graft_sink_test"

  test("partitioned parquet: layout, bounded files, lossless roundtrip") {
    val docs = Tables(spark, sfDir).documents
    Sinks.writePartitionedParquet(docs, out,
      partitionCols = Seq("lang"), sortCols = Seq("doc_id"), filesPerPartition = 2)

    // Hive-style partition dirs exist
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    langs.foreach { l =>
      assert(Files.exists(Paths.get(out, s"lang=$l")), s"missing partition dir lang=$l")
      val files = Files.list(Paths.get(out, s"lang=$l")).toArray
        .map(_.toString).filter(_.endsWith(".parquet"))
      assert(files.nonEmpty && files.length <= 2,
        s"lang=$l has ${files.length} files, expected <= 2")
    }

    // roundtrip is lossless (partition col comes back typed as string here)
    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())
    val a = docs.orderBy("doc_id").collect().map(_.getAs[String]("text"))
    val b = back.orderBy("doc_id").collect().map(_.getAs[String]("text"))
    assert(a.toSeq === b.toSeq)
  }

  test("json lines sink writes parseable records") {
    val path = s"$out-json"
    Sinks.writeJsonLines(
      graft.etl.Receipts.etlWebhookJson(spark, sfDir).limit(10), path)
    val back = spark.read.json(path)
    assert(back.count() === 10)
    assert(back.columns.contains("webhook_json"))
  }
}
