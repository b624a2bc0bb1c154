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

  test("co-bucketed tables join with zero shuffle exchanges") {
    val t = Tables(spark, sfDir)
    Sinks.writeBucketed(t.lineitem.select("l_orderkey", "l_quantity"),
      "bkt_lineitem", "l_orderkey", 8, sortCols = Seq("l_orderkey"))
    Sinks.writeBucketed(t.orders.select("o_orderkey", "o_totalprice"),
      "bkt_orders", "o_orderkey", 8, sortCols = Seq("o_orderkey"))
    val joined = spark.table("bkt_lineitem")
      .join(spark.table("bkt_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey").agg(sum("l_quantity"), max("o_totalprice"))
    assert(joined.count() === t.lineitem.select("l_orderkey").distinct().count())
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
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
