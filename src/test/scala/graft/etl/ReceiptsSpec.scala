package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ReceiptsSpec extends SparkSpec {

  test("nested receipts: line_items count equals item_count, sorted by line") {
    val rows = Receipts.receiptsNested(spark, sfDir).limit(50).collect()
    rows.foreach { r =>
      val items = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("line_items"))
      assert(items.size === r.getAs[Long]("item_count"))
      val lineNums = items.map(_.getAs[Int]("line_number"))
      assert(lineNums === lineNums.sorted)
    }
  }

  test("gate form serializes every nested line item, one segment per item") {
    val rows = Receipts.etlReceiptsNested(spark, sfDir).limit(50).collect()
    rows.foreach { r =>
      val s = r.getAs[String]("line_items")
      assert(s.split(';').length === r.getAs[Long]("item_count"))
    }
  }

  test("webhook json is valid and carries the renamed keys") {
    val r = Receipts.etlWebhookJson(spark, sfDir).limit(5).collect()
    r.foreach { row =>
      val json = row.getString(row.fieldIndex("webhook_json"))
      for (key <- Seq("document_id", "vendor", "transaction_date", "subtotal",
          "total_amount", "item_count", "line_items", "item_name", "quantity"))
        assert(json.contains("\"" + key + "\""), s"missing $key in $json")
      assert(json.contains("\"fnt-"))
    }
    // the canonical-JSON oracle rebuilds this text by concatenation, which
    // is sound only while no payload string needs JSON escaping — pin it
    val all = Receipts.etlWebhookJson(spark, sfDir).collect()
    all.foreach { row =>
      val json = row.getString(row.fieldIndex("webhook_json"))
      assert(!json.contains("\\"), s"escape sequence would break the oracle: $json")
    }
  }

  test("document ids are deterministic across runs") {
    val a = Receipts.etlWebhookJson(spark, sfDir).limit(20).collect().map(_.toString)
    val b = Receipts.etlWebhookJson(spark, sfDir).limit(20).collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }
}
