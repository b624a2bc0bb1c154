package graft.etl

import graft.SparkSpec
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** End-to-end: the reference's own input format through the whole graft
  * pipeline — CSV intake → rules → receipts → webhook JSONL. */
class CsvPipelineSpec extends SparkSpec {

  private val header =
    "Invoice Number,Vendor Name,Invoice Date,Invoice Amount,Product Description," +
      "Product Number,Product Class,GL Code,Unit Of Measure,Quantity," +
      "Packs Per Case,Units Per Pack,Extended Price,Discount Adjustment Total," +
      "DepositAdjustmentTotal,Miscellaneous Adjustment Total," +
      "Tax Adjustment Total,Delivery Adjustment Total,Pack UPC,Clean UPC,Case UPC"

  private val rows = Seq(
    // BEER, special pack size 6 → qty = 2*6*4 = 48; null Pack/Clean UPC → Case
    "INV-1,ACME BEV,3/5/2024,100.50,IPA 6PK,101,STANDARD,GL-5010 BEER,6 CT,2,6,4,40.00,1.50,0,0,2.00,0,,,123",
    // bottle passthrough: qty = floor(3) regardless of packs
    "INV-1,ACME BEV,3/5/2024,100.50,PINOT BO,102,STANDARD,GL-5020 WINE,BO,3,12,2,60.50,0,2.50,0,0,0,777,888,999",
    // NONALCOHOL + MISCELLANEOUS class override; malformed date on its invoice
    "INV-2,ZETA LLC,not-a-date,55.00,SODA CASE,103,MISCELLANEOUS ITEMS,GL-5040 NONALCOHOLIC,CA,5,0,1,55.00,0,0,0.75,0,10.00,,444,"
  )

  private lazy val csvPath = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_csv_pipeline_fixture.csv")
    Files.write(p, (header +: rows).mkString("\n").getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  test("vendor CSV flows to webhook payloads with reference semantics") {
    val out = CsvPipeline
      .webhookPayloads(CsvPipeline.readVendorCsv(spark, csvPath), "mail-1")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out.keySet === Set("INV-1", "INV-2"))

    val inv1 = out("INV-1")
    assert(inv1.contains("\"receiptId\":\"INV-1\""))
    assert(inv1.contains("\"vendor\":\"ACME BEV\""))
    assert(inv1.contains("\"transactionDate\":\"2024-03-05\""))
    assert(inv1.contains("\"subtotal\":100.5"))
    assert(inv1.contains("\"itemCount\":2"))
    assert(inv1.contains("\"qty\":48"))         // BEER 2 qty × 6 packs × 4 units
    assert(inv1.contains("\"qty\":3"))          // bottle passthrough
    assert(inv1.contains("\"category\":\"BEER\""))
    assert(inv1.contains("\"upc\":\"00000000000123\"")) // case-UPC fallback, zfilled
    assert(inv1.contains("\"upc\":\"00000000000777\"")) // pack-UPC priority
    assert(inv1.contains("Discount: 1.5"))
    assert(inv1.contains("Deposit: 2.5"))
    assert(inv1.contains("\"document_id\":\"fnt-"))

    val inv2 = out("INV-2")
    assert(inv2.contains("\"category\":\"MISCELLANEOUS\"")) // class override
    assert(inv2.contains("\"transactionDate\":\"1970-01-01\"")) // pinned fallback
    assert(inv2.contains("\"qty\":5")) // packs 0 → 1, case uom: qty×packs
  }

  test("payload carries the full reference key set incl. GCS provenance") {
    val out = CsvPipeline
      .webhookPayloads(CsvPipeline.readVendorCsv(spark, csvPath), "mail-1",
        gcsBucket = "invoices-bucket", gcsPath = "inbox/2024/03/file.csv")
      .collect().map(r => r.getString(1))
    // reference payload keys (stream/util.py:to_webhook_schema +
    // schema.py:22–35 provenance, minus wall-clock processed_at by design)
    val keys = Seq("receiptId", "vendor", "transactionDate", "totalAmount",
      "salesTax", "subtotal", "itemCount", "document_id", "lineItems",
      "source_file", "gcs_bucket", "gcs_path")
    out.foreach { json =>
      keys.foreach(k => assert(json.contains("\"" + k + "\""), s"missing $k in $json"))
      assert(json.contains("\"gcs_bucket\":\"invoices-bucket\""))
      assert(json.contains("\"gcs_path\":\"inbox/2024/03/file.csv\""))
    }
  }

  test("processed_at: injected clock rides every payload; absent by default") {
    def payloads(at: Option[String]) = CsvPipeline
      .webhookPayloads(CsvPipeline.readVendorCsv(spark, csvPath), "mail-1",
        processedAt = at).collect().map(_.getString(1))
    // default: omitted — replay determinism (documented design choice)
    payloads(None).foreach(j => assert(!j.contains("processed_at")))
    // injected: the reference's schema.py:22 provenance field, stamped
    // identically on every payload of the batch
    val stamped = payloads(Some("2024-03-01T12:00:00Z"))
    stamped.foreach(j =>
      assert(j.contains("\"processed_at\":\"2024-03-01T12:00:00Z\""), j))
    // same injected stamp → byte-identical payloads across replays
    assert(stamped.toSeq === payloads(Some("2024-03-01T12:00:00Z")).toSeq)
  }

  test("invoice metadata getters: defaults for absent columns, trim for present") {
    // the fixture has Vendor Name / Invoice * but none of the retailer
    // or store columns — those must yield the reference's defaults
    val m = CsvPipeline.invoiceMetadata(CsvPipeline.readVendorCsv(spark, csvPath))
      .collect()
    assert(m.forall(_.getAs[String]("retailer_name") == ""))
    assert(m.forall(_.getAs[String]("retailer_vendor_id") == ""))
    assert(m.forall(_.getAs[String]("vendor_store_number") == ""))
    assert(m.forall(_.getAs[Int]("invoice_item_count") == 0))
    assert(m.exists(_.getAs[String]("vendor_name") == "ACME BEV"))
    assert(m.exists(_.getAs[Double]("invoice_amount") == 100.50))
    // a CSV that does carry retailer columns gets them trimmed
    val p2 = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft_meta.csv")
    Files.write(p2, ("Invoice Number,Retailer Name,Retailer VendorID\n" +
      "INV-9,  Mega Mart  ,RV-77").getBytes(StandardCharsets.UTF_8))
    val m2 = CsvPipeline.invoiceMetadata(
      CsvPipeline.readVendorCsv(spark, p2.toString)).collect()
    assert(m2.head.getAs[String]("retailer_name") == "Mega Mart")
    assert(m2.head.getAs[String]("retailer_vendor_id") == "RV-77")
    assert(m2.head.getAs[String]("vendor_name") == "Unknown Vendor")
  }

  test("receipts are invariant to input partitioning (content-keyed arg-min)") {
    val raw = CsvPipeline.readVendorCsv(spark, csvPath)
    val once = CsvPipeline.receipts(raw, "mail-1")
      .collect().map(_.toString).sorted.toSeq
    // reshuffled/reversed input must produce the identical receipts — the
    // reference's iloc[0] cannot survive a reshard, the content key can
    val reshuffled = CsvPipeline.receipts(
      raw.repartition(7).sortWithinPartitions(org.apache.spark.sql.functions
        .col("Extended Price")), "mail-1")
      .collect().map(_.toString).sorted.toSeq
    assert(once === reshuffled)
  }

  test("run() lands webhook JSONL that reads back row-per-receipt") {
    val outDir = Files.createTempDirectory("graft_webhook_out").toString + "/jsonl"
    CsvPipeline.run(spark, csvPath, outDir, "mail-1")
    val back = spark.read.json(outDir)
    assert(back.count() === 2)
    assert(back.columns.toSet === Set("receipt_id", "payload"))
  }
}
