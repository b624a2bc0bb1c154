package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Olap.dsum

/** SURVEY §2 A9/A10: nested receipt assembly + webhook JSON rendering
  * (reference: stream/processor.py:56 group-by-invoice →
  * schema.py ProcessedReceipt → stream/util.py:to_webhook_schema).
  *
  * The nested shape is assembled in ONE shuffle: collect_list(struct) runs
  * inside the same hash aggregation as the scalar receipt fields, and
  * array_sort makes the element order deterministic (line_number is unique
  * within an invoice), so results are stable under any partitioning.
  */
object Receipts {

  /** The ONE receipts aggregation: every receipt-shaped query (flat A8,
    * nested A9, webhook A10) projects from this per-(session, sf) cached
    * base, so the invoice-key shuffle and the nested assembly run once —
    * exactly like the reference service building each ProcessedReceipt
    * once and rendering it into multiple outputs. */
  private val base = new CachedView((spark, dir) =>
    InvoiceView.enriched(spark, dir)
      .groupBy(col("invoice_number"))
      .agg(
        min(col("vendor_name")).as("vendor"),
        min(Rules.parseInvoiceDate(col("invoice_date_str"))).as("transaction_date"),
        max(col("invoice_amount")).as("total_amount"),
        dsum(col("extended_price"), 2).as("subtotal"),
        // "first row's tax" (processor.py:69): (line_number, tax) arg-min
        // with a numeric composite key — line_number alone is not unique,
        // and an ambiguous arg-min would be nondeterministic.
        min_by(col("tax_adj"),
          col("line_number") * 10000000000.0 + floor(col("tax_adj") * 10000 + 0.5))
          .as("sales_tax"),
        count(lit(1)).as("item_count"),
        dsum(col("qty_calc"), 0).cast("bigint").as("total_units"),
        // line_number is NOT unique within a synthetic invoice, so the
        // element order ties break on the full field tuple; nullable upc is
        // last so non-null fields settle order first (array_sort compares
        // struct fields in declaration order).
        array_sort(collect_list(struct(
          col("line_number"),
          col("product_description").as("item_name"),
          col("qty_calc").as("quantity"),
          col("uom").as("unit_of_measure"),
          col("category"),
          col("extended_price").as("price"),
          Rules.extractUpc(col("pack_upc"), col("clean_upc"), col("case_upc")).as("upc")
        ))).as("line_items")))

  def receiptsBase(spark: SparkSession, dir: String): DataFrame = base(spark, dir)
  def invalidate(spark: SparkSession): Unit = base.invalidate(spark)

  // --- A9: receipt with nested line_items array ----------------------------
  /** Library form: one row per invoice with the nested `line_items`
    * array-of-struct (the ProcessedReceipt shape). */
  def receiptsNested(spark: SparkSession, dir: String): DataFrame =
    receiptsBase(spark, dir)
      .select(col("invoice_number").as("receipt_id"), col("vendor"),
        col("subtotal"), col("item_count"), col("line_items"))
      .orderBy(col("receipt_id"))

  /** Gate form: the driver's comparator orders rows via pandas, which cannot
    * sort a raw array-of-struct cell — so the gate output carries the nested
    * product serialized to ONE canonical string per receipt. Price goes
    * through decimal(18,2) so both engines format it identically; the
    * element order is `receiptsNested`'s array_sort order. */
  def etlReceiptsNested(spark: SparkSession, dir: String): DataFrame =
    receiptsNested(spark, dir)
      .withColumn("line_items", array_join(
        transform(col("line_items"), x => concat_ws("|",
          x.getField("line_number").cast("string"),
          x.getField("item_name"),
          x.getField("quantity").cast("string"),
          x.getField("unit_of_measure"),
          x.getField("category"),
          x.getField("price").cast("decimal(18,2)").cast("string"),
          x.getField("upc"))), ";"))

  val etlReceiptsNestedSql: String = InvoiceView.enrichedSql + {
    val fmtUpc: String => String = c =>
      s"""CASE WHEN trim(coalesce($c,'')) IN ('','nan','None') THEN NULL
         |     ELSE substr(lpad(trim($c),14,'0'),1,14) END""".stripMargin
    s""" SELECT invoice_number AS receipt_id,
       |   min(vendor_name) AS vendor,
       |   CAST(SUM(CAST(extended_price AS DECIMAL(25,2))) AS DOUBLE) AS subtotal,
       |   COUNT(*) AS item_count,
       |   string_agg(
       |      concat_ws('|', CAST(line_number AS VARCHAR), product_description,
       |        CAST(qty_calc AS VARCHAR), uom, category,
       |        CAST(CAST(extended_price AS DECIMAL(18,2)) AS VARCHAR),
       |        coalesce(${fmtUpc("pack_upc")}, ${fmtUpc("clean_upc")}, ${fmtUpc("case_upc")})),
       |      ';' ORDER BY line_number, product_description, qty_calc, uom,
       |      category, extended_price,
       |      coalesce(${fmtUpc("pack_upc")}, ${fmtUpc("clean_upc")}, ${fmtUpc("case_upc")}) NULLS FIRST
       |   ) AS line_items
       | FROM enr2 GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // --- A10: webhook JSON rendering (oracle-checked canonical form) ---------
  /** Maps the nested receipt to the webhook payload shape
    * (stream/util.py:67): renamed keys, deterministic document id. The
    * rendering is CANONICAL so the text is engine-reproducible: every
    * floating field passes through decimal(18,2) — Spark's to_json prints a
    * decimal via BigDecimal.toString, scale preserved ("5.00", never "5.0"
    * or scientific notation) — and key order is fixed by struct declaration
    * order. The DuckDB twin rebuilds the exact same text by concatenation
    * (its own to_json strips trailing decimal zeros, so string assembly is
    * the portable path there). */
  def etlWebhookJson(spark: SparkSession, dir: String): DataFrame = {
    val receipts = receiptsBase(spark, dir)
      .withColumn("line_items", transform(col("line_items"), x =>
        struct(x.getField("line_number").as("line_number"),
          x.getField("item_name").as("item_name"),
          x.getField("quantity").as("quantity"),
          x.getField("price").cast("decimal(18,2)").as("price"))))
    receipts.select(
      col("invoice_number").as("receipt_id"),
      to_json(struct(
        Rules.documentId(col("invoice_number"), col("invoice_number")).as("document_id"),
        col("vendor"),
        date_format(col("transaction_date"), "yyyy-MM-dd").as("transaction_date"),
        col("subtotal").cast("decimal(18,2)").as("subtotal"),
        col("total_amount").cast("decimal(18,2)").as("total_amount"),
        col("item_count"),
        col("line_items")
      )).as("webhook_json"))
      .orderBy(col("receipt_id"))
  }

  /** DuckDB twin of [[etlWebhookJson]]: the canonical JSON text assembled
    * by concatenation — decimal casts render with fixed scale in both
    * engines, the line-item order is receiptsBase's full-tuple array_sort
    * order, and the synthesized vendor/item strings contain no characters
    * needing JSON escaping (pinned by ReceiptsSpec). */
  val etlWebhookJsonSql: String = InvoiceView.enrichedSql + {
    val fmtUpc: String => String = c =>
      s"""CASE WHEN trim(coalesce($c,'')) IN ('','nan','None') THEN NULL
         |     ELSE substr(lpad(trim($c),14,'0'),1,14) END""".stripMargin
    s""" , r AS (
       | SELECT invoice_number,
       |   min(vendor_name) AS vendor,
       |   min(coalesce(CAST(try_strptime(invoice_date_str, '%-m/%-d/%Y') AS DATE),
       |                DATE '1970-01-01')) AS transaction_date,
       |   CAST(max(invoice_amount) AS DECIMAL(18,2)) AS total_amount,
       |   CAST(SUM(CAST(extended_price AS DECIMAL(25,2))) AS DECIMAL(18,2)) AS subtotal,
       |   COUNT(*) AS item_count,
       |   string_agg(concat('{"line_number":', CAST(line_number AS VARCHAR),
       |       ',"item_name":"', product_description,
       |       '","quantity":', CAST(qty_calc AS VARCHAR),
       |       ',"price":', CAST(CAST(extended_price AS DECIMAL(18,2)) AS VARCHAR), '}'),
       |     ',' ORDER BY line_number, product_description, qty_calc, uom,
       |     category, extended_price,
       |     coalesce(${fmtUpc("pack_upc")}, ${fmtUpc("clean_upc")}, ${fmtUpc("case_upc")}) NULLS FIRST
       |   ) AS items_json
       | FROM enr2 GROUP BY 1)
       | SELECT invoice_number AS receipt_id,
       |   concat('{"document_id":"',
       |     concat_ws('-', 'fnt', substr(md5(CAST(invoice_number AS VARCHAR)), 1, 16),
       |               CAST(invoice_number AS VARCHAR)),
       |     '","vendor":"', vendor,
       |     '","transaction_date":"', strftime(transaction_date, '%Y-%m-%d'),
       |     '","subtotal":', CAST(subtotal AS VARCHAR),
       |     ',"total_amount":', CAST(total_amount AS VARCHAR),
       |     ',"item_count":', CAST(item_count AS VARCHAR),
       |     ',"line_items":[', items_json, ']}') AS webhook_json
       | FROM r ORDER BY receipt_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_receipts_nested" -> (etlReceiptsNested _),
    "etl_webhook_json" -> (etlWebhookJson _)
  )

  val oracles: Map[String, String] = Map(
    "etl_receipts_nested" -> etlReceiptsNestedSql,
    "etl_webhook_json" -> etlWebhookJsonSql
  )
}
