package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Olap.dsum

/** SURVEY §2 block A — the reference's ETL semantics as engine queries,
  * each paired with a DuckDB oracle. All rule application is map-stage;
  * only `etl_receipts` shuffles (once, on the invoice key).
  */
object EtlQueries {

  private def enr(spark: SparkSession, dir: String): DataFrame =
    InvoiceView.enriched(spark, dir)

  // --- A2: category classification -------------------------------------
  def etlCategory(spark: SparkSession, dir: String): DataFrame =
    enr(spark, dir)
      .groupBy("gl_code", "product_class", "category")
      .agg(count(lit(1)).as("n"))
      .orderBy("gl_code", "product_class", "category")

  val etlCategorySql: String = InvoiceView.enrichedSql +
    """ SELECT gl_code, product_class, category, COUNT(*) AS n
      | FROM enr2 GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin

  // --- A3: unit-of-measure normalization --------------------------------
  def etlUom(spark: SparkSession, dir: String): DataFrame =
    enr(spark, dir).groupBy("uom_raw", "uom").agg(count(lit(1)).as("n"))
      .orderBy("uom_raw", "uom")

  val etlUomSql: String = InvoiceView.enrichedSql +
    """ SELECT uom_raw, uom, COUNT(*) AS n FROM enr2 GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  // --- A4: quantity calculation ------------------------------------------
  def etlQuantity(spark: SparkSession, dir: String): DataFrame =
    enr(spark, dir).select(col("invoice_number"), col("line_number"),
        col("category"), col("uom"), col("qty_raw").as("qty_raw_out"),
        col("packs"), col("units"), col("qty_calc"))
      .orderBy("invoice_number", "line_number")

  // qty_raw is an internal name in the SQL twin; expose a stable alias.
  val etlQuantitySql: String = InvoiceView.enrichedSql +
    """ SELECT invoice_number, line_number, category, uom,
      |   qty_raw AS qty_raw_out, packs, units, qty_calc
      | FROM enr2 ORDER BY invoice_number, line_number""".stripMargin

  // --- A5: UPC / SKU extraction ------------------------------------------
  def etlUpcSku(spark: SparkSession, dir: String): DataFrame =
    InvoiceView.inv(spark, dir)
      .select(col("product_number"), col("pack_upc"), col("clean_upc"), col("case_upc"),
        Rules.extractUpc(col("pack_upc"), col("clean_upc"), col("case_upc")).as("upc"),
        Rules.formatSku(col("case_upc")).as("sku"))
      .withColumn("upc_valid", Rules.validateUpc(col("upc")))
      .distinct()
      .orderBy("product_number")

  private val fmtUpc: String => String = c =>
    s"""CASE WHEN trim(coalesce($c,'')) IN ('','nan','None') THEN NULL
       |     ELSE substr(lpad(trim($c),14,'0'),1,14) END""".stripMargin

  val etlUpcSkuSql: String = InvoiceView.invSql +
    s""" SELECT DISTINCT product_number, pack_upc, clean_upc, case_upc, upc, sku,
       |   CASE WHEN regexp_matches(trim(coalesce(upc, '')), '^[0-9]+$$')
       |             AND length(trim(coalesce(upc, ''))) <= 14
       |        THEN 1 ELSE 0 END AS upc_valid
       | FROM (
       |   SELECT product_number, pack_upc, clean_upc, case_upc,
       |     coalesce(${fmtUpc("pack_upc")}, ${fmtUpc("clean_upc")}, ${fmtUpc("case_upc")}) AS upc,
       |     ${fmtUpc("case_upc")} AS sku
       |   FROM inv)
       | ORDER BY product_number""".stripMargin

  // --- A6: price/adjustment extraction + notes ----------------------------
  def etlPrices(spark: SparkSession, dir: String): DataFrame =
    InvoiceView.inv(spark, dir)
      .select(col("invoice_number"), col("line_number"), col("extended_price"),
        col("discount_adj"), col("tax_adj"), col("deposit_adj"),
        col("misc_adj"), col("delivery_adj"),
        Rules.notes(col("discount_adj"), col("deposit_adj"),
                    col("misc_adj"), col("delivery_adj")).as("notes"))
      .orderBy("invoice_number", "line_number")

  private val noteFrag: (String, String) => String = (label, c) =>
    s"""CASE WHEN coalesce(try_cast($c AS DOUBLE),0) <> 0
       |     THEN '$label: ' || CAST(CAST($c AS DECIMAL(18,4)) AS VARCHAR) END""".stripMargin

  val etlPricesSql: String = InvoiceView.invSql +
    s""" SELECT invoice_number, line_number, extended_price, discount_adj, tax_adj,
       |   deposit_adj, misc_adj, delivery_adj,
       |   nullif(concat_ws('; ', ${noteFrag("Discount", "discount_adj")},
       |     ${noteFrag("Deposit", "deposit_adj")}, ${noteFrag("Misc", "misc_adj")},
       |     ${noteFrag("Delivery", "delivery_adj")}), '') AS notes
       | FROM inv ORDER BY invoice_number, line_number""".stripMargin

  // --- A7: m/d/Y date parsing with deterministic fallback -----------------
  def etlDates(spark: SparkSession, dir: String): DataFrame =
    InvoiceView.inv(spark, dir)
      .select(col("invoice_number"), col("invoice_date_str"),
        Rules.parseInvoiceDate(col("invoice_date_str")).as("invoice_date"))
      .distinct()
      .orderBy("invoice_number")

  val etlDatesSql: String = InvoiceView.invSql +
    """ SELECT DISTINCT invoice_number, invoice_date_str,
      |   coalesce(CAST(try_strptime(invoice_date_str, '%-m/%-d/%Y') AS DATE),
      |            DATE '1970-01-01') AS invoice_date
      | FROM inv ORDER BY invoice_number""".stripMargin

  // --- A1: safe coercion (over events, incl. garbage inputs) --------------
  def etlClean(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
    val rawNum = when(col("event_id") % 3 === 0, (col("event_id") % 50).cast("string"))
      .when(col("event_id") % 3 === 1, "").otherwise("N/A")
    val rawTxt = when(col("event_id") % 4 === 0, lit(null: String))
      .when(col("event_id") % 4 === 1, "  spark  ")
      .when(col("event_id") % 4 === 2, "MiXeD")
      .otherwise(col("event_type"))
    e.select(col("event_id"), rawNum.as("raw_num"),
        Rules.safeNum(rawNum).as("num"), Rules.safeText(rawTxt).as("txt"))
      .orderBy("event_id")
  }

  val etlCleanSql: String =
    """WITH e AS (
      |  SELECT event_id,
      |    CASE CAST(event_id % 3 AS INT) WHEN 0 THEN CAST(event_id % 50 AS VARCHAR)
      |         WHEN 1 THEN '' ELSE 'N/A' END AS raw_num,
      |    CASE CAST(event_id % 4 AS INT) WHEN 0 THEN NULL WHEN 1 THEN '  spark  '
      |         WHEN 2 THEN 'MiXeD' ELSE event_type END AS raw_txt
      |  FROM events)
      |SELECT event_id, raw_num,
      |  coalesce(try_cast(raw_num AS DOUBLE), 0) AS num,
      |  upper(trim(coalesce(raw_txt, ''))) AS txt
      |FROM e ORDER BY event_id""".stripMargin

  // --- A8 + A11: receipts assembly (one shuffle on the invoice key,
  // computed once in Receipts.receiptsBase and shared with A9/A10) --------
  def etlReceipts(spark: SparkSession, dir: String): DataFrame =
    Receipts.receiptsBase(spark, dir)
      .select(col("invoice_number").as("receipt_id"), col("vendor"),
        col("transaction_date"), col("total_amount"), col("subtotal"),
        col("sales_tax"), col("item_count"), col("total_units"))
      .withColumn("document_id", Rules.documentId(col("receipt_id"), col("receipt_id")))
      .orderBy("receipt_id")

  val etlReceiptsSql: String = InvoiceView.enrichedSql +
    """ SELECT invoice_number AS receipt_id,
      |   min(vendor_name) AS vendor,
      |   min(coalesce(CAST(try_strptime(invoice_date_str, '%-m/%-d/%Y') AS DATE),
      |                DATE '1970-01-01')) AS transaction_date,
      |   max(invoice_amount) AS total_amount,
      |   CAST(SUM(CAST(extended_price AS DECIMAL(25,2))) AS DOUBLE) AS subtotal,
      |   min_by(tax_adj, line_number * 10000000000.0 + floor(tax_adj * 10000 + 0.5)) AS sales_tax,
      |   COUNT(*) AS item_count,
      |   CAST(CAST(SUM(CAST(qty_calc AS DECIMAL(25,0))) AS DOUBLE) AS BIGINT) AS total_units,
      |   concat_ws('-', 'fnt', substr(md5(CAST(invoice_number AS VARCHAR)), 1, 16),
      |             CAST(invoice_number AS VARCHAR)) AS document_id
      | FROM enr2 GROUP BY 1 ORDER BY 1""".stripMargin

  // --- A11: deterministic document ids ------------------------------------
  def etlDocumentId(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .select(col("o_orderkey").as("invoice_number"),
        Rules.documentId(col("o_orderkey"), col("o_orderkey")).as("document_id"))
      .orderBy("invoice_number")

  val etlDocumentIdSql: String =
    """SELECT o_orderkey AS invoice_number,
      |  concat_ws('-', 'fnt', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 16),
      |            CAST(o_orderkey AS VARCHAR)) AS document_id
      |FROM orders ORDER BY 1""".stripMargin

  /** Registry for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_clean" -> (etlClean _),
    "etl_category" -> (etlCategory _),
    "etl_uom" -> (etlUom _),
    "etl_quantity" -> (etlQuantity _),
    "etl_upc_sku" -> (etlUpcSku _),
    "etl_prices" -> (etlPrices _),
    "etl_dates" -> (etlDates _),
    "etl_receipts" -> (etlReceipts _),
    "etl_document_id" -> (etlDocumentId _)
  )

  val oracles: Map[String, String] = Map(
    "etl_clean" -> etlCleanSql,
    "etl_category" -> etlCategorySql,
    "etl_uom" -> etlUomSql,
    "etl_quantity" -> etlQuantitySql,
    "etl_upc_sku" -> etlUpcSkuSql,
    "etl_prices" -> etlPricesSql,
    "etl_dates" -> etlDatesSql,
    "etl_receipts" -> etlReceiptsSql,
    "etl_document_id" -> etlDocumentIdSql
  )
}
