package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Core OLAP queries — the batch query surface of the engine (SURVEY §2 B).
  *
  * Oracle-parity rules used throughout:
  *  - money/double aggregates accumulate in DECIMAL (order-independent,
  *    bit-identical between engines), then cast back to DOUBLE;
  *  - every query ends with a fully deterministic ORDER BY.
  */
object Olap {

  /** Decimal-exact sum of a double expression, returned as double.
    * `sum` over decimal is order-independent, so the result is identical no
    * matter how Spark partitions the data — required for oracle hash-match
    * and good hygiene on a 1000-executor cluster.
    */
  def dsum(e: Column, scale: Int = 6): Column =
    sum(e.cast(s"decimal(25,$scale)")).cast("double")

  /** Pricing summary (TPC-H Q1 shape): wide aggregation with partial
    * (map-side) aggregation — one shuffle on a tiny key space. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir).lineitem
    l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity"), 2).as("sum_qty"),
        dsum(col("l_extendedprice"), 2).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
          .as("sum_charge"),
        count(lit(1)).as("count_order")
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(25,6))) AS DOUBLE) AS sum_charge,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
