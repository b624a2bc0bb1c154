package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the engine's table layout: one parquet dataset per table
  * under a scale-factor directory. Column pruning and predicate pushdown
  * happen at the parquet scan because everything downstream stays in the
  * declarative Column algebra.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark reads as
    * LONG nanos (see GraftSession nanosAsLong). Convert to a microsecond
    * timestamp with integer division — floating division would lose
    * precision above 2^53 ns. Truncation matches DuckDB's ns→us cast. */
  def events: DataFrame = {
    val e = t("events")
    e.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        e.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // naive micros re-stamped as a UTC instant (sessions tuned by
        // GraftSession never hit this branch — inferTimestampNTZ=false
        // reads the column as TIMESTAMP directly; this covers externally
        // built sessions so `events` always yields the TIMESTAMP type
        // watermarks and unix_micros require). Micros are computed against
        // an NTZ epoch literal, NOT via cast("timestamp") — the cast
        // interprets naive time in the session zone, so a non-UTC external
        // session would shift every instant (r7 ADVICE).
        e.withColumn("ts", timestamp_micros(expr(
          "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")))
      case _ => e
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
