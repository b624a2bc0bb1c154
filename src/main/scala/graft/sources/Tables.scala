package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  def events: DataFrame     = t("events")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
