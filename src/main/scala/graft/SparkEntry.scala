package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Olap.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](
      "q1_agg" -> (Olap.q1Agg _)
    ) ++ graft.etl.EtlQueries.queries ++ graft.etl.Receipts.queries ++
      OlapB.queries ++ OlapC.queries ++ OlapD.queries ++ TextOps.queries ++ Pipeline.queries ++ CorpusOps.queries ++
      VectorOps.queries ++ Sketch.queries ++ Multimodal.queries ++
      Linkage.queries ++
      graft.streaming.StreamOps.queries ++
      graft.streaming.StatefulSessions.queries ++ graft.sources.Intake.queries ++
      graft.sources.Sinks.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Olap.q1AggSql
  ) ++ graft.etl.EtlQueries.oracles ++ graft.etl.Receipts.oracles ++
    OlapB.oracles ++ OlapC.oracles ++ OlapD.oracles ++ TextOps.oracles ++ Pipeline.oracles ++ CorpusOps.oracles ++
    VectorOps.oracles ++ Sketch.oracles ++ Multimodal.oracles ++
    Linkage.oracles ++
    graft.streaming.StreamOps.oracles ++
    graft.streaming.StatefulSessions.oracles ++ graft.sources.Sinks.oracles
}
