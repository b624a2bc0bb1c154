package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Olap.dsum

/** SURVEY §2 B14: Structured Streaming analogue of the reference's stream-out
  * path (stream/util.py): event-time windowed aggregation with a watermark,
  * drained through a sink.
  *
  * The operator is the streaming DAG itself — readStream → event-time
  * conversion → withWatermark → window agg. For the driver contract the
  * file source replays the events table as a stream and the memory sink
  * collects the final state; at deploy scale the same DAG runs on a Kafka
  * source and a foreachBatch webhook sink with checkpointed exactly-once
  * progress (document ids are content-derived, see Rules.documentId).
  *
  * Because counts and decimal-exact sums are replay-invariant, the streamed
  * result equals the batch result — so this IS oracle-checked against the
  * same SQL as the batch windowed aggregation.
  */
object StreamOps {

  val QueryName = "graft_stream_events"

  def streamEvents(spark: SparkSession, dir: String): DataFrame = {
    // schema from a batch peek (ts arrives as LONG nanos, see GraftSession)
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val ev =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    val agg = ev
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("value_sum"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("value_sum"))

    // drain: complete-mode memory sink, AvailableNow terminates at EOF
    spark.streams.active.filter(_.name == QueryName).foreach(_.stop())
    val q = agg.writeStream.format("memory").queryName(QueryName)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(QueryName).orderBy(col("window_start_us"), col("event_type"))
  }

  val streamEventsSql: String =
    """SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS window_start_us,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS value_sum
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_events" -> (streamEvents _)
  )

  val oracles: Map[String, String] = Map(
    "stream_events" -> streamEventsSql
  )
}
