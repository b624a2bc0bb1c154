package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-side scale discipline (SURVEY §2 D). Reading 100 TB well starts
  * with writing it well: bounded file counts, partition-dir layout that
  * matches downstream pruning keys, and sorted runs inside every file so
  * min/max row-group statistics actually prune.
  */
object Sinks {

  /** Partitioned parquet writer with a bounded file count per partition
    * directory.
    *
    * - `partitionCols` become Hive-style partition directories — the
    *   columns downstream queries prune on (partition pruning beats row
    *   groups by orders of magnitude).
    * - `filesPerPartition` bounds file count: rows are shuffled on
    *   (partitionCols, deterministic salt) so each partition dir gets at
    *   most that many similar-sized files — no thousand-small-files
    *   problem, no single-giant-file stragglers.
    * - `sortCols` order rows inside each file, so parquet row-group
    *   min/max statistics prune reads on those columns too.
    */
  def writePartitionedParquet(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String],
      filesPerPartition: Int = 1): Unit = {
    val salt = pmod(xxhash64(sortCols.map(col): _*), lit(filesPerPartition))
    df.repartition((partitionCols.map(col) :+ (salt: Column)): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)
  }

  /** JSON-lines sink — the batch analogue of the reference's webhook
    * stream-out (stream/util.py POSTs one JSON per receipt; at engine scale
    * the same payloads land as JSONL for a downstream forwarder). */
  def writeJsonLines(df: DataFrame, path: String, files: Int = 1): Unit =
    df.coalesce(files).write.mode("overwrite").json(path)

  /** Bucketed managed table: pre-shuffles ONCE at write time so every
    * subsequent join/aggregation on `bucketCol` between co-bucketed tables
    * runs with ZERO exchanges — the canonical way to make a repeated
    * 100 TB fact-fact join affordable. `sortCols` pre-sorts buckets so the
    * join can skip its sort too.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // with an in-memory catalog an orphaned managed-table directory can
    // survive a previous session; clear it or saveAsTable refuses the name
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/" + table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode("overwrite").bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet").saveAsTable(table)
  }
}
