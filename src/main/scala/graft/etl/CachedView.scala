package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped persisted view: built once per (session, sf dir), spilled
  * rather than OOM'd, evicted when the owning context stops, explicitly
  * invalidatable for servers that cycle many sessions. The staging-table
  * analogue of the reference service holding a parsed frame in memory. */
private[graft] final class CachedView(build: (SparkSession, String) => DataFrame) {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def apply(spark: SparkSession, dir: String): DataFrame =
    cache.computeIfAbsent((spark, dir), { _ =>
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
            cache.keySet.removeIf(_._1 eq spark)
        })
      build(spark, dir).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  /** Unpersist and drop every cached frame belonging to `spark`. */
  def invalidate(spark: SparkSession): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq spark) { e.getValue.unpersist(); it.remove() }
    }
  }
}
