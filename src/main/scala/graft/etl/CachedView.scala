package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped persisted view: built once per (session, sf dir), spilled
  * rather than OOM'd, evicted when the owning context stops, explicitly
  * invalidatable for servers that cycle many sessions. The staging-table
  * analogue of the reference service holding a parsed frame in memory. */
private[graft] final class CachedView(build: (SparkSession, String) => DataFrame) {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  // ONE eviction listener per SparkContext for this view's lifetime —
  // registering per cache miss would leak a listener on every
  // invalidate/rebuild cycle and every new session over the same context.
  private val listenerRegistered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.SparkContext, java.lang.Boolean]())

  def apply(spark: SparkSession, dir: String): DataFrame =
    cache.computeIfAbsent((spark, dir), { _ =>
      val sc = spark.sparkContext
      if (listenerRegistered.add(sc))
        sc.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onApplicationEnd(
                e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
              cache.keySet.removeIf(_._1.sparkContext eq sc)
              listenerRegistered.remove(sc)
            }
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
