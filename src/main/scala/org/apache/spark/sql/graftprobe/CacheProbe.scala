package org.apache.spark.sql.graftprobe

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic

/** Read-only window into Spark's SQL [[org.apache.spark.sql.execution.CacheManager]].
  *
  * Lives under `org.apache.spark.sql` because `SparkSession.sharedState`
  * is `private[sql]`; nothing here mutates Spark state. Used by the cache-
  * hygiene spec (assert a [[graft.pipeline.PipelineCaches.clear]] really
  * released every SQL cache) and by Bench's leak sentinel (a cached-entry
  * count that grows across iterations is exactly the round-7 pathology:
  * handles collected before cleanup leaving `InMemoryRelation`s pinned).
  */
object CacheProbe {

  private def cacheManager(spark: SparkSession) =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager

  /** True iff the session's CacheManager holds no cached plans. */
  def isEmpty(spark: SparkSession): Boolean = cacheManager(spark).isEmpty

  /** Number of cached plan entries. CacheManager keeps its `cachedData`
    * IndexedSeq private (not `private[sql]`), so this reads it
    * reflectively — probe-only, never on a query path. */
  def entryCount(spark: SparkSession): Int = {
    val cm = cacheManager(spark)
    val m = cm.getClass.getDeclaredMethod("cachedData")
    m.setAccessible(true)
    m.invoke(cm).asInstanceOf[scala.collection.immutable.IndexedSeq[_]].size
  }
}
