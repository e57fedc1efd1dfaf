package org.apache.spark.sql

/** Test-only window into Spark's CacheManager (a `private[sql]` surface),
  * used by DedupSpec's persist-lifecycle property: CacheManager entries
  * are held by strong reference — unlike localCheckpoint RDD blocks they
  * are NOT GC-reclaimable — so "no net cached-plan growth across repeated
  * operator calls" is the assertion that proves a deterministic
  * unpersist lifecycle. */
object GraftCacheProbe {
  def numCachedPlans(spark: SparkSession): Int =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.numCachedEntries
}
