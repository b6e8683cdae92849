package org.apache.spark.sql

/** Test-only peek behind the `private[sql]` curtain: is the session's
  * CacheManager empty? The dedup/similarity builders must not leave
  * cached plans behind for an embedding session to clean up —
  * CacheHygieneSpec asserts it through this probe.
  */
object CacheProbe {
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
