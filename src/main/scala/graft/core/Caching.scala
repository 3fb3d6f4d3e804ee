package graft.core

import org.apache.spark.sql.DataFrame

/** Idempotent caching syntax for plan-internal intermediates — see
  * [[org.apache.spark.sql.graftbridge.CacheBridge]].
  */
object Caching {
  implicit class CachedOps(private val df: DataFrame) extends AnyVal {
    /** `cache()` unless an equivalent plan is already cached (silences
      * the repeated-plan CacheManager warning when operators sharing a
      * sub-plan run in one session).
      */
    def cachedOnce: DataFrame =
      org.apache.spark.sql.graftbridge.CacheBridge.cached(df)
  }
}
