package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.ClassicConversions.castToImpl

/** Idempotent cache: operators cache plan-internal intermediates, and
  * two operators sharing a sub-plan (or one operator invoked twice in a
  * session) would otherwise re-cache an identical plan — harmless, but
  * every occurrence logs `WARN CacheManager: Asked to cache already
  * cached data` (73 of them in a full test run). The pre-check needs
  * the `private[sql]` CacheManager, hence this bridge.
  */
object CacheBridge {

  /** `df.cache()` unless an equivalent plan is already cached. */
  def cached(df: DataFrame): DataFrame = {
    val ds = castToImpl(df)
    if (ds.sparkSession.sharedState.cacheManager.lookupCachedData(ds).isEmpty) df.cache()
    else df
  }
}
