package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Idempotent persist: cache `df` unless this exact (canonicalized)
  * plan is already live in the CacheManager. Query builders run more
  * than once per session (bench warm-up + timed reps, Verify + driver
  * re-runs); re-persisting the identical plan makes the CacheManager
  * log "Asked to cache already cached data" and re-register the
  * entry. The guard reuses the live entry instead; entries are freed
  * by the ContextCleaner once the plan is unreachable.
  */
object Caching {
  def cachedOnce(df: DataFrame): DataFrame =
    if (df.storageLevel == StorageLevel.NONE)
      df.persist(StorageLevel.MEMORY_AND_DISK)
    else df
}
