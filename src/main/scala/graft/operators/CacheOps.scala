package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared persist-lifecycle helper for operators that cache an intermediate
  * frame: the (small) result is materialized eagerly (localCheckpoint) so the
  * big intermediate can be released immediately — repeated calls in a
  * long-lived session must not accumulate MEMORY_AND_DISK blocks the caller
  * can't free. The returned frame is itself cached; callers may
  * `.unpersist()` it. */
private[operators] object CacheOps {
  def materializeAndRelease(out: DataFrame, cached: DataFrame): DataFrame =
    try out.localCheckpoint(true) finally cached.unpersist(false)
}
