package graft

import org.apache.spark.sql.DataFrame

/** Registry for QUERY-LOCAL cached intermediates that live inside a
  * lazily-returned plan.
  *
  * Several operators persist an intermediate that feeds two or more
  * branches of the plan they return (the inverted shingle index of
  * [[analytics.Dedup.ngramJaccardPairs]] feeds both sides of its
  * self-join; the quality-gated corpus of the training pipeline feeds
  * language-ID, dedup and the final projection). The persist can only
  * pay off AFTER the caller executes the returned plan — so the library
  * cannot unpersist before returning, and without a release hook every
  * such cache lives until the session dies. Across a long-lived session
  * (the bench suite, a notebook, a multi-query job) those dead caches
  * accumulate in executor storage and old-gen heap, degrading every
  * LATER query's GC and eviction behavior — the r14 full-suite bench
  * distortion (BASELINE.md "bench run hygiene").
  *
  * Contract: operators `track` each query-local persist as they build
  * the plan; the CALLER invokes [[release]] once it has fully consumed
  * the result (after an action, between pipeline stages, after each
  * bench/verify query). Releasing is always SAFE for tracked
  * CacheManager persists — re-executing the returned plan afterwards
  * just recomputes — and the registry is intentionally NOT used for
  * eager localCheckpoints (whose release is destructive; see
  * [[org.apache.spark.sql.graftbridge.Bridge.dropLocalCheckpoint]] —
  * operators drop those themselves once consumed within the call).
  *
  * Session-lifetime caches (the memoized event-log layout in
  * [[sources.Tables.eventLog]], persisted serving indexes) never
  * register here.
  */
object QueryCaches {
  private val tracked =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Register a query-local persisted intermediate; returns it.
    *
    * The registry is JVM-GLOBAL and assumes one query at a time per
    * session (the bench/verify/pipeline shape): release() called from
    * one query's cleanup also drops caches tracked by a concurrently
    * RUNNING query. That is safe — CacheManager persists recompute —
    * but it silently defeats the persist and can double-pay an expensive
    * intermediate; concurrent-query callers should scope their own
    * release points accordingly. */
  def track(df: DataFrame): DataFrame = { tracked.add(df); df }

  /** Unpersist every tracked intermediate (non-blocking). Safe at any
    * point; plans referencing a released cache recompute on next use. */
  def release(): Unit = {
    var df = tracked.poll()
    while (df != null) {
      try df.unpersist(blocking = false)
      catch {
        case e: InterruptedException =>
          Thread.currentThread().interrupt(); return
        case scala.util.control.NonFatal(_) => ()
      }
      df = tracked.poll()
    }
  }
}
