package graft.projections

import org.apache.spark.sql.functions._
import graft.model.EventEnvelope
import graft.sources.{EventLogStore, PendingEvent}

/** Projection lifecycle management — the reset/update half of the
  * reference's ManagedProjection state machine
  * (EventStore.Projections.Core/Services/Management/ManagedProjection.cs:
  * Reset/SetState discard checkpoints, bump the projection epoch, and
  * delete the projection's emitted streams so an updated definition
  * re-runs from a blank slate).
  *
  * The Spark shape:
  *  - a control stream `$projections-{name}-control` records one
  *    `$ProjectionReset` event per reset; the projection EPOCH is the
  *    count of those events (reference: ManagedProjection's Epoch/Version
  *    persisted in `$projections-{name}` prepared records).
  *  - emitted-event and checkpoint idempotency keys incorporate the epoch
  *    ([[EmittedSink.eventId]], [[ProjectionCheckpoints]]), so a
  *    post-reset re-run re-emits fresh events instead of being swallowed
  *    by the exactly-once dedup against pre-reset ids.
  *  - reset soft-deletes (truncates via `$tb`) every visible
  *    `$projections-{name}-*` stream AND every stream the projection ever
  *    emitted into — the reference deletes emitted streams on reset the
  *    same way (emitted streams are projection-owned), using its
  *    `$projections-{name}-emittedstreams` registry, which
  *    [[EmittedSink.appendIdempotent]] maintains here too.
  *
  * Everything is driver-light: the only collect()s are point lookups on
  * the control stream; the stream inventory + truncation-point math runs
  * as one distributed plan appended in one bulk commit.
  */
object ProjectionLifecycle {

  def controlStream(name: String): String = s"$$projections-$name-control"
  def emittedStreamsStream(name: String): String =
    s"$$projections-$name-emittedstreams"

  /** Current epoch of a projection: 0 until the first reset. A point
    * lookup on the control stream (stream + bucket pruned). */
  def epoch(store: EventLogStore, name: String): Int = status(store, name)._1

  /** True when a reset started (its `$ProjectionResetStarted` marker is in
    * the control stream) but never completed — a crash landed between the
    * truncation commit and the `$ProjectionReset` control append. In that
    * state outputs are (partially) truncated while the epoch is unbumped,
    * so emit/checkpoint ids would dedup against truncated raw-log rows and
    * silently write nothing; [[EmittedSink]]/[[ProjectionCheckpoints]]
    * refuse to run until [[reset]] is re-invoked (it is safely
    * re-runnable: truncation math recomputes from current visibility). */
  def resetPending(store: EventLogStore, name: String): Boolean =
    status(store, name)._2

  /** (epoch, resetPending) in ONE control-stream point lookup. */
  private[projections] def status(store: EventLogStore, name: String): (Int, Boolean) = {
    if (!store.exists) return (0, false)
    val row = store.readStreamEvents(controlStream(name))
      .agg(
        sum(when(col("event_type") === "$ProjectionReset", 1L).otherwise(0L)),
        sum(when(col("event_type") === "$ProjectionResetStarted", 1L).otherwise(0L)))
      .collect()(0)
    val completed = if (row.isNullAt(0)) 0L else row.getLong(0)
    val started = if (row.isNullAt(1)) 0L else row.getLong(1)
    (completed.toInt, started > completed)
  }

  /** Reset a projection: truncate its result/checkpoint/registry streams
    * and every stream it emitted into, then bump the epoch so the next
    * run re-checkpoints and re-emits from scratch. Safe to call on a
    * projection that never ran (no-op + epoch bump). */
  def reset(store: EventLogStore, name: String): Unit = {
    val next = status(store, name)._1 + 1
    // start marker BEFORE the truncation commit: a crash mid-reset leaves
    // started > completed, which resetPending surfaces and the writers
    // refuse, instead of silently deduping against truncated ids. The
    // marker append is idempotent per epoch (deterministic event_id), so
    // re-running a crashed reset does not double-count.
    store.append(Seq(PendingEvent(
      controlStream(name), s"$name:reset-started:$next", "$ProjectionResetStarted",
      s"""{"epoch":$next}""")))
    if (store.exists) {
      val log = store.readRetained()
      val prefix = s"$$projections-$name-"
      // streams the projection owns by name (results, checkpoint,
      // emittedstreams registry — NOT the control stream, which survives
      // resets because it carries the epoch)
      val owned = log
        .where(col("stream_id").startsWith(prefix) &&
          col("stream_id") =!= controlStream(name))
        .select(col("stream_id"), col("event_number"))
      // streams the projection emitted into, from the registry
      val targetIds = log
        .where(col("stream_id") === emittedStreamsStream(name))
        .select(col("data").as("_target")).distinct()
      val targeted = log
        .join(targetIds, log("stream_id") === col("_target"), "left_semi")
        .select(col("stream_id"), col("event_number"))
      // one $metadata truncate event per stream, built distributively:
      // $tb = last visible event number + 1 (what softDelete writes)
      val lasts = owned.unionByName(targeted)
        .groupBy("stream_id").agg(max("event_number").as("_last"))
      val metaEvents = lasts.select(
        concat(lit(EventEnvelope.MetastreamPrefix), col("stream_id")).as("stream_id"),
        concat_ws(":", lit("$reset"), lit(name), col("stream_id"),
          (col("_last") + 1).cast("string")).as("event_id"),
        lit("$metadata").as("event_type"),
        concat(lit("{\"$tb\":"), (col("_last") + 1).cast("string"), lit("}")).as("data"),
        lit(null).cast("string").as("metadata"),
        lit(null).cast("string").as("correlation_id"),
        lit(null).cast("timestamp").as("timestamp"))
      store.appendBulk(metaEvents, orderBy = Seq("stream_id"))
    }
    store.append(Seq(PendingEvent(
      controlStream(name), s"$name:reset:$next", "$ProjectionReset",
      s"""{"epoch":$next}""")))
  }
}
