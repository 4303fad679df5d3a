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
  def epoch(store: EventLogStore, name: String): Int = {
    if (!store.exists) return 0
    store.readStreamEvents(controlStream(name))
      .where(col("event_type") === "$ProjectionReset")
      .agg(count(lit(1))).collect()(0).getLong(0).toInt
  }

  /** Reset a projection: truncate its result/checkpoint/registry streams
    * and every stream it emitted into, then bump the epoch so the next
    * run re-checkpoints and re-emits from scratch. Safe to call on a
    * projection that never ran (no-op + epoch bump). */
  def reset(store: EventLogStore, name: String): Unit = {
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
    val next = epoch(store, name) + 1
    store.append(Seq(PendingEvent(
      controlStream(name), s"$name:reset:$next", "$ProjectionReset",
      s"""{"epoch":$next}""")))
  }
}
