package graft.projections

import org.apache.spark.sql.{Dataset, SaveMode}
import org.apache.spark.sql.functions._
import graft.sources.EventLogStore

/** P21: exactly-once emitted streams (SURVEY §2.3).
  *
  * The reference's EmittedStream (722 LoC) writes emitted events with
  * expected-version tracking so projection replays don't duplicate. The
  * Spark shape: every emitted event gets a DETERMINISTIC event_id
  * `{projection}:{partition}:{causedByPosition}:{emitSeq}` — a pure
  * function of its cause — and the append dedups against the target log
  * by event_id with a distributed anti-join. Re-running the projection
  * (full or resumed) re-derives identical ids, so replays are no-ops. */
object EmittedSink {

  /** Deterministic idempotency key for an emitted event. The projection
    * tag carries the epoch after a reset (`name@2`) so post-reset re-runs
    * produce FRESH ids — pre-reset events stay in the raw log (truncated,
    * invisible) without swallowing the re-emit (ManagedProjection's
    * epoch-on-Reset semantics). */
  def eventId(projectionTag: String): org.apache.spark.sql.Column =
    concat_ws(":", lit(projectionTag), col("partition"),
      col("caused_by_position"), col("emit_seq"))

  /** Append emitted events into `store`'s log idempotently. Returns the
    * number of NEW events written (0 on a pure replay). Also maintains
    * the `$projections-{name}-emittedstreams` registry (reference
    * ProjectionNamesBuilder.GetEmittedStreamsName) that
    * [[ProjectionLifecycle.reset]] uses to find and truncate emitted streams. */
  def appendIdempotent(store: EventLogStore, projection: String,
      emitted: Dataset[Emitted]): Long = {
    val spark = emitted.sparkSession
    val epoch = ProjectionLifecycle.epoch(store, projection)
    val tag = if (epoch == 0) projection else s"$projection@$epoch"
    // registry first: a crash between the two commits leaves a stream
    // registered but empty (harmless); the reverse order could leave
    // emitted events invisible to a later reset
    registerEmittedStreams(store, projection, tag, emitted)
    // engine provenance fields + the handler's ExtraMetaData keys (the
    // reference merges ExtraMetaData into the emitted event's metadata
    // JSON the same way — EmittedDataEvent)
    val pending = emitted.toDF()
      .withColumn("event_id", eventId(tag))
      .withColumn("correlation_id", lit(null).cast("string"))
      .withColumn("metadata",
        concat(lit("""{"$causedBy":"""), col("caused_by_position"),
          lit(""","$projection":""""), lit(projection), lit("\""),
          when(col("metadata").isNotNull && length(col("metadata")) > 2,
            concat(lit(","), expr("substring(metadata, 2, length(metadata) - 2)")))
            .otherwise(lit("")),
          lit("}")))
      .withColumn("timestamp", lit(null).cast("timestamp"))
      .select("stream_id", "event_id", "event_type", "data", "metadata",
        "correlation_id", "timestamp", "caused_by_position")
    val existing = store.read().select(col("event_id").as("_eid"))
    val fresh = pending
      .join(existing, col("event_id") === col("_eid"), "left_anti")
      .dropDuplicates("event_id")
    // positions assigned in cause order → emitted streams replay stably;
    // an all-duplicate replay is a cheap no-op inside appendBulk (the
    // lineage runs once against its persisted output)
    store.appendBulk(fresh, orderBy = Seq("caused_by_position", "event_id"))
  }

  /** Record the distinct target streams of this batch into the
    * projection's emittedstreams registry, idempotently per (epoch,
    * stream). One row per NEW stream — cheap (`distinct` over stream ids,
    * anti-joined like the events themselves). */
  private def registerEmittedStreams(store: EventLogStore, projection: String,
      tag: String, emitted: Dataset[Emitted]): Unit = {
    val registry = ProjectionLifecycle.emittedStreamsStream(projection)
    val pending = emitted.toDF()
      .select(col("stream_id").as("data")).distinct()
      .select(
        lit(registry).as("stream_id"),
        concat_ws(":", lit(tag), lit("es"), col("data")).as("event_id"),
        lit("$StreamTracked").as("event_type"),
        col("data"),
        lit(null).cast("string").as("metadata"),
        lit(null).cast("string").as("correlation_id"),
        lit(null).cast("timestamp").as("timestamp"))
    val existing = store.read().select(col("event_id").as("_eid"))
    val fresh = pending.join(existing, col("event_id") === col("_eid"), "left_anti")
    store.appendBulk(fresh, orderBy = Seq("event_id"))
  }
}
