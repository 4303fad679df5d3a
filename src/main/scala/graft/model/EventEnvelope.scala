package graft.model

import org.apache.spark.sql.types._

/** Canonical event envelope of the engine.
  *
  * Mirrors the reference's `EventRecord`
  * (reference: src/EventStore.Core/Data/EventRecord.cs:18-30) re-expressed
  * as a fixed Spark schema: the envelope is strongly typed, the body
  * (`data`/`metadata`) stays dynamic JSON parsed on demand.
  *
  * The reference's global order is a TFPos pair
  * (src/EventStore.Core/Data/TFPos.cs:9-47); public ordering is total, so we
  * collapse it to a single monotone `log_position: Long` assigned at ingest
  * (SURVEY.md §7).
  */
final case class EventEnvelope(
    stream_id: String,
    event_number: Long,
    event_id: String,
    event_type: String,
    timestamp: java.sql.Timestamp,
    log_position: Long,
    correlation_id: String,
    is_json: Boolean,
    data: String,
    metadata: String,
    is_redacted: Boolean = false)

object EventEnvelope {
  val schema: StructType = StructType(Seq(
    StructField("stream_id", StringType, nullable = false),
    StructField("event_number", LongType, nullable = false),
    StructField("event_id", StringType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("timestamp", TimestampType, nullable = true),
    StructField("log_position", LongType, nullable = false),
    StructField("correlation_id", StringType, nullable = true),
    StructField("is_json", BooleanType, nullable = false),
    StructField("data", StringType, nullable = true),
    StructField("metadata", StringType, nullable = true),
    // PrepareFlags.IsRedacted (PrepareLogRecord.cs:30): readers return
    // empty data for flagged events (PrepareLogRecord.cs:65) and surface
    // the flag (Convert.cs:349) — see graft.operators.Redaction
    StructField("is_redacted", BooleanType, nullable = false)
  ))

  /** Event type of a link event (reference: `$>` — ResolvedEvent.cs:8-29). */
  val LinkEventType = "$>"
  /** Event type of a stream-reference link (reference: `$@` —
    * JintProjectionStateHandler.cs:329-352 linkStreamTo). */
  val StreamLinkEventType = "$@"
  /** Tombstone event type (hard delete; PrepareLogRecord.cs:23). */
  val StreamDeletedEventType = "$streamDeleted"
  /** Metastream prefix (stream metadata lives in `$$<stream>`). */
  val MetastreamPrefix = "$$"
  /** System stream prefix. */
  val SystemPrefix = "$"
}

/** Stream metadata, parsed from `$$<stream>` metastream JSON bodies.
  * Mirrors reference StreamMetadata (src/EventStore.Core/Data/StreamMetadata.cs:17-52):
  * maxCount, maxAge (seconds), truncateBefore ($tb), cacheControl
  * ($cacheControl, seconds — a serving-layer HTTP cache hint with no
  * batch-read semantics; parsed and round-tripped for API completeness,
  * never applied by any read path). */
final case class StreamMeta(
    stream_id: String,
    max_count: Option[Long],
    max_age_sec: Option[Long],
    truncate_before: Option[Long],
    tombstoned: Boolean,
    cache_control_sec: Option[Long] = None)

object ExpectedVersion {
  /** reference: src/EventStore.Core/Data/ExpectedVersion.cs:6-13 */
  val Any: Long = -2L
  val NoStream: Long = -1L
  val StreamExists: Long = -4L
}
