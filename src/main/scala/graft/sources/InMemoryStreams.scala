package graft.sources

import java.sql.Timestamp
import java.util.UUID
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.model.EventEnvelope

/** S6: node-local in-memory `$mem-` streams.
  *
  * Reference semantics (src/EventStore.Core/Services/Storage/InMemory/):
  *   - `InMemoryLog.cs:13-17` — ONE shared in-memory commit-position
  *     counter per node, separate from the physical log; it exists so the
  *     subscription long-poll machinery can order in-memory commits.
  *   - `SingleEventInMemoryStream.cs:14-140` — each `$mem-` stream retains
  *     ONLY its latest event; event numbers still increase monotonically
  *     across writes. A forward read from ≤ last returns that single
  *     event, from > last returns empty; a backward read from ≥ last (or
  *     from-end = -1) returns it, from < last returns empty. Reads are
  *     always end-of-stream.
  *   - `InMemoryStreamReader.cs:18-57` — a registry dispatches reads by
  *     stream name; an unknown name answers `NoStream`.
  *   - `SystemNames.cs:49-51,70-72` — the `$mem-` prefix and the two
  *     built-in streams `$mem-node-state` / `$mem-gossip`, fed by
  *     `NodeStateListenerService.cs:32-36` / `GossipListenerService.cs:33-45`
  *     (each serializes a JSON payload per state change).
  *   - Excluded from `$all` reads by construction (`InMemoryLog.cs` doc):
  *     routing happens by stream-name prefix in `StorageReaderWorker.cs:49`.
  *
  * Spark-first mapping: these are OPS streams — tiny, node-local, and
  * deliberately non-persisted — so the right home is a driver-side
  * registry, not a distributed dataset. What must still compose with the
  * engine is the READ surface: [[InMemoryStreams.readForwards]] /
  * [[readBackwards]] return the same envelope-schema `DataFrame` every
  * other read path yields (via a 0/1-row `createDataFrame`), so a `$mem-`
  * read drops into any downstream query plan unchanged, and
  * [[InMemoryStreams.route]] gives callers the reference's
  * prefix-dispatch in one call.
  */
object InMemoryStreams {
  /** SystemNames.cs:70-72 */
  val Prefix = "$mem-"
  def isInMemoryStream(streamId: String): Boolean = streamId.startsWith(Prefix)

  /** SystemNames.cs:49-51 */
  val NodeStateStream = "$mem-node-state"
  val GossipStream = "$mem-gossip"

  /** NodeStateListenerService.cs:20 / GossipListenerService.cs:20 */
  val NodeStateChangedEventType = "$NodeStateChanged"
  val GossipUpdatedEventType = "$GossipUpdated"

  /** Read-completed classification (ReadStreamResult analog). */
  sealed trait ReadResult
  case object Success extends ReadResult
  case object NoStream extends ReadResult

  /** The fields of the reference's ReadStreamEvents*Completed messages
    * that carry information in the in-memory case
    * (InMemoryStreamReader.cs:22-36). Reads of `$mem-` streams are always
    * end-of-stream. */
  final case class MemRead(
      result: ReadResult,
      events: Seq[EventEnvelope],
      nextEventNumber: Long,
      lastEventNumber: Long,
      lastCommitPosition: Long)
}

/** InMemoryLog.cs:13-17 — the node-wide in-memory commit-position counter. */
final class InMemoryLog {
  private val pos = new AtomicLong(0L)
  def lastCommitPosition: Long = pos.get()
  def nextCommitPosition: Long = pos.incrementAndGet()
}

/** SingleEventInMemoryStream.cs:14-140. Threading contract mirrors the
  * reference: one writer at a time (writes are synchronized here), reads
  * concurrent with writes see the last fully-written event (@volatile). */
final class SingleEventInMemoryStream(memLog: InMemoryLog, streamName: String) {
  import InMemoryStreams._

  @volatile private var last: Option[EventEnvelope] = None
  private var nextNumber = 0L

  def streamId: String = streamName
  def lastEvent: Option[EventEnvelope] = last

  /** SingleEventInMemoryStream.cs:118-139 — assign the next shared commit
    * position, stamp the next event number, retain only this event. */
  def write(eventType: String, data: String, metadata: String = null): EventEnvelope =
    synchronized {
      val commitPos = memLog.nextCommitPosition
      val ev = EventEnvelope(
        stream_id = streamName,
        event_number = nextNumber,
        event_id = UUID.randomUUID().toString,
        event_type = eventType,
        timestamp = new Timestamp(System.currentTimeMillis()),
        log_position = commitPos,
        correlation_id = null,
        is_json = true,
        data = data,
        metadata = metadata)
      last = Some(ev)
      nextNumber += 1
      ev
    }

  /** SingleEventInMemoryStream.cs:30-72 */
  def readForwards(from: Long): MemRead = last match {
    case None =>
      MemRead(NoStream, Nil, -1L, -1L, memLog.lastCommitPosition)
    case Some(ev) =>
      val events = if (from > ev.event_number) Nil else Seq(ev)
      MemRead(Success, events, ev.event_number + 1, ev.event_number,
        memLog.lastCommitPosition)
  }

  /** SingleEventInMemoryStream.cs:74-116 — `from = -1` reads from end. */
  def readBackwards(from: Long): MemRead = last match {
    case None =>
      MemRead(NoStream, Nil, -1L, -1L, memLog.lastCommitPosition)
    case Some(ev) =>
      val adjusted = if (from < 0) ev.event_number else from
      val events = if (adjusted < ev.event_number) Nil else Seq(ev)
      MemRead(Success, events, -1L, ev.event_number, memLog.lastCommitPosition)
  }
}

/** InMemoryStreamReader.cs:11-57 — the per-node registry + read dispatch,
  * plus DataFrame surfacing so `$mem-` reads compose with the engine's
  * relational read paths. */
final class InMemoryStreams(val memLog: InMemoryLog = new InMemoryLog) {
  import InMemoryStreams._

  private val readers =
    new java.util.concurrent.ConcurrentHashMap[String, SingleEventInMemoryStream]()

  /** Register (or fetch) a `$mem-` stream. The reference wires a fixed
    * dictionary at node startup (ClusterVNode.cs); here registration is
    * open so ops tooling can add streams, but the prefix is enforced. */
  def stream(streamId: String): SingleEventInMemoryStream = {
    require(isInMemoryStream(streamId),
      s"in-memory streams must start with '$Prefix' (SystemNames.cs:70-72): $streamId")
    readers.computeIfAbsent(streamId, new SingleEventInMemoryStream(memLog, _))
  }

  def knownStreams: Seq[String] = {
    import scala.jdk.CollectionConverters._
    readers.keySet().asScala.toSeq.sorted
  }

  /** InMemoryStreamReader.cs:18-36 — unknown stream answers NoStream. */
  def readForwards(streamId: String, from: Long = 0L): MemRead =
    Option(readers.get(streamId)).map(_.readForwards(from))
      .getOrElse(MemRead(NoStream, Nil, -1L, -1L, memLog.lastCommitPosition))

  def readBackwards(streamId: String, from: Long = -1L): MemRead =
    Option(readers.get(streamId)).map(_.readBackwards(from))
      .getOrElse(MemRead(NoStream, Nil, -1L, -1L, memLog.lastCommitPosition))

  /** The read as an envelope-schema DataFrame (0 or 1 row) — identical
    * columns to `EventLogStore.read()`, so a `$mem-` read composes with
    * every downstream operator. */
  def toDF(spark: SparkSession, read: MemRead): DataFrame = {
    val rows = read.events.map(e => Row(
      e.stream_id, e.event_number, e.event_id, e.event_type, e.timestamp,
      e.log_position, e.correlation_id, e.is_json, e.data, e.metadata,
      e.is_redacted))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 1), EventEnvelope.schema)
  }

  /** The reference's StorageReaderWorker routing (StorageReaderWorker.cs:49
    * + SystemNames.cs:70): a `$mem-` stream id answers from this registry,
    * anything else from the durable store. */
  def route(spark: SparkSession, store: EventLogStore, streamId: String): DataFrame =
    if (isInMemoryStream(streamId)) toDF(spark, readForwards(streamId))
    else store.readStreamEvents(streamId)

  // ---- built-in listener streams ------------------------------------

  /** NodeStateListenerService.cs:32-36: serialize the node state change
    * as `{"state": "..."}` to `$mem-node-state`. */
  def nodeStateChanged(state: String): EventEnvelope =
    stream(NodeStateStream).write(
      NodeStateChangedEventType,
      s"""{"state":${jsonStr(state)}}""")

  /** GossipListenerService.cs:33-45: serialize the member list to
    * `$mem-gossip` as `{"nodeId": ..., "members": [...]}`. */
  def gossipUpdated(nodeId: String, members: Seq[String]): EventEnvelope =
    stream(GossipStream).write(
      GossipUpdatedEventType,
      s"""{"nodeId":${jsonStr(nodeId)},"members":[${members.map(jsonStr).mkString(",")}]}""")

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
