package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.projections.LogEvent

/** SUB3: competing-consumer dispatch strategies
  * (src/EventStore.Core/Services/PersistentSubscription/ConsumerStrategy/).
  *
  * The reference dispatches each outstanding message to ONE client of a
  * persistent-subscription group through a pluggable strategy
  * (IPersistentSubscriptionConsumerStrategy.cs):
  *
  *  - RoundRobin (RoundRobinPersistentSubscriptionConsumerStrategy.cs:11-48)
  *    — rotate a client queue; first client with free capacity gets the
  *    message; all-full → NoMoreCapacity.
  *  - DispatchToSingle (DispatchToSingle…cs:8-25) — keep feeding the head
  *    client until it is saturated, only then rotate.
  *  - Pinned (Pinnable…cs:11-105 + PinnedState/PinnedConsumerState.cs) —
  *    hash the SOURCE stream id into 1024 buckets; a bucket is lazily
  *    assigned to the least-assigned connected client; clients joining
  *    trigger a rebalance that moves excess buckets (idle-first), clients
  *    leaving orphan their buckets for reassignment on next push.
  *  - PinnedByCorrelation (PinnedByCorrelation…cs:12-63) — same, but the
  *    assignment source is the `$correlationId` metadata property when
  *    present (falling back to the source stream id).
  *
  * Strategy names: SystemNames.cs:181-197.
  *
  * These are live-dispatch (OLTP) semantics, so the faithful state machine
  * here is driver-side and single-node, exactly like the reference's. The
  * piece that matters at 100 TB is [[ConsumerStrategies.pinnedAssignment]]
  * / [[ConsumerStrategies.roundRobinAssignment]]: the same affinity rules
  * as pure `Column` expressions, for sharding a batch replay or a
  * `foreachBatch` delivery across N workers with stream/correlation
  * stickiness — no state, no shuffle beyond the one the caller already
  * pays.
  *
  * The reference treats the hash as a pluggable `IHasher<string>`
  * (XXHashUnsafe by default); bucket-distribution semantics, not hash
  * identity, are the contract, so this port uses MurmurHash3 (same family
  * Spark's `hash()` uses, keeping driver-side and distributed assignment
  * consistent).
  */
object ConsumerStrategies {
  /** SystemNames.cs:181-197 */
  val RoundRobin = "RoundRobin"
  val DispatchToSingle = "DispatchToSingle"
  val Pinned = "Pinned"
  val PinnedByCorrelation = "PinnedByCorrelation"

  /** PinnedState/PinnedConsumerState.cs:12 */
  val MaxBucketCount = 1024

  /** ConsumerPushResult.cs:6-10 */
  sealed trait PushResult
  case object Sent extends PushResult
  case object Skipped extends PushResult
  case object NoMoreCapacity extends PushResult

  def forName(name: String): ConsumerStrategy = name match {
    case RoundRobin => new RoundRobinStrategy
    case DispatchToSingle => new DispatchToSingleStrategy
    case Pinned => new PinnedStrategy
    case PinnedByCorrelation => new PinnedByCorrelationStrategy
    case other => throw new IllegalArgumentException(
      s"unknown consumer strategy '$other' " +
        s"(PersistentSubscriptionConsumerStrategyRegistry.cs registers " +
        s"$RoundRobin, $DispatchToSingle, $Pinned, $PinnedByCorrelation)")
  }

  /** The assignment-source id of an event (PinnablePersistentSubscription
    * ConsumerStrategy.cs:86-104 GetSourceStreamId): the resolved event's
    * stream when reading through a link, the link body's `n@stream` target
    * for an unresolved `$>`, otherwise the event's own stream. */
  def sourceStreamId(e: LogEvent): String =
    if (e.resolved_stream_id != null) e.resolved_stream_id
    else if (e.event_type == graft.model.EventEnvelope.LinkEventType && e.data != null) {
      val sep = e.data.indexOf('@')
      if (sep >= 0) e.data.substring(sep + 1) else e.data
    } else e.stream_id

  /** PinnedByCorrelation…cs:22-32: `$correlationId` from the metadata JSON
    * when present, else the source stream id. The envelope's materialized
    * `correlation_id` column IS that property extracted at ingest
    * (SURVEY.md §1.3), so it is consulted before falling back. */
  def correlationSourceId(e: LogEvent): String = {
    val fromMeta = correlationFromJson(e.metadata)
    if (fromMeta != null) fromMeta
    else if (e.correlation_id != null) e.correlation_id
    else sourceStreamId(e)
  }

  private[graft] def correlationFromJson(metadata: String): String =
    if (metadata == null) null
    else {
      // Cheap single-property probe, mirroring the reference's streaming
      // JSON scan for the first top-level "$correlationId" string value.
      val key = "\"$correlationId\""
      val i = metadata.indexOf(key)
      if (i < 0) null
      else {
        val rest = metadata.substring(i + key.length).dropWhile(c => c == ':' || c.isWhitespace)
        if (!rest.startsWith("\"")) null
        else {
          val end = rest.indexOf('"', 1)
          if (end < 0) null else rest.substring(1, end)
        }
      }
    }

  private[streaming] def bucketOf(sourceId: String): Int = {
    val h = scala.util.hashing.MurmurHash3.stringHash(sourceId, 0)
    ((h % MaxBucketCount) + MaxBucketCount) % MaxBucketCount
  }

  // ---- distributed batch analogs ------------------------------------

  /** Pinned affinity as a Column: events of one source stream (or
    * correlation id, with `byCorrelation = true`) always land on the same
    * consumer out of `consumers`. The driver-side state machine's lazy
    * least-assigned choice is a liveness optimization; the INVARIANT it
    * maintains — bucket → exactly one consumer, sticky across pushes — is
    * what batch sharding needs, and a fixed bucket→consumer map preserves
    * it with zero state. Usage: `df.withColumn("consumer", ...)` then
    * `repartition(col("consumer"))` → each worker sees full streams. */
  def pinnedAssignment(consumers: Seq[String], byCorrelation: Boolean = false): Column = {
    require(consumers.nonEmpty, "at least one consumer")
    val src =
      if (byCorrelation) coalesce(col("correlation_id"), col("stream_id"))
      else when(col("event_type") === graft.model.EventEnvelope.LinkEventType,
        substring_index(col("data"), "@", -1)).otherwise(col("stream_id"))
    val bucket = pmod(hash(src), lit(MaxBucketCount))
    consumerByIndex(consumers, pmod(bucket, lit(consumers.length)))
  }

  /** RoundRobin as a Column over a delivery batch: the i-th event in log
    * order goes to consumer i % n — the steady-state behavior of the
    * rotating queue when all clients keep capacity. Window over the whole
    * batch; use per-microbatch in foreachBatch. */
  def roundRobinAssignment(consumers: Seq[String]): Column = {
    require(consumers.nonEmpty, "at least one consumer")
    val rn = row_number().over(Window.orderBy(col("log_position"))) - 1
    consumerByIndex(consumers, pmod(rn, lit(consumers.length)))
  }

  private def consumerByIndex(consumers: Seq[String], idx: Column): Column =
    element_at(array(consumers.map(lit): _*), idx + 1)

  /** Convenience: `df` plus a `consumer` column under the named strategy. */
  def assign(df: DataFrame, strategy: String, consumers: Seq[String]): DataFrame =
    strategy match {
      case RoundRobin | DispatchToSingle =>
        // DispatchToSingle's batch analog degenerates to "all to the first
        // consumer until capacity" — capacity is meaningless for a batch
        // shard, so both map to balanced round-robin.
        df.withColumn("consumer", roundRobinAssignment(consumers))
      case Pinned =>
        df.withColumn("consumer", pinnedAssignment(consumers))
      case PinnedByCorrelation =>
        df.withColumn("consumer", pinnedAssignment(consumers, byCorrelation = true))
      case other => throw new IllegalArgumentException(s"unknown strategy '$other'")
    }
}

/** A connected competing consumer — the strategy-facing surface of the
  * reference's PersistentSubscriptionClient (capacity + push + confirm). */
final class ConsumerClient(val clientId: String, val maxInFlight: Int) {
  private val outstanding = mutable.Queue.empty[LogEvent]
  private var confirmListener: (ConsumerClient, LogEvent) => Unit = null

  def inFlight: Int = synchronized(outstanding.size)
  def availableCapacity: Int = synchronized(maxInFlight - outstanding.size)

  /** Accepts iff below capacity (the Push the strategies probe). */
  def push(e: LogEvent): Boolean = synchronized {
    if (outstanding.size >= maxInFlight) false
    else { outstanding.enqueue(e); true }
  }

  /** Ack one delivered event (fires the strategy's EventConfirmed hook —
    * Pinnable…cs:41 wiring). */
  def confirm(): Option[LogEvent] = {
    val (ev, listener) = synchronized {
      if (outstanding.isEmpty) (None, null)
      else (Some(outstanding.dequeue()), confirmListener)
    }
    ev.foreach { e => if (listener != null) listener(this, e) }
    ev
  }

  def delivered: Seq[LogEvent] = synchronized(outstanding.toSeq)

  private[streaming] def onConfirmed(f: (ConsumerClient, LogEvent) => Unit): Unit =
    synchronized { confirmListener = f }
  private[streaming] def clearConfirmed(): Unit =
    synchronized { confirmListener = null }
}

/** IPersistentSubscriptionConsumerStrategy.cs:8-16 */
trait ConsumerStrategy {
  import ConsumerStrategies.PushResult
  def name: String
  def clientAdded(client: ConsumerClient): Unit
  def clientRemoved(client: ConsumerClient): Unit
  def push(message: LogEvent): PushResult
}

/** RoundRobinPersistentSubscriptionConsumerStrategy.cs:11-48 */
class RoundRobinStrategy extends ConsumerStrategy {
  import ConsumerStrategies._
  protected val clients = mutable.Queue.empty[ConsumerClient]

  def name: String = RoundRobin

  def clientAdded(client: ConsumerClient): Unit = clients.enqueue(client)

  def clientRemoved(client: ConsumerClient): Unit = {
    if (!clients.contains(client))
      throw new IllegalStateException("Only added clients can be removed.")
    val remaining = clients.toList.filterNot(_ eq client)
    clients.clear()
    remaining.foreach(clients.enqueue)
  }

  def push(message: LogEvent): PushResult = {
    var i = 0
    val n = clients.size
    while (i < n) {
      val c = clients.dequeue()
      val pushed = c.push(message)
      clients.enqueue(c)
      if (pushed) return Sent
      i += 1
    }
    NoMoreCapacity
  }
}

/** DispatchToSinglePersistentSubscriptionConsumerStrategy.cs:8-25 —
  * saturate the head client before rotating. */
class DispatchToSingleStrategy extends RoundRobinStrategy {
  import ConsumerStrategies._

  override def name: String = DispatchToSingle

  override def push(message: LogEvent): PushResult = {
    var i = 0
    val n = clients.size
    while (i < n) {
      if (clients.head.push(message)) return Sent
      clients.enqueue(clients.dequeue())
      i += 1
    }
    NoMoreCapacity
  }
}

/** PinnablePersistentSubscriptionConsumerStrategy.cs:11-105 +
  * PinnedState/PinnedConsumerState.cs — sticky bucket assignment with
  * join-time rebalance and leave-time orphaning. */
abstract class PinnableStrategy extends ConsumerStrategy {
  import ConsumerStrategies._

  protected def assignmentSourceId(e: LogEvent): String

  // PinnedState/Node.cs + BucketAssignment.cs, collapsed to what the
  // strategy actually reads.
  private final class Node(val client: ConsumerClient) {
    var connected = true
    var assignmentCount = 0
  }
  private object BucketState extends Enumeration { val Unassigned, Assigned, Disconnected = Value }
  private final class Bucket {
    var state = BucketState.Unassigned
    var node: Node = null
    var inFlight = 0
  }

  private val buckets = Array.fill(MaxBucketCount)(new Bucket)
  private val nodes = mutable.ListBuffer.empty[Node]
  private var assignmentCount = 0

  def availableCapacity: Int = synchronized {
    nodes.iterator.filter(_.connected)
      .map(n => n.client.maxInFlight - n.client.inFlight).sum
  }

  /** PinnedConsumerState.cs:76-110 AddNode — rebalance excess buckets
    * (idle-first) from overloaded clients onto the joiner. */
  def clientAdded(client: ConsumerClient): Unit = synchronized {
    val newNode = new Node(client)
    nodes += newNode
    val clientCount = nodes.count(_.connected)
    val maxBalanced = math.ceil(assignmentCount.toDouble / clientCount).toInt
    val moves = mutable.ListBuffer.empty[Int]
    for (existing <- nodes if !(existing eq newNode) && existing.connected) {
      if (existing.assignmentCount > maxBalanced) {
        val candidates = buckets.indices
          .filter(i => (buckets(i).node eq existing) && buckets(i).state == BucketState.Assigned)
          .sortBy(i => buckets(i).inFlight) // idle buckets move first
          .take(existing.assignmentCount - maxBalanced)
        moves ++= candidates
      }
    }
    moves.foreach(applyBucketAssigned(_, newNode))
    nodes.filterInPlace(n => n.connected || n.assignmentCount > 0)
    client.onConfirmed((c, ev) => eventRemoved(c, ev))
  }

  /** PinnedConsumerState.cs:43-74 DisconnectNode. */
  def clientRemoved(client: ConsumerClient): Unit = synchronized {
    val node = nodes.find(_.client eq client).getOrElse(
      throw new IllegalStateException(
        "ClientRemoved was called for a client the consumer strategy didn't have."))
    if (!node.connected) throw new IllegalStateException("already disconnected")
    client.clearConfirmed()
    node.connected = false
    assignmentCount -= node.assignmentCount
    for (b <- buckets if b.node eq node) {
      b.state = BucketState.Disconnected
      b.inFlight = 0
    }
  }

  /** Pinnable…cs:51-72 PushMessageToClient. */
  def push(message: LogEvent): PushResult = synchronized {
    if (availableCapacity == 0) return NoMoreCapacity
    val bucket = bucketOf(assignmentSourceId(message))
    val b = buckets(bucket)
    if (b.state != BucketState.Assigned) assignBucket(bucket)
    if (!buckets(bucket).node.client.push(message)) Skipped
    else { buckets(bucket).inFlight += 1; Sent }
  }

  /** The bucket a message would dispatch into — exposed for tests. */
  def bucketFor(e: LogEvent): Int = bucketOf(assignmentSourceId(e))

  def assignedClientFor(e: LogEvent): Option[String] = synchronized {
    val b = buckets(bucketOf(assignmentSourceId(e)))
    if (b.state == BucketState.Assigned) Some(b.node.client.clientId) else None
  }

  private def eventRemoved(client: ConsumerClient, ev: LogEvent): Unit = synchronized {
    val b = buckets(bucketOf(assignmentSourceId(ev)))
    if (b.node != null && (b.node.client eq client)) b.inFlight -= 1
  }

  /** PinnedConsumerState.cs:118-121 AssignBucket → least-assigned
    * connected node (ChooseClient, cs:146-156). */
  private def assignBucket(bucket: Int): Unit = {
    val node = nodes.iterator.filter(_.connected)
      .minByOption(_.assignmentCount)
      .getOrElse(throw new IllegalStateException("no connected clients"))
    applyBucketAssigned(bucket, node)
  }

  /** PinnedConsumerState.cs:130-144 ApplyBucketAssigned. */
  private def applyBucketAssigned(bucket: Int, node: Node): Unit = {
    val b = buckets(bucket)
    if (b.state != BucketState.Assigned) assignmentCount += 1
    if (b.state != BucketState.Unassigned && b.node != null) b.node.assignmentCount -= 1
    b.state = BucketState.Assigned
    b.node = node
    node.assignmentCount += 1
  }
}

/** PinnedPersistentSubscriptionConsumerStrategy.cs:9-20 */
class PinnedStrategy extends PinnableStrategy {
  def name: String = ConsumerStrategies.Pinned
  protected def assignmentSourceId(e: LogEvent): String =
    ConsumerStrategies.sourceStreamId(e)
}

/** PinnedByCorrelationPersistentSubscriptionConsumerStrategy.cs:12-63 */
class PinnedByCorrelationStrategy extends PinnableStrategy {
  def name: String = ConsumerStrategies.PinnedByCorrelation
  protected def assignmentSourceId(e: LogEvent): String =
    ConsumerStrategies.correlationSourceId(e)
}
