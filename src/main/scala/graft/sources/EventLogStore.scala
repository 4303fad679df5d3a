package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.{EventEnvelope, ExpectedVersion}

/** Append-only event-log storage (SURVEY.md §2.1 S1, §7 step 1).
  *
  * Layout: parquet under `path`, partitioned by `p_date` (UTC date of the
  * event timestamp) with rows sorted by (stream_id, event_number) inside
  * files. At 100 TB this gives: time-range partition pruning for $all /
  * maxAge reads, and parquet row-group min/max stats on stream_id for
  * single-stream reads (the moral equivalent of the reference's PTable
  * index — SURVEY.md §4). A side table `_stats` holds per-stream last event
  * number + the global max position so appends don't rescan the log.
  *
  * Semantics mirrored from the reference:
  *  - optimistic concurrency on append with expected version
  *    {Any, NoStream, StreamExists, exact} (ExpectedVersion.cs:6-13;
  *    Streams.Append.cs) — violations raise WrongExpectedVersionException;
  *  - idempotency by event_id within the appended batch and against the
  *    existing log (EventRecord.cs EventId);
  *  - log_position: monotone global order assigned at commit
  *    (collapsed TFPos — TFPos.cs:41-47);
  *  - soft delete = `$tb` metadata, hard delete = `$streamDeleted`
  *    tombstone event (PrepareLogRecord.cs:23, docs/streams.md:65-120).
  *
  * Single-writer discipline: one ingest job owns a log directory (the
  * reference is equally single-writer per log). Readers are unlimited.
  */
final case class PendingEvent(
    stream_id: String,
    event_id: String,
    event_type: String,
    data: String,
    metadata: String = null,
    correlation_id: String = null,
    timestamp: java.sql.Timestamp = null)

final class WrongExpectedVersionException(msg: String) extends RuntimeException(msg)

class EventLogStore(spark: SparkSession, path: String) {
  import spark.implicits._

  private def logDir = s"$path/log"

  def exists: Boolean = new java.io.File(logDir).exists()

  /** The whole log in envelope form. */
  def read(): DataFrame =
    if (!exists) spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      EventEnvelope.schema.add("p_date", "date"))
    else spark.read.parquet(logDir)

  /** The log with read-time retention applied (metastreams + tombstones
    * honored) — what a reference reader sees. */
  def readRetained(asOf: org.apache.spark.sql.Column = current_timestamp()): DataFrame = {
    val log = read()
    val meta = graft.operators.Retention.metadataFromLog(log)
    graft.operators.Retention.applyRetention(
      log.where(!col("stream_id").startsWith(EventEnvelope.MetastreamPrefix)), meta, asOf)
  }

  private def currentStats(): (Long, Map[String, Long]) = {
    if (!exists) return (-1L, Map.empty)
    val rows = read().groupBy(col("stream_id"))
      .agg(max(col("event_number")).as("last"), max(col("log_position")).as("maxpos"))
      .collect()
    val maxPos = if (rows.isEmpty) -1L else rows.map(_.getLong(2)).max
    (maxPos, rows.map(r => r.getString(0) -> r.getLong(1)).toMap)
  }

  /** Append a batch of events. `expected` maps stream -> expected version
    * (ExpectedVersion.Any if absent). Returns count actually appended
    * (idempotent duplicates are dropped). */
  def append(events: Seq[PendingEvent],
      expected: Map[String, Long] = Map.empty): Long = {
    if (events.isEmpty) return 0L
    val (maxPos, lastByStream) = currentStats()

    // Expected-version checks (IndexWriter/Streams.Append semantics)
    expected.foreach { case (sid, ev) =>
      val last = lastByStream.getOrElse(sid, ExpectedVersion.NoStream)
      ev match {
        case ExpectedVersion.Any => ()
        case ExpectedVersion.NoStream =>
          if (last != ExpectedVersion.NoStream) throw new WrongExpectedVersionException(
            s"stream $sid: expected NoStream but last event is $last")
        case ExpectedVersion.StreamExists =>
          if (last == ExpectedVersion.NoStream) throw new WrongExpectedVersionException(
            s"stream $sid: expected StreamExists but stream is absent")
        case exact =>
          if (last != exact) throw new WrongExpectedVersionException(
            s"stream $sid: expected version $exact but last event is $last")
      }
    }

    // Tombstone check: appends to hard-deleted streams are forbidden
    val deleted = if (exists)
      read().where(col("event_type") === EventEnvelope.StreamDeletedEventType)
        .select("stream_id").as[String].collect().toSet
      else Set.empty[String]
    events.find(e => deleted.contains(e.stream_id)).foreach { e =>
      throw new WrongExpectedVersionException(s"stream ${e.stream_id} is deleted")
    }

    // Idempotency: drop events whose event_id already exists (bounded
    // lookup: only streams being appended to), then in-batch dedup.
    val targetStreams = events.map(_.stream_id).distinct
    val existingIds: Set[String] = if (exists)
      read().where(col("stream_id").isin(targetStreams: _*))
        .select("event_id").as[String].collect().toSet
      else Set.empty
    val fresh = events.filterNot(e => existingIds.contains(e.event_id))
      .distinctBy(_.event_id)
    if (fresh.isEmpty) return 0L

    val now = new java.sql.Timestamp(System.currentTimeMillis())
    val numbered = fresh.zipWithIndex.map { case (e, i) =>
      (e, maxPos + 1 + i)
    }
    val perStream = scala.collection.mutable.Map[String, Long]() ++ lastByStream
    val rows = numbered.map { case (e, pos) =>
      val next = perStream.getOrElse(e.stream_id, -1L) + 1
      perStream(e.stream_id) = next
      (e.stream_id, next, e.event_id, e.event_type,
        Option(e.timestamp).getOrElse(now), pos, e.correlation_id,
        true, e.data, e.metadata)
    }
    val df = rows.toDF("stream_id", "event_number", "event_id", "event_type",
        "timestamp", "log_position", "correlation_id", "is_json", "data", "metadata")
      .withColumn("p_date", to_date(col("timestamp")))
    df.repartition(1)
      .sortWithinPartitions(col("stream_id"), col("event_number"))
      .write.mode(SaveMode.Append).partitionBy("p_date").parquet(logDir)
    fresh.size.toLong
  }

  /** Distributed append for large DataFrames of pending events (ingest
    * path): assigns positions via sorted zipWithIndex — no single-partition
    * window, scales to arbitrary batch sizes. Skips per-event expected
    * version (bulk ingest is ExpectedVersion.Any by definition). */
  def appendBulk(pending: DataFrame, orderBy: Seq[String] = Seq("timestamp", "event_id")): Long = {
    val (maxPos, _) = currentStats()
    val lasts = if (exists)
      read().groupBy(col("stream_id").as("_sid")).agg(max("event_number").as("_last"))
      else spark.emptyDataFrame.select(lit("").as("_sid"), lit(-1L).as("_last")).limit(0)
    val sorted = pending.orderBy(orderBy.map(col): _*)
    val schema = sorted.schema
    val withPos = spark.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ (maxPos + 1 + i)) },
      schema.add("log_position", "long"))
    val wStream = Window.partitionBy(col("stream_id")).orderBy(col("log_position"))
    val out = withPos
      .join(lasts, col("stream_id") === col("_sid"), "left")
      .withColumn("event_number",
        coalesce(col("_last"), lit(-1L)) + row_number().over(wStream))
      .drop("_sid", "_last")
      .withColumn("timestamp", coalesce(col("timestamp"), current_timestamp()))
      .withColumn("is_json", lit(true))
      .withColumn("p_date", to_date(col("timestamp")))
      .select("stream_id", "event_number", "event_id", "event_type", "timestamp",
        "log_position", "correlation_id", "is_json", "data", "metadata", "p_date")
    out.write.mode(SaveMode.Append).partitionBy("p_date").parquet(logDir)
    pending.count()
  }

  /** Set stream metadata: appends a `$metadata` event to `$$<stream>`. */
  def setMetadata(streamId: String, maxCount: Option[Long] = None,
      maxAgeSec: Option[Long] = None, truncateBefore: Option[Long] = None): Unit = {
    val body = Seq(
      maxCount.map(v => s""""$$maxCount":$v"""),
      maxAgeSec.map(v => s""""$$maxAge":$v"""),
      truncateBefore.map(v => s""""$$tb":$v""")
    ).flatten.mkString("{", ",", "}")
    append(Seq(PendingEvent(
      EventEnvelope.MetastreamPrefix + streamId,
      java.util.UUID.randomUUID().toString, "$metadata", body)))
  }

  /** Soft delete: truncate the whole stream ($tb = last + 1 — streams.md). */
  def softDelete(streamId: String): Unit = {
    val (_, lasts) = currentStats()
    val last = lasts.getOrElse(streamId, -1L)
    setMetadata(streamId, truncateBefore = Some(last + 1))
  }

  /** Hard delete: append a tombstone; the stream can never be recreated. */
  def tombstone(streamId: String): Unit =
    append(Seq(PendingEvent(streamId, java.util.UUID.randomUUID().toString,
      EventEnvelope.StreamDeletedEventType, null)))

  /** Scavenge (§2.7): physically rewrite the log keeping only rows a reader
    * can still see (retention + tombstones applied). Restartable: writes to
    * a temp dir, then swaps. */
  def scavenge(asOf: org.apache.spark.sql.Column = current_timestamp()): Unit = {
    val keep = readRetained(asOf)
      .unionByName(read().where(col("stream_id").startsWith(EventEnvelope.MetastreamPrefix)),
        allowMissingColumns = true)
    val tmp = s"$path/log_scavenged"
    keep.drop("p_date").withColumn("p_date", to_date(col("timestamp")))
      .write.mode(SaveMode.Overwrite).partitionBy("p_date").parquet(tmp)
    val fs = new java.io.File(logDir)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
    }
    rm(fs)
    new java.io.File(tmp).renameTo(fs)
  }
}
