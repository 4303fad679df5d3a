package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Positional stream / $all reads (SURVEY.md §2.1 S2/S3/S4).
  *
  * Reference semantics: ReadStream forward/backward scans one stream from
  * `fromEventNumber` up to `maxCount` events
  * (src/EventStore.Core/Services/Storage/ReaderIndex/IndexReader.cs:226-306);
  * ReadAll scans the global log from a position in TFPos order
  * (ReaderIndex/AllReader.cs:62-100), optionally with a server-side event
  * filter (AllReader.cs:100-170).
  *
  * Spark-first: each read is a declarative plan
  * `scan → filter(stream && range) → sort → limit`; Catalyst pushes the
  * stream/position predicates into the parquet scan, so at scale the read
  * touches only the row groups whose min/max stats overlap — the moral
  * equivalent of the reference's PTable index lookup (SURVEY.md §4).
  */
object Reads {

  /** S2: read one stream forwards from `from` (inclusive), up to `maxCount`. */
  def readStreamForwards(log: DataFrame, streamId: String, from: Long = 0L,
      maxCount: Long = Long.MaxValue): DataFrame = {
    val base = Redaction.scrub(log)
      .where(col("stream_id") === streamId && col("event_number") >= from)
      .orderBy(col("event_number"))
    if (maxCount == Long.MaxValue) base else base.limit(clampInt(maxCount))
  }

  /** S2: read one stream backwards from `from` (inclusive; -1 = from end). */
  def readStreamBackwards(log: DataFrame, streamId: String, from: Long = -1L,
      maxCount: Long = Long.MaxValue): DataFrame = {
    val src = Redaction.scrub(log)
    val bounded = if (from < 0) src.where(col("stream_id") === streamId)
      else src.where(col("stream_id") === streamId && col("event_number") <= from)
    val base = bounded.orderBy(col("event_number").desc)
    if (maxCount == Long.MaxValue) base else base.limit(clampInt(maxCount))
  }

  /** S3: read the whole log forwards from a global position (inclusive). */
  def readAllForwards(log: DataFrame, fromPosition: Long = 0L,
      maxCount: Long = Long.MaxValue, filter: Column = lit(true)): DataFrame = {
    val base = Redaction.scrub(log)
      .where(col("log_position") >= fromPosition && filter)
      .orderBy(col("log_position"))
    if (maxCount == Long.MaxValue) base else base.limit(clampInt(maxCount))
  }

  /** S3: read the whole log backwards from a global position (inclusive). */
  def readAllBackwards(log: DataFrame, fromPosition: Long = Long.MaxValue,
      maxCount: Long = Long.MaxValue, filter: Column = lit(true)): DataFrame = {
    val base = Redaction.scrub(log)
      .where(col("log_position") <= fromPosition && filter)
      .orderBy(col("log_position").desc)
    if (maxCount == Long.MaxValue) base else base.limit(clampInt(maxCount))
  }

  private def clampInt(n: Long): Int =
    if (n > Int.MaxValue) Int.MaxValue else n.toInt
}

/** Server-side event filters (SURVEY.md §2.2 F1–F5).
  * Reference: src/EventStore.Core/Services/Storage/ReaderIndex/EventFilter.cs.
  * Each is a plain `Column` predicate so Catalyst can push it into the scan.
  */
object EventFilters {
  /** F1: stream-id prefix filter (EventFilter.cs:138-153). */
  def streamPrefix(prefixes: Seq[String]): Column =
    prefixes.map(p => col("stream_id").startsWith(p)).reduce(_ || _)

  /** F2: stream-id regex filter (EventFilter.cs:189-204). */
  def streamRegex(re: String): Column = col("stream_id").rlike(re)

  /** F3: event-type prefix filter (EventFilter.cs:155-170). */
  def eventTypePrefix(prefixes: Seq[String]): Column =
    prefixes.map(p => col("event_type").startsWith(p)).reduce(_ || _)

  /** F4: event-type regex filter (EventFilter.cs:172-187). */
  def eventTypeRegex(re: String): Column = col("event_type").rlike(re)

  /** F5: default $all filter (EventFilter.cs:66-135). First-match-wins rules:
    * non-`$` streams allowed; `$epoch-information` denied;
    * `$persistentsubscription-$all::*-checkpoint` / `*-parked` denied
    * (with the reference's minimum-length guard); every other system stream
    * is allowed by default. */
  def defaultAllFilter: Column = {
    val s = col("stream_id")
    val psAll = "$persistentsubscription-$all::"
    def prefixSuffix(suffix: String): Column =
      s.startsWith(psAll) && s.endsWith(suffix) &&
        length(s) >= (psAll.length + suffix.length)
    val denied = (s === "$epoch-information") ||
      prefixSuffix("-checkpoint") || prefixSuffix("-parked")
    !denied
  }
}
