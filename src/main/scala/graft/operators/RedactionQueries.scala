package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.sources.{EventLogStore, Tables}

/** Correctness-gate query for event redaction (SURVEY.md §2.1; reference
  * PrepareFlags.IsRedacted — PrepareLogRecord.cs:30,65).
  *
  * The full round trip the reference performs out-of-band: ingest a
  * bounded slice into a real [[EventLogStore]], redact fixed events
  * ([[EventLogStore.redact]] — the chunk-switch analog), then read the
  * streams back through the positional reader. Redacted events come back
  * with `is_redacted = true` and EMPTY data; every other envelope field
  * (type, correlation, numbering) is intact — exactly what the
  * reference's reader surfaces (Convert.cs:349). The DuckDB oracle
  * recomputes the expectation from the raw events table.
  */
object RedactionQueries extends QueryModule {

  private val Streams = Seq("purchase-1", "click-1")
  /** Redacted (stream, event_number) fixture — all present at sf0.001+
    * (purchase-1 has ≥7 events, click-1 ≥14 at the smallest SF). */
  private val Redactions =
    Seq(("purchase-1", 1L), ("purchase-1", 3L), ("click-1", 0L))

  /** One prepared (ingested + redacted) store dir per sf dir: the bench's
    * warmup + timed pass read the same store rather than re-ingesting.
    * Keyed by (sf dir, events fingerprint) — the prepared layout is a
    * pure function of the input data, so a regenerated events table at
    * the same path re-ingests instead of serving the stale store.
    * TempDirs' shutdown hook bounds the temp dirs to the JVM run. */
  private val prepared = new Tables.FingerprintMemo[String]

  private def preparedDir(s: SparkSession, d: String): String =
    prepared.getOrElseUpdate(d, s"$d/events.parquet") {
        val dir = graft.TempDirs.create("graft_redact")
        val store = new EventLogStore(s, dir)
        val slice = Tables.eventLog(s, d)
          .where(col("stream_id").isin(Streams: _*))
          // numeric ingest order (event_id is a stringified long here, so
          // the default string sort would misorder "10" before "9")
          .withColumn("_seq", col("event_id").cast("long"))
          .select("stream_id", "event_id", "event_type", "timestamp",
            "correlation_id", "data", "metadata", "_seq")
        store.appendBulk(slice, orderBy = Seq("_seq"))
        Redactions.foreach { case (sid, en) => store.redact(sid, en) }
        dir
    }

  /** S5-adjacent: positional read of streams containing redacted events —
    * flag surfaced, data scrubbed, envelope intact. */
  private def redactedRead(s: SparkSession, d: String): DataFrame = {
    val store = new EventLogStore(s, preparedDir(s, d))
    val log = store.read()
    Streams.map(sid => Reads.readStreamForwards(log, sid))
      .reduce(_ unionByName _)
      .select(col("stream_id"), col("event_number"), col("event_type"),
        col("is_redacted"), col("data"), col("correlation_id"))
      .orderBy(col("stream_id"), col("event_number"))
  }

  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "s5_redacted_read" -> (redactedRead _)
  )

  private val L = Tables.eventLogSql
  private val RedactedPred =
    """((stream_id = 'purchase-1' AND event_number IN (1, 3))
      |  OR (stream_id = 'click-1' AND event_number = 0))""".stripMargin

  def oracles: Seq[(String, String)] = Seq(
    "s5_redacted_read" -> s"""$L
      |SELECT stream_id, event_number, event_type,
      |       $RedactedPred AS is_redacted,
      |       CASE WHEN $RedactedPred THEN '' ELSE data END AS data,
      |       correlation_id
      |FROM log WHERE stream_id IN ('purchase-1', 'click-1')
      |ORDER BY stream_id, event_number""".stripMargin
  )
}
