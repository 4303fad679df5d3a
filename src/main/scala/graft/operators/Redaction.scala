package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Read-time redaction scrubbing (SURVEY.md §2.1).
  *
  * Reference: `PrepareFlags.IsRedacted = 0x200`
  * (src/EventStore.Core/TransactionLog/LogRecords/PrepareLogRecord.cs:30).
  * The reference scrubs at the lowest record-materialization layer: a
  * prepare whose IsRedacted flag is set returns NoData for `Data`
  * regardless of the bytes on disk (PrepareLogRecord.cs:65), and the flag
  * itself is surfaced to readers
  * (Services/Transport/Http/Convert.cs:349 `richEntry.IsRedacted`).
  *
  * Spark-first analog: one conditional Column rewrite applied by every
  * reader — redacted ⇒ empty `data`, envelope (event type, metadata,
  * correlation id, positions) intact. The rewrite sits above the scan as
  * a plain Project, so pushdown of stream/position predicates is
  * unaffected and the whole thing stays inside codegen.
  *
  * Defensive by design: the flag wins even when payload bytes are still
  * present on disk. [[graft.sources.EventLogStore.redact]] also blanks
  * the bytes physically (the analog of the reference's chunk switch,
  * Services/RedactionService.cs), but a log written by an external tool
  * might set the flag without scrubbing — readers must not leak it.
  */
object Redaction {
  /** Envelope flag column name. */
  val Flag = "is_redacted"

  /** Scrub a log frame: redacted rows read with empty `data`. No-op (and
    * no added column) when the frame does not carry the flag — the
    * driver's raw testdata adapter and pre-redaction frames keep their
    * exact schema. Idempotent. */
  def scrub(log: DataFrame): DataFrame =
    if (log.columns.contains(Flag))
      log.withColumn("data",
        when(coalesce(col(Flag), lit(false)), lit("")).otherwise(col("data")))
    else log
}
