package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.sources.Tables

/** Correctness-gate queries for read-time retention + deletion semantics
  * (SURVEY.md §2.2 R1, §2.1 S5). A fixed metadata fixture exercises every
  * path: maxCount, truncateBefore, maxAge, tombstone (hard delete) and
  * $tb=MaxValue (soft delete); untouched streams pass through. */
object RetentionQueries extends QueryModule {

  /** Fixed "now" so maxAge results are deterministic and replayable. */
  private val AsOf = "2024-03-01 00:00:00"
  private val MaxLong = Long.MaxValue // 9223372036854775807

  private def metaFixture(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("purchase-3", Some(5L), Option.empty[Long], Option.empty[Long], false),
      ("click-2", None, None, Some(4L), false),
      ("view-1", None, Some(30L * 86400), None, false),
      ("error-0", None, None, None, true),
      ("signup-2", None, None, Some(MaxLong), false)
    ).toDF("stream_id", "max_count", "max_age_sec", "truncate_before", "tombstoned")
  }

  private def retained(s: SparkSession, d: String): DataFrame =
    Retention.applyRetention(Tables.eventLog(s, d), metaFixture(s),
      to_timestamp(lit(AsOf)))

  /** R1: per-stream summary after retention, for the fixture streams. */
  private def r1Summary(s: SparkSession, d: String): DataFrame =
    retained(s, d)
      .where(col("stream_id").isin("purchase-3", "click-2", "view-1",
        "error-0", "signup-2", "view-2"))
      .groupBy(col("stream_id"))
      .agg(count(lit(1)).as("n"),
        min(col("event_number")).as("min_en"),
        max(col("event_number")).as("max_en"))
      .orderBy(col("stream_id"))

  /** S5: reading a deleted stream yields no events (soft + hard). The read
    * goes through the same retention-aware path as any other read. */
  private def s5Deleted(s: SparkSession, d: String): DataFrame = {
    val r = retained(s, d)
    val hard = Reads.readStreamForwards(r, "error-0")
      .agg(count(lit(1)).as("n")).withColumn("kind", lit("hard_deleted"))
    val soft = Reads.readStreamForwards(r, "signup-2")
      .agg(count(lit(1)).as("n")).withColumn("kind", lit("soft_deleted"))
    val live = Reads.readStreamForwards(r, "click-2")
      .agg(count(lit(1)).as("n")).withColumn("kind", lit("live_truncated"))
    hard.unionAll(soft).unionAll(live).select(col("kind"), col("n"))
      .orderBy(col("kind"))
  }

  /** R1 + S2: positional read interacts with the retention lower bound —
    * start below minEventNumber gets clamped up (IndexReader.cs:264). */
  private def r1Read(s: SparkSession, d: String): DataFrame =
    Reads.readStreamForwards(retained(s, d), "purchase-3", from = 0, maxCount = 3)
      .select(col("stream_id"), col("event_number"), col("log_position"), col("value"))

  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "r1_retention_summary" -> (r1Summary _),
    "r1_retention_read_clamp" -> (r1Read _),
    "s5_deleted_streams" -> (s5Deleted _)
  )

  private val L = Tables.eventLogSql
  /** Shared oracle CTE: bounds + retained log, mirroring Retention.applyRetention. */
  private def retainedSql: String =
    s"""$L,
      |meta(stream_id, max_count, max_age_sec, truncate_before, tombstoned) AS (VALUES
      |  ('purchase-3', CAST(5 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), false),
      |  ('click-2', NULL, NULL, CAST(4 AS BIGINT), false),
      |  ('view-1', NULL, CAST(2592000 AS BIGINT), NULL, false),
      |  ('error-0', NULL, NULL, NULL, true),
      |  ('signup-2', NULL, NULL, CAST(9223372036854775807 AS BIGINT), false)),
      |lasts AS (SELECT stream_id, max(event_number) AS _last FROM log GROUP BY 1),
      |bounds AS (
      |  SELECT lasts.stream_id,
      |    greatest(0,
      |      CASE WHEN m.max_count IS NOT NULL THEN lasts._last - m.max_count + 1 ELSE 0 END,
      |      coalesce(m.truncate_before, 0)) AS min_en,
      |    CASE WHEN m.max_age_sec IS NOT NULL
      |         THEN TIMESTAMP '$AsOf' - to_seconds(m.max_age_sec) END AS cutoff_ts,
      |    (coalesce(m.tombstoned, false)
      |      OR coalesce(m.truncate_before, 0) = 9223372036854775807) AS deleted
      |  FROM lasts LEFT JOIN meta m ON lasts.stream_id = m.stream_id),
      |retained AS (
      |  SELECT log.* FROM log JOIN bounds ON log.stream_id = bounds.stream_id
      |  WHERE NOT bounds.deleted AND log.event_number >= bounds.min_en
      |    AND (bounds.cutoff_ts IS NULL OR log.timestamp >= bounds.cutoff_ts))""".stripMargin

  def oracles: Seq[(String, String)] = Seq(
    "r1_retention_summary" -> s"""$retainedSql
      |SELECT stream_id, CAST(count(*) AS BIGINT) AS n,
      |       min(event_number) AS min_en, max(event_number) AS max_en
      |FROM retained
      |WHERE stream_id IN ('purchase-3','click-2','view-1','error-0','signup-2','view-2')
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "r1_retention_read_clamp" -> s"""$retainedSql
      |SELECT stream_id, event_number, log_position, value
      |FROM retained WHERE stream_id = 'purchase-3' AND event_number >= 0
      |ORDER BY event_number LIMIT 3""".stripMargin,
    "s5_deleted_streams" -> s"""$retainedSql
      |SELECT 'hard_deleted' AS kind, CAST(count(*) AS BIGINT) AS n FROM retained WHERE stream_id='error-0'
      |UNION ALL
      |SELECT 'live_truncated', CAST(count(*) AS BIGINT) FROM retained WHERE stream_id='click-2'
      |UNION ALL
      |SELECT 'soft_deleted', CAST(count(*) AS BIGINT) FROM retained WHERE stream_id='signup-2'
      |ORDER BY kind""".stripMargin
  )
}
