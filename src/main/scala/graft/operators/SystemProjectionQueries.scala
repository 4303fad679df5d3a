package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.sources.Tables

/** Correctness-gate queries for the five system projections (SURVEY.md §2.4)
  * and link resolution. */
object SystemProjectionQueries extends QueryModule {

  private def log(s: SparkSession, d: String): DataFrame = Tables.eventLog(s, d)

  /** SYS1: $by_category over a log that also contains separator-less and
    * system streams (added literally) — those must be skipped / categorized
    * per the first-separator extractor. */
  private def sys1(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val extra = Seq(
      ("nosep", 1L), ("multi-part-stream", 2L), ("$sys-x", 3L))
      .toDF("stream_id", "log_position")
    val all = Tables.eventLogScan(s, d) // narrow scan
      .select(col("stream_id"), col("log_position")).unionAll(extra)
    SystemProjections.byCategory(all)
      .groupBy(col("category")).agg(count(lit(1)).as("n"))
      .orderBy(col("category"))
  }

  /** SYS1: one `$ce-{category}` stream read in log order. */
  private def sys1Stream(s: SparkSession, d: String): DataFrame =
    SystemProjections.categoryStream(log(s, d), "purchase")
      .select(col("stream_id"), col("event_number"), col("log_position"))
      .limit(50)

  /** SYS2: `$et-{type}` stream read. */
  private def sys2(s: SparkSession, d: String): DataFrame =
    SystemProjections.eventTypeStream(log(s, d), "signup")
      .select(col("stream_id"), col("event_number"), col("log_position"), col("value"))
      .limit(50)

  /** SYS2 aggregate view: per event type count + position range. */
  private def sys2Agg(s: SparkSession, d: String): DataFrame =
    SystemProjections.byEventType(Tables.eventLogScan(s, d)) // narrow scan
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("log_position")).as("min_pos"),
        max(col("log_position")).as("max_pos"))
      .orderBy(col("event_type"))

  /** SYS3: $stream_by_category table. */
  private def sys3(s: SparkSession, d: String): DataFrame =
    SystemProjections.streamByCategory(Tables.eventLogScan(s, d)) // narrow: no event_number
      .orderBy(col("category"), col("stream_id"))

  /** SYS4: $streams table. */
  private def sys4(s: SparkSession, d: String): DataFrame =
    SystemProjections.streams(log(s, d))
      .orderBy(col("stream_id"))

  /** SYS5: $by_correlation_id — group by the correlation id. */
  private def sys5(s: SparkSession, d: String): DataFrame =
    SystemProjections.byCorrelationId(Tables.eventLogScan(s, d)) // narrow scan
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n"), QueryUtil.dsum(col("value")).as("sum_value"))
      .orderBy(col("cid"))

  /** Link build + resolve round-trip (P14 mechanics over batch). */
  private def links(s: SparkSession, d: String): DataFrame = {
    val src = SystemProjections.eventTypeStream(log(s, d), "purchase").limit(20)
    val linkRows = Links.linkTo(src, "$et-purchase")
    Links.resolve(linkRows, log(s, d))
      .select(col("stream_id"), col("event_number"), col("data"),
        col("resolved_stream_id"), col("resolved_event_number"),
        col("resolved_event_type"), col("resolved_log_position"))
      .orderBy(col("event_number"))
  }

  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "sys1_by_category" -> (sys1 _),
    "sys1_category_stream" -> (sys1Stream _),
    "sys2_event_type_stream" -> (sys2 _),
    "sys2_by_event_type_agg" -> (sys2Agg _),
    "sys3_stream_by_category" -> (sys3 _),
    "sys4_streams" -> (sys4 _),
    "sys5_by_correlation_id" -> (sys5 _),
    "p14_link_resolution" -> (links _)
  )

  private val L = Tables.eventLogSql

  def oracles: Seq[(String, String)] = Seq(
    "sys1_by_category" -> s"""$L,
      |united AS (
      |  SELECT stream_id FROM log
      |  UNION ALL
      |  SELECT * FROM (VALUES ('nosep'), ('multi-part-stream'), ('$$sys-x')) t(stream_id)
      |)
      |SELECT CASE WHEN contains(stream_id, '-') THEN split_part(stream_id, '-', 1) END AS category,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM united WHERE contains(stream_id, '-')
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sys1_category_stream" -> s"""$L
      |SELECT stream_id, event_number, log_position
      |FROM log WHERE split_part(stream_id, '-', 1) = 'purchase'
      |ORDER BY log_position LIMIT 50""".stripMargin,
    "sys2_event_type_stream" -> s"""$L
      |SELECT stream_id, event_number, log_position, value
      |FROM log WHERE event_type = 'signup'
      |ORDER BY log_position LIMIT 50""".stripMargin,
    "sys2_by_event_type_agg" -> s"""$L
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |       min(log_position) AS min_pos, max(log_position) AS max_pos
      |FROM log WHERE event_type <> '$$>' AND NOT starts_with(stream_id, '$$')
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sys3_stream_by_category" -> s"""$L
      |SELECT split_part(stream_id, '-', 1) AS category, stream_id,
      |       min(log_position) AS first_log_position
      |FROM log WHERE contains(stream_id, '-')
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "sys4_streams" -> s"""$L
      |SELECT stream_id, min(log_position) AS first_log_position,
      |       max(event_number) AS last_event_number
      |FROM log GROUP BY 1 ORDER BY 1""".stripMargin,
    "sys5_by_correlation_id" -> s"""$L
      |SELECT correlation_id AS cid, CAST(count(*) AS BIGINT) AS n, ${QueryUtil.dsumSql("value")} AS sum_value
      |FROM log WHERE correlation_id IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "p14_link_resolution" -> s"""$L,
      |src AS (
      |  SELECT * FROM log WHERE event_type = 'purchase' AND NOT starts_with(stream_id, '$$')
      |  ORDER BY log_position LIMIT 20),
      |links AS (
      |  SELECT '$$et-purchase' AS stream_id,
      |         CAST(row_number() OVER (ORDER BY src.log_position) - 1 AS BIGINT) AS event_number,
      |         CAST(src.event_number AS VARCHAR) || '@' || src.stream_id AS data,
      |         src.stream_id AS resolved_stream_id, src.event_number AS resolved_event_number,
      |         src.event_type AS resolved_event_type, src.log_position AS resolved_log_position
      |  FROM src)
      |SELECT stream_id, event_number, data, resolved_stream_id, resolved_event_number,
      |       resolved_event_type, resolved_log_position
      |FROM links ORDER BY event_number""".stripMargin
  )
}
