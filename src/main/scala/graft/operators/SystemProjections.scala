package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.EventEnvelope

/** The five system projections (SURVEY.md §2.4), computed as derived
  * tables/columns instead of materialized link streams — semantically equal
  * modulo link resolution, which [[Links.resolve]] provides for parity.
  *
  * Reference implementations (all C#):
  *   - $by_category: Standard/CategorizeEventsByStreamPath.cs:17-90
  *   - $by_event_type: Standard/IndexEventsByEventType.cs:28-110
  *   - $stream_by_category: Standard/CategorizeStreamByPath.cs:15-90
  *   - $streams: Standard/IndexStreams.cs:15-87
  *   - $by_correlation_id: Standard/ByCorrelationId.cs:22-56
  *
  * The category extractor splits the stream id at the FIRST or LAST
  * occurrence of the separator (default "-"):
  * Standard/StreamCategoryExtractor.cs:13-60.
  */
object SystemProjections {

  /** Category of a stream id: prefix before the first separator.
    * ("first" position extractor; events in streams without the separator
    * get no category and are skipped by $by_category.) */
  def categoryFirst(streamId: Column, sep: String = "-"): Column =
    when(streamId.contains(sep), substring_index(streamId, sep, 1))

  /** "last" position extractor: everything before the last separator. */
  def categoryLast(streamId: Column, sep: String = "-"): Column =
    when(streamId.contains(sep),
      expr(s"substring(stream_id, 1, length(stream_id) - instr(reverse(stream_id), '$sep'))"))

  /** SYS1 $by_category: every event annotated with its category — the
    * derived-column form of the `$ce-{category}` link streams. */
  def byCategory(log: DataFrame, sep: String = "-"): DataFrame =
    log.withColumn("category", categoryFirst(col("stream_id"), sep))
      .where(col("category").isNotNull)

  /** Read one `$ce-{category}` stream: all events whose source stream is in
    * the category, in global log order (link order in the reference). */
  def categoryStream(log: DataFrame, category: String, sep: String = "-"): DataFrame =
    byCategory(log, sep).where(col("category") === category)
      .orderBy(col("log_position"))

  /** SYS2 $by_event_type: `$et-{type}` partition. Skips link events
    * themselves (IndexEventsByEventType.cs:55-63 skips `$>`). */
  def byEventType(log: DataFrame): DataFrame =
    log.where(col("event_type") =!= EventEnvelope.LinkEventType &&
      !col("stream_id").startsWith("$"))

  def eventTypeStream(log: DataFrame, eventType: String): DataFrame =
    byEventType(log).where(col("event_type") === eventType)
      .orderBy(col("log_position"))

  /** SYS3 $stream_by_category: one row per (category, stream) — the
    * `$category-{cat}` streams. The reference links the stream's first
    * event; we carry its position. */
  def streamByCategory(log: DataFrame, sep: String = "-"): DataFrame =
    byCategory(log, sep)
      .groupBy(col("category"), col("stream_id"))
      .agg(min(col("log_position")).as("first_log_position"))

  /** SYS4 $streams: one row per stream (link to event 0 in the reference). */
  def streams(log: DataFrame): DataFrame =
    log.groupBy(col("stream_id"))
      .agg(min(col("log_position")).as("first_log_position"),
        max(col("event_number")).as("last_event_number"))

  /** SYS5 $by_correlation_id: events keyed by a correlation-id property read
    * from metadata JSON (default `$correlationId` —
    * ByCorrelationId.cs:22-56). Our envelope also carries a first-class
    * correlation_id column; `property=None` uses it. */
  def byCorrelationId(log: DataFrame, property: Option[String] = None): DataFrame = {
    val cid = property match {
      case Some(p) => get_json_object(col("metadata"), s"$$.$p")
      case None => col("correlation_id")
    }
    log.withColumn("cid", cid).where(col("cid").isNotNull)
  }
}

/** Link events (`$>`) and link resolution (SURVEY.md §1.1, §2.6).
  * Reference: ResolvedEvent.cs:8-29; resolution in
  * StorageReaderWorker.cs:676-723. A link's body is `"{eventNumber}@{streamId}"`. */
object Links {

  /** Build link rows pointing at `events`, targeting stream `toStream`.
    * Event numbers are assigned by a distributed range-sort + zipWithIndex
    * (the appendBulk pattern) — NOT a single-partition window, so building
    * a `$ce-`-sized link stream never serializes the category through one
    * task. */
  def linkTo(events: DataFrame, toStream: String): DataFrame = {
    val spark = events.sparkSession
    val sorted = events.select(
      col("event_number").as("_src_number"),
      col("stream_id").as("_src_stream"),
      col("log_position")).orderBy(col("log_position"))
    val schema = sorted.schema
    val withIdx = spark.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) },
      schema.add("event_number", "long"))
    withIdx.select(
      lit(toStream).as("stream_id"),
      col("event_number"),
      lit(EventEnvelope.LinkEventType).as("event_type"),
      concat(col("_src_number").cast("string"), lit("@"), col("_src_stream")).as("data"),
      col("log_position").as("caused_by_position"))
  }

  /** Multi-target variant: `targetCol` names the link stream per row (the
    * shape of `$by_category`'s many `$ce-*` streams built in one pass).
    * Numbering is per target stream — a window PARTITIONED by target, which
    * shuffles once on the natural key and never funnels to one task. */
  def linkToEach(events: DataFrame, targetCol: Column): DataFrame =
    events.select(
      targetCol.as("stream_id"),
      (row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(targetCol).orderBy(col("log_position"))).cast("long") - 1L)
        .as("event_number"),
      lit(EventEnvelope.LinkEventType).as("event_type"),
      concat(col("event_number").cast("string"), lit("@"), col("stream_id")).as("data"),
      col("log_position").as("caused_by_position"))

  /** Resolve link rows against the log: parse `n@stream` and join to the
    * target events. Columns of the target get prefix `resolved_`. LEFT
    * join on purpose: a link whose target is gone (scavenged, `$tb`-
    * truncated, tombstoned — or a malformed payload) SURVIVES with null
    * `resolved_*` fields, the reference's failed-resolution contract
    * (StorageReaderWorker.cs:676-723 ResolveLinkToEvent returns
    * ResolvedEvent.ForFailedResolvedLink / ForUnresolvedEvent — the read
    * never silently drops the link record). */
  def resolve(links: DataFrame, log: DataFrame): DataFrame = {
    val parsed = links.withColumn("_target_stream",
        expr("substring(data, instr(data, '@') + 1)"))
      .withColumn("_target_number",
        expr("TRY_CAST(substring(data, 1, instr(data, '@') - 1) AS BIGINT)"))
    val target = log.select(
      col("stream_id").as("_target_stream"),
      col("event_number").as("_target_number"),
      col("event_type").as("resolved_event_type"),
      col("log_position").as("resolved_log_position"),
      col("data").as("resolved_data"))
    parsed.join(target, Seq("_target_stream", "_target_number"), "left")
      .withColumnRenamed("_target_stream", "resolved_stream_id")
      .withColumnRenamed("_target_number", "resolved_event_number")
  }

  /** Read-through-links view of a log (`resolveLinkTos` / a projection's
    * `options({$includeLinks: true})`): `$>` rows keep their LINK identity
    * in `stream_id`/`event_number`/`log_position` (source filters,
    * foreachStream partitioning, and read order all follow the stream
    * being READ) while `event_type`/`data`/`value`/`metadata` come from
    * the TARGET event and `resolved_stream_id`/`resolved_event_number`
    * carry its identity — the reference's ResolvedEvent original/resolved
    * split. The link's own metadata is exposed as `link_metadata`
    * (ResolvedEvent.PositionMetadata → the JS envelope's
    * linkMetadataRaw). Non-link rows pass through with the new columns
    * null.
    *
    * Unresolvable links — target scavenged, `$tb`-truncated away,
    * stream tombstoned, or a malformed `n@stream` payload — SURVIVE as
    * themselves: the row keeps the link's own identity, `$>` type, raw
    * payload and metadata, with null resolved fields. That is the
    * reference's failed-resolution contract (StorageReaderWorker.cs:
    * 676-723: ReadEventResult.Success → ForResolvedLink, anything else →
    * ForFailedResolvedLink / ForUnresolvedEvent — the LINK record is
    * always delivered, never dropped), so readers observe the dangling
    * link exactly like a reference subscriber whose ResolvedEvent.Event
    * is null.
    *
    * Scale shape: one equi-join of the (usually small) link slice against
    * the log on (stream_id, event_number) — parquet bloom/stats prune the
    * probe side; the pass-through side is a narrow filter, no shuffle. */
  def resolveInline(log: DataFrame): DataFrame = {
    val isLink = col("event_type") === EventEnvelope.LinkEventType
    def metaOf(df: DataFrame): Column =
      if (df.columns.contains("metadata")) col("metadata")
      else lit(null).cast("string")
    def valueOf(df: DataFrame): Column =
      if (df.columns.contains("value")) col("value") else lit(0.0)
    def idOf(df: DataFrame): Column =
      if (df.columns.contains("event_id")) col("event_id")
      else lit(null).cast("string")
    val plain = log.where(!isLink)
      .withColumn("link_metadata", lit(null).cast("string"))
      .withColumn("resolved_stream_id", lit(null).cast("string"))
      .withColumn("resolved_event_number", lit(-1L))
    val linkSide = log.where(isLink).select(
      col("stream_id"), col("event_number"), col("log_position"),
      col("timestamp"), col("correlation_id"),
      col("data").as("_link_data"),
      metaOf(log).as("_link_meta"),
      idOf(log).as("_link_id"),
      valueOf(log).as("_link_value"),
      expr("substring(data, instr(data, '@') + 1)").as("_t_stream"),
      expr("TRY_CAST(substring(data, 1, instr(data, '@') - 1) AS BIGINT)").as("_t_num"))
    val targetSide = log.where(!isLink).select(
      col("stream_id").as("_t_stream"),
      col("event_number").as("_t_num"),
      lit(true).as("_hit"),
      col("event_type").as("_t_type"), col("data").as("_t_data"),
      valueOf(log).as("_t_value"),
      metaOf(log).as("_t_meta"),
      idOf(log).as("_t_id"))
    val hit = coalesce(col("_hit"), lit(false))
    val resolved = linkSide
      .join(targetSide, Seq("_t_stream", "_t_num"), "left")
      // failed resolution: the link event IS the delivered event — own
      // type/payload/metadata, no resolved identity, no link_metadata
      // (this is not a through-link read of anything)
      .withColumn("event_type", when(hit, col("_t_type"))
        .otherwise(lit(EventEnvelope.LinkEventType)))
      .withColumn("data", when(hit, col("_t_data")).otherwise(col("_link_data")))
      .withColumn("value", when(hit, col("_t_value")).otherwise(col("_link_value")))
      .withColumn("metadata", when(hit, col("_t_meta")).otherwise(col("_link_meta")))
      .withColumn("event_id", when(hit, col("_t_id")).otherwise(col("_link_id")))
      .withColumn("link_metadata", when(hit, col("_link_meta")).otherwise(lit(null).cast("string")))
      .withColumn("resolved_stream_id", when(hit, col("_t_stream")).otherwise(lit(null).cast("string")))
      .withColumn("resolved_event_number", when(hit, col("_t_num")).otherwise(lit(-1L)))
      .drop("_t_stream", "_t_num", "_hit", "_t_type", "_t_data", "_t_value",
        "_t_meta", "_t_id", "_link_data", "_link_meta", "_link_id", "_link_value")
    val common = resolved.columns.toSet.intersect(plain.columns.toSet).toSeq
    plain.select(common.map(col): _*)
      .unionByName(resolved.select(common.map(col): _*))
  }
}
