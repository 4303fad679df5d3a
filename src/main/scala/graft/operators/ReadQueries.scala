package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.sources.Tables

/** Correctness-gate queries for S2/S3/S4 reads and F1–F5 filters over the
  * envelope view of the driver's `events` table (SURVEY.md §2.1–2.2). */
object ReadQueries extends QueryModule {

  private val outCols = Seq("stream_id", "event_number", "event_type",
    "log_position", "correlation_id", "value").map(col)

  private def log(s: SparkSession, d: String): DataFrame = Tables.eventLog(s, d)

  private def s2Fwd(s: SparkSession, d: String): DataFrame =
    Reads.readStreamForwards(log(s, d), "purchase-7", from = 2, maxCount = 20)
      .select(outCols :+ unix_micros(col("timestamp")).as("ts_us"): _*)

  private def s2Bwd(s: SparkSession, d: String): DataFrame =
    Reads.readStreamBackwards(log(s, d), "click-3", maxCount = 15)
      .select(outCols: _*)

  private def s3Fwd(s: SparkSession, d: String): DataFrame =
    Reads.readAllForwards(log(s, d), fromPosition = 100, maxCount = 50,
        filter = EventFilters.defaultAllFilter)
      .select(outCols: _*)

  private def s3Bwd(s: SparkSession, d: String): DataFrame =
    Reads.readAllBackwards(log(s, d), maxCount = 40)
      .select(outCols: _*)

  private def s4Filtered(s: SparkSession, d: String): DataFrame =
    Reads.readAllForwards(log(s, d), fromPosition = 0, maxCount = 100,
        filter = EventFilters.eventTypePrefix(Seq("pur", "sig")))
      .select(outCols: _*)

  private def f1Prefix(s: SparkSession, d: String): DataFrame =
    Tables.eventLogScan(s, d) // narrow: no event_number needed
      .where(EventFilters.streamPrefix(Seq("error-", "view-1")))
      .groupBy(col("stream_id"))
      .agg(count(lit(1)).as("n"), QueryUtil.dsum(col("value")).as("sum_value"))
      .orderBy(col("stream_id"))

  private def f2Regex(s: SparkSession, d: String): DataFrame =
    Tables.eventLogScan(s, d) // narrow scan
      .where(EventFilters.streamRegex("^(error|view)-1[0-9]$"))
      .groupBy(col("stream_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("stream_id"))

  private def f4EtRegex(s: SparkSession, d: String): DataFrame =
    Tables.eventLogScan(s, d) // narrow scan
      .where(EventFilters.eventTypeRegex("^(sign|clic)"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** F5 over a log with synthetic system streams mixed in: real events plus
    * four literal housekeeping rows; the default filter must drop exactly
    * the `$epoch-information` + PS-to-$all checkpoint/parked rows while
    * keeping `$settings` (system streams are allowed by default). */
  private def f5Default(s: SparkSession, d: String): DataFrame = {
    val sys = Seq(
      ("$epoch-information", -1L),
      ("$persistentsubscription-$all::group1-checkpoint", -2L),
      ("$persistentsubscription-$all::group1-parked", -3L),
      ("$settings", -4L))
    import s.implicits._
    val sysDf = sys.toDF("stream_id", "log_position")
    val all = Tables.eventLogScan(s, d) // narrow: 2 columns, pruned at parquet
      .select(col("stream_id"), col("log_position"))
      .unionAll(sysDf)
    all.where(EventFilters.defaultAllFilter)
      .groupBy(col("stream_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("stream_id"))
  }

  /** Dynamic JSON body parsing (SURVEY §1.2: payloads are schemaless JSON
    * parsed lazily, JintProjectionStateHandler.cs:868-880). The body field
    * `k` is extracted on demand with get_json_object — measured the right
    * tool for a SINGLE field (×3 sf0.1: 0.56 s vs 0.69 s through
    * parse_json+variant_get, which pays the full variant encode for one
    * get — BASELINE.md r14). The variant-native sibling
    * [[jsonBodyVariant]] covers the multi-get shape where the one-time
    * parse amortizes. No schema migration needed when bodies evolve. */
  private def jsonBodyAgg(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Tables.eventLogScan(s, d) // narrow: event_type + data only
      .select(col("event_type"),
        get_json_object(col("data"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        count_distinct(col("k")).as("n_distinct_k"))
      .orderBy(col("event_type"))

  /** The same schemaless body through Spark 4's native VariantType
    * (SURVEY §1.3): `try_parse_json` builds the binary variant ONCE per
    * row and every typed `try_variant_get` reads from it — the dispatch
    * the JS column compiler already uses for `e.body`, and the right
    * shape once handlers touch several fields (get_json_object re-scans
    * the text per field). Extracts `k` three typed ways from one parse:
    * as a long, as a string (digit length), and as a top-level typeof. */
  private def jsonBodyVariant(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Tables.eventLogScan(s, d) // narrow: event_type + data only
      .select(col("event_type"), try_parse_json(col("data")).as("v"))
      .select(col("event_type"),
        try_variant_get(col("v"), "$.k", "long").as("k"),
        length(try_variant_get(col("v"), "$.k", "string")).as("k_digits"),
        schema_of_variant(try_variant_get(col("v"), "$.k", "variant")).as("k_type"))
      .groupBy(col("event_type"), col("k_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        sum(col("k_digits")).cast("long").as("sum_digits"))
      .orderBy(col("event_type"), col("k_type"))

  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "json_body_agg" -> (jsonBodyAgg _),
    "json_body_variant" -> (jsonBodyVariant _),
    "s2_read_stream_forwards" -> (s2Fwd _),
    "s2_read_stream_backwards" -> (s2Bwd _),
    "s3_read_all_forwards" -> (s3Fwd _),
    "s3_read_all_backwards" -> (s3Bwd _),
    "s4_read_all_filtered" -> (s4Filtered _),
    "f1_stream_prefix" -> (f1Prefix _),
    "f2_stream_regex" -> (f2Regex _),
    "f4_event_type_regex" -> (f4EtRegex _),
    "f5_default_all_filter" -> (f5Default _)
  )

  private val L = Tables.eventLogSql

  def oracles: Seq[(String, String)] = Seq(
    "json_body_agg" -> s"""$L
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(json_extract_string(data, '$$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(count(DISTINCT CAST(json_extract_string(data, '$$.k') AS BIGINT)) AS BIGINT) AS n_distinct_k
      |FROM log GROUP BY 1 ORDER BY 1""".stripMargin,
    // k_type DERIVED per row to match schema_of_variant's naming, with
    // every mapping established by probing Spark 4.1 (r15): integral
    // fits-in-long → BIGINT; oversized integral → DECIMAL(p,0) with p =
    // digit count; fractional → DECIMAL(p,s) of the NORMALIZED literal
    // (both engines normalize "1.50" → "1.5"); exponent-form numbers →
    // DOUBLE (detected off the RAW event text — json_type can't tell
    // 1e5 from 100000.0); strings/bools/null → STRING/BOOLEAN/VOID.
    // sum_k mirrors Spark's variant→long coercions: numeric truncation
    // toward zero (1.5 → 1, via trunc over DOUBLE), integer-literal
    // strings cast, booleans as 1/0, everything else NULL. A future
    // testdata row with a missing or non-numeric k thus produces the
    // same groups AND the same sums Spark sees instead of silently
    // diverging from a hardcoded 'BIGINT'.
    "json_body_variant" -> s"""$L
      |, typed AS (
      |  SELECT event_type,
      |    json_type(data, '$$.k') AS jt,
      |    json_extract_string(data, '$$.k') AS s,
      |    regexp_extract(data, '"k"\\s*:\\s*([-+0-9.eE]+)', 1) AS raw
      |  FROM log),
      |mapped AS (
      |  SELECT event_type,
      |    CASE jt
      |      WHEN 'UBIGINT' THEN
      |        CASE WHEN TRY_CAST(s AS BIGINT) IS NOT NULL THEN 'BIGINT'
      |             ELSE 'DECIMAL(' || len(s) || ',0)' END
      |      WHEN 'BIGINT' THEN 'BIGINT'
      |      WHEN 'DOUBLE' THEN
      |        CASE WHEN raw LIKE '%e%' OR raw LIKE '%E%' THEN 'DOUBLE'
      |             ELSE 'DECIMAL(' || len(replace(replace(s, '-', ''), '.', ''))
      |                  || ',' || (len(s) - strpos(s, '.')) || ')' END
      |      WHEN 'VARCHAR' THEN 'STRING' WHEN 'BOOLEAN' THEN 'BOOLEAN'
      |      WHEN 'NULL' THEN 'VOID'
      |      ELSE jt END AS k_type,
      |    CASE
      |      WHEN jt IN ('UBIGINT', 'BIGINT') THEN TRY_CAST(s AS BIGINT)
      |      WHEN jt = 'DOUBLE' THEN TRY_CAST(trunc(TRY_CAST(s AS DOUBLE)) AS BIGINT)
      |      WHEN jt = 'VARCHAR' AND regexp_matches(trim(s), '^[+-]?[0-9]+$$')
      |        THEN TRY_CAST(trim(s) AS BIGINT)
      |      WHEN jt = 'BOOLEAN' THEN CASE WHEN s = 'true' THEN 1 ELSE 0 END
      |      ELSE NULL END AS k,
      |    len(s) AS k_digits
      |  FROM typed)
      |SELECT event_type, k_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(k) AS BIGINT) AS sum_k,
      |  CAST(sum(k_digits) AS BIGINT) AS sum_digits
      |FROM mapped GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "s2_read_stream_forwards" -> s"""$L
      |SELECT stream_id, event_number, event_type, log_position, correlation_id, value,
      |       CAST(epoch_us(timestamp) AS BIGINT) AS ts_us
      |FROM log WHERE stream_id = 'purchase-7' AND event_number >= 2
      |ORDER BY event_number LIMIT 20""".stripMargin,
    "s2_read_stream_backwards" -> s"""$L
      |SELECT stream_id, event_number, event_type, log_position, correlation_id, value
      |FROM log WHERE stream_id = 'click-3'
      |ORDER BY event_number DESC LIMIT 15""".stripMargin,
    "s3_read_all_forwards" -> s"""$L
      |SELECT stream_id, event_number, event_type, log_position, correlation_id, value
      |FROM log WHERE log_position >= 100
      |ORDER BY log_position LIMIT 50""".stripMargin,
    "s3_read_all_backwards" -> s"""$L
      |SELECT stream_id, event_number, event_type, log_position, correlation_id, value
      |FROM log
      |ORDER BY log_position DESC LIMIT 40""".stripMargin,
    "s4_read_all_filtered" -> s"""$L
      |SELECT stream_id, event_number, event_type, log_position, correlation_id, value
      |FROM log
      |WHERE starts_with(event_type, 'pur') OR starts_with(event_type, 'sig')
      |ORDER BY log_position LIMIT 100""".stripMargin,
    "f1_stream_prefix" -> s"""$L
      |SELECT stream_id, CAST(count(*) AS BIGINT) AS n, ${QueryUtil.dsumSql("value")} AS sum_value
      |FROM log
      |WHERE starts_with(stream_id, 'error-') OR starts_with(stream_id, 'view-1')
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "f2_stream_regex" -> s"""$L
      |SELECT stream_id, CAST(count(*) AS BIGINT) AS n
      |FROM log WHERE regexp_matches(stream_id, '^(error|view)-1[0-9]$$')
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "f4_event_type_regex" -> s"""$L
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n
      |FROM log WHERE regexp_matches(event_type, '^(sign|clic)')
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "f5_default_all_filter" -> s"""$L,
      |united AS (
      |  SELECT stream_id FROM log
      |  UNION ALL
      |  SELECT * FROM (VALUES ('$$epoch-information'),
      |    ('$$persistentsubscription-$$all::group1-checkpoint'),
      |    ('$$persistentsubscription-$$all::group1-parked'),
      |    ('$$settings')) t(stream_id)
      |)
      |SELECT stream_id, CAST(count(*) AS BIGINT) AS n FROM united
      |WHERE NOT (stream_id = '$$epoch-information'
      |  OR (starts_with(stream_id, '$$persistentsubscription-$$all::')
      |      AND ends_with(stream_id, '-checkpoint'))
      |  OR (starts_with(stream_id, '$$persistentsubscription-$$all::')
      |      AND ends_with(stream_id, '-parked')))
      |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
