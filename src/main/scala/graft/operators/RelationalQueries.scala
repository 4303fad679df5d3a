package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.sources.Tables

/** Relational capability demonstrations over the TPC-H-ish star schema
  * (SURVEY.md §2.6 gap analysis: the reference has no relational operators;
  * the engine provides them natively through Spark SQL).
  *
  * Scale notes: small dims (region, nation, supplier, part, customer) are
  * broadcast; fact-fact joins shuffle on their keys with AQE enabled.
  */
object RelationalQueries extends QueryModule {

  /** Two-level exact money aggregation (see QueryUtil doc): map-side long
    * cent sums per input partition — the 600k-rows-per-task hot path stays
    * in codegen'd long arithmetic — then an exact decimal merge of the few
    * (group × partition) partial rows. Overflow-safe at any scale. */
  private def q1(s: SparkSession, d: String): DataFrame = {
    import QueryUtil.cents
    val partial = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"), spark_partition_id().as("_pid"))
      .agg(
        sum(cents(col("l_quantity"))).as("_q"),
        sum(cents(col("l_extendedprice"))).as("_p"),
        sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))).as("_r"),
        sum(cents(col("l_discount"))).as("_d"),
        count(lit(1)).as("_n"))
    partial.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (sum(col("_q").cast("decimal(38,0)")).cast("double") / lit(100.0)).as("sum_qty"),
        (sum(col("_p").cast("decimal(38,0)")).cast("double") / lit(100.0)).as("sum_base_price"),
        (sum(col("_r").cast("decimal(38,0)")).cast("double") / lit(10000.0)).as("sum_disc_price"),
        ((sum(col("_d").cast("decimal(38,0)")).cast("double") / lit(100.0)) / sum(col("_n"))).as("avg_disc"),
        sum(col("_n")).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private def q3(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"))
      .agg(QueryUtil.revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }

  private def q5(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d)
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
    import QueryUtil.cents
    val partial = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      // two-level exact sum (see q1): 5 region groups are global-scale totals
      .groupBy(col("r_name"), spark_partition_id().as("_pid"))
      .agg(
        sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))).as("_r"),
        count(lit(1)).as("_n"))
    partial.groupBy(col("r_name"))
      .agg(
        (sum(col("_r").cast("decimal(38,0)")).cast("double") / lit(10000.0)).as("revenue"),
        sum(col("_n")).as("n_items"))
      .orderBy(col("r_name"))
  }

  private def topk(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(25)

  private def semiAnti(s: SparkSession, d: String): DataFrame = {
    // customers with no orders (anti) vs with orders (semi) — counts
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).select(col("o_custkey"))
    val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n")).withColumn("kind", lit("semi"))
    val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n")).withColumn("kind", lit("anti"))
    semi.unionAll(anti).select(col("kind"), col("n")).orderBy(col("kind"))
  }

  private def windowFn(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(s, d)
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    o.select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rn"),
        sum(col("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0)).as("running_total"))
      .where(col("o_custkey") < 20)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Tumbling-window aggregation over the event log — the streaming-window
    * capability the reference lacks (SURVEY §2.6); the same groupBy(window)
    * runs unchanged as a watermarked streaming query
    * (Subscriptions.windowedAgg, StreamingSpec equivalence test). */
  private def windowTumbling(s: SparkSession, d: String): DataFrame =
    Tables.eventLogScan(s, d) // narrow scan: no event_number needed
      .groupBy(window(col("timestamp"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("total"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("total"))
      .orderBy(col("w_start"), col("event_type"))

  /** Distinct-user cardinality per event type (exact, oracle-checked).
    * The approximate HLL path (approx_count_distinct) is asserted within
    * 5% of this in AnalyticsSpec — at 100 TB the HLL sketch replaces the
    * exact distinct's full shuffle with a fixed-size mergeable buffer. */
  private def cardinality(s: SparkSession, d: String): DataFrame =
    Tables.rawEvents(s, d)
      .groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** Deterministic hash-based sampling: a stable ~10% sample keyed by
    * doc_id — reproducible across runs/engines, no RNG state, pushes down
    * to the scan as a plain predicate. The standard way to cut eval/debug
    * slices from a 100 TB corpus. */
  private def sampleDeterministic(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .where(pmod(graft.functions.TextFunctions.hash60(col("doc_id").cast("string")), lit(100L)) < 10)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  /** Session-window aggregation: per-user activity sessions separated by
    * >= 30 minutes of inactivity. Spark's session_window handles the
    * merge-adjacent-windows logic natively (and streams with watermarks);
    * the oracle derives the same sessions with gaps-and-islands SQL. */
  private def sessionWindows(s: SparkSession, d: String): DataFrame =
    Tables.eventLogScan(s, d) // narrow: timestamp/user_id/value only
      .groupBy(session_window(col("timestamp"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 6).as("total"))
      .select(col("w.start").as("sess_start"), col("user_id"),
        col("n_events"), col("total"))
      .where(col("user_id") < 50)
      .orderBy(col("user_id"), col("sess_start"))

  /** Sliding-window aggregation (1h windows every 30m — each event lands
    * in 2 overlapping windows). The oracle expands the window membership
    * explicitly: an event at t belongs to windows starting at
    * bucket30(t) and bucket30(t) − 30m. */
  private def slidingWindows(s: SparkSession, d: String): DataFrame =
    Tables.eventLogScan(s, d) // narrow scan: no event_number needed
      .groupBy(window(col("timestamp"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))
      .orderBy(col("w_start"), col("event_type"))

  /** Hierarchical totals via ROLLUP — a §2.6 capability the reference has
    * no analog for (its only aggregation surface is projection folds). */
  private def rollupAgg(s: SparkSession, d: String): DataFrame = {
    import QueryUtil.cents
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        (sum(cents(col("l_quantity"))).cast("double") / lit(100.0)).as("sum_qty"),
        grouping(col("l_returnflag")).as("g_rf"),
        grouping(col("l_linestatus")).as("g_ls"))
      .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus"))
  }

  /** Exact interpolated percentiles per group (continuous definition —
    * identical formula in Spark `percentile` and DuckDB `quantile_cont`);
    * rounded to 6 digits as the cross-engine contract. At 100 TB swap in
    * `approx_percentile` (t-digest-style sketch) — same query shape. */
  private def percentilesQ(s: SparkSession, d: String): DataFrame =
    Tables.rawEvents(s, d)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.95)"), 6).as("p95"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** As-of join attribution: each click joined to the same user's latest
    * purchase at-or-before it (the classic "which purchase does this
    * click follow" event-analytics question). Purchases pre-aggregate to
    * one row per (user, µs) so the as-of match is deterministic; both
    * engines compare µs integers (ns would diverge on DuckDB's µs
    * truncation). Exercises [[Temporal.asofJoin]]'s union + single-shuffle
    * running-window plan — no range join. */
  private def asofAttrib(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.rawEvents(s, d)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("purchase_ts_us"),
        QueryUtil.cents(col("value")).as("_c"))
      .groupBy(col("user_id"), col("purchase_ts_us"))
      .agg(max(col("_c")).as("purchase_cents"))
    Temporal.asofJoin(clicks, purchases, Seq("user_id"), "ts_us", "purchase_ts_us",
        Seq("purchase_ts_us", "purchase_cents"))
      .orderBy(col("event_id"))
  }

  /** Interval (range) join: each purchase opens a 1-hour attribution
    * window; count the same user's clicks inside it. Exercises
    * [[Temporal.intervalJoin]]'s block-bucketed equi-join plan (blockSize
    * = the window span, so each interval explodes into <= 2 blocks). */
  private def rangeJoinWindow(s: SparkSession, d: String): DataFrame = {
    val hourUs = 3600000000L
    val ev = Tables.rawEvents(s, d)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("win_start"),
        (unix_micros(col("ts")) + hourUs).as("win_end"))
    Temporal.intervalJoin(clicks, purchases, Seq("user_id"),
        "ts_us", "win_start", "win_end", Seq("purchase_id"), blockSize = hourUs)
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_clicks"))
      .orderBy(col("purchase_id"))
  }

  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "asof_join_attrib" -> (asofAttrib _),
    "range_join_window" -> (rangeJoinWindow _),
    "rollup_agg" -> (rollupAgg _),
    "percentiles_value" -> (percentilesQ _),
    "cardinality_distinct" -> (cardinality _),
    "session_window_agg" -> (sessionWindows _),
    "window_sliding_agg" -> (slidingWindows _),
    "sample_deterministic" -> (sampleDeterministic _),
    "q1_agg" -> (q1 _),
    "q3_join" -> (q3 _),
    "q5_multijoin" -> (q5 _),
    "topk_orders" -> (topk _),
    "semi_anti_join" -> (semiAnti _),
    "window_running_sum" -> (windowFn _),
    "window_tumbling_agg" -> (windowTumbling _)
  )

  def oracles: Seq[(String, String)] = Seq(
    "asof_join_attrib" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us
        |  FROM events WHERE event_type = 'click'),
        |pur AS (
        |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS purchase_ts_us,
        |         max(CAST(round(value * 100) AS BIGINT)) AS purchase_cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.event_id, c.user_id, c.ts_us, p.purchase_ts_us, p.purchase_cents
        |FROM clicks c ASOF LEFT JOIN pur p
        |  ON c.user_id = p.user_id AND c.ts_us >= p.purchase_ts_us
        |ORDER BY c.event_id""".stripMargin,
    "range_join_window" ->
      """WITH clicks AS (
        |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us
        |  FROM events WHERE event_type = 'click'),
        |pur AS (
        |  SELECT event_id AS purchase_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS s
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.purchase_id, CAST(count(*) AS BIGINT) AS n_clicks
        |FROM pur p JOIN clicks c
        |  ON c.user_id = p.user_id AND c.ts_us >= p.s AND c.ts_us < p.s + 3600000000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "rollup_agg" ->
      s"""SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
        |  ${QueryUtil.dsumSql("l_quantity")} AS sum_qty,
        |  CAST(CASE WHEN GROUPING(l_returnflag) THEN 1 ELSE 0 END AS TINYINT) AS g_rf,
        |  CAST(CASE WHEN GROUPING(l_linestatus) THEN 1 ELSE 0 END AS TINYINT) AS g_ls
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin,
    "percentiles_value" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.95), 6) AS p95,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
        |  ${QueryUtil.dsumSql("l_quantity")} AS sum_qty,
        |  ${QueryUtil.dsumSql("l_extendedprice")} AS sum_base_price,
        |  ${QueryUtil.revenueSumSql("l_extendedprice", "l_discount")} AS sum_disc_price,
        |  ${QueryUtil.davgSql("l_discount")} AS avg_disc,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q3_join" ->
      s"""SELECT l_orderkey,
        |  ${QueryUtil.revenueSumSql("l_extendedprice", "l_discount")} AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_multijoin" ->
      s"""SELECT r_name,
        |  ${QueryUtil.revenueSumSql("l_extendedprice", "l_discount")} AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "topk_orders" ->
      """SELECT o_orderkey, o_totalprice, o_orderdate
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "semi_anti_join" ->
      """SELECT 'anti' AS kind, CAST(count(*) AS BIGINT) AS n FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'semi' AS kind, CAST(count(*) AS BIGINT) AS n FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY kind""".stripMargin,
    "window_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(row_number() OVER w AS INT) AS rn,
        |  sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_total
        |FROM orders
        |WHERE o_custkey < 20
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,
    "cardinality_distinct" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "sample_deterministic" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 10
        |ORDER BY doc_id""".stripMargin,
    "window_sliding_agg" ->
      s"""${Tables.eventLogSql},
        |expanded AS (
        |  SELECT event_type,
        |    unnest([time_bucket(INTERVAL 30 MINUTE, timestamp),
        |            time_bucket(INTERVAL 30 MINUTE, timestamp) - INTERVAL 30 MINUTE]) AS w_start
        |  FROM log)
        |SELECT w_start, event_type, CAST(count(*) AS BIGINT) AS n
        |FROM expanded GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "session_window_agg" ->
      s"""${Tables.eventLogSql},
        |marked AS (
        |  SELECT user_id, timestamp, value,
        |    CASE WHEN timestamp - lag(timestamp) OVER w >= INTERVAL 30 MINUTE
        |         OR lag(timestamp) OVER w IS NULL THEN 1 ELSE 0 END AS brk
        |  FROM log WHERE user_id < 50
        |  WINDOW w AS (PARTITION BY user_id ORDER BY timestamp)),
        |sessions AS (
        |  SELECT user_id, timestamp, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY timestamp
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM marked)
        |SELECT min(timestamp) AS sess_start, user_id,
        |  CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 6) AS total
        |FROM sessions GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_start""".stripMargin,
    "window_tumbling_agg" ->
      s"""${Tables.eventLogSql}
        |SELECT date_trunc('hour', timestamp) AS w_start, event_type,
        |  CAST(count(*) AS BIGINT) AS n, round(sum(value), 6) AS total
        |FROM log GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
