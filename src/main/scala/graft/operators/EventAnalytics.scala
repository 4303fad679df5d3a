package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryModule
import graft.sources.Tables

/** Event-sequence analytics over the log — funnel conversion and cohort
  * retention, the two queries every event-log consumer asks first
  * (SURVEY.md §2.6 relational-gap extensions: the reference can only
  * express these as hand-written JS folds; here they are declarative
  * plans Catalyst can optimize).
  *
  * Scale design:
  *  - Funnel: stage i is a conditional min-aggregation of one event-type
  *    slice joined to the stage-(i−1) per-user table ON THE USER KEY —
  *    every shuffle is keyed by user, the per-stage tables shrink
  *    monotonically, and no step ever materializes per-user event lists.
  *    k steps = k scans of pruned type-slices (pushed-down predicate) +
  *    k−1 co-partitioned joins; linear in events at any user count (no
  *    broadcast of per-user state — users may be billions).
  *  - Cohort: first-activity week per user (one agg) joined to the
  *    distinct (user, week) activity set (one agg) — both keyed by user,
  *    then a tiny (cohort, offset) rollup. */
object EventAnalytics extends QueryModule {

  /** Per-user positions of each completed funnel stage: stage i counts
    * only events of `steps(i)` AFTER the user's stage-(i−1) position —
    * strictly ordered funnels, the standard definition. Returns one
    * DataFrame per stage: (user, p) with p = the stage's min position. */
  def funnelStages(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      posCol: String = "event_id"): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val s1 = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(posCol)).as("p"))
    steps.tail.scanLeft(s1) { (prev, step) =>
      events.where(col(typeCol) === step)
        .join(prev.select(col(userCol), col("p").as("prev_p")), userCol)
        .where(col(posCol) > col("prev_p"))
        .groupBy(col(userCol)).agg(min(col(posCol)).as("p"))
    }
  }

  /** Funnel summary: (stage, step, n_users) — how many users completed
    * each prefix of `steps` in order. */
  def funnelSummary(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      posCol: String = "event_id"): DataFrame = {
    val stages = funnelStages(events, steps, userCol, typeCol, posCol)
    stages.zip(steps).zipWithIndex.map { case ((df, step), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage"), lit(step).as("step"), col("n_users"))
    }.reduce(_ unionAll _)
  }

  /** Weekly cohort retention: users grouped by first-activity week
    * (cohort), counted in each later week they were active.
    * Returns (cohort, week_offset, n_users). */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val firstWeek = events.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort"))
    val activity = events
      .select(col(userCol), date_trunc("week", col(tsCol)).as("wk"))
      .distinct()
    activity.join(firstWeek, userCol)
      .groupBy(col("cohort"),
        (datediff(col("wk"), col("cohort")) / 7).cast("int").as("week_offset"))
      .agg(count_distinct(col(userCol)).as("n_users"))
  }

  /** Time-to-convert through the funnel: for each user who completes all
    * of `steps` in order (by event TIME), the interval from the first
    * stage-1 event to the first full completion, summarized as exact
    * interpolated percentiles (same continuous definition in Spark
    * `percentile` and DuckDB `quantile_cont`). */
  def timeToConvert(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val stages = funnelStages(events, steps, userCol, typeCol, posCol = tsCol)
    val first = stages.head.select(col(userCol), col("p").as("t0"))
    val last = stages.last.select(col(userCol), col("p").as("t1"))
    first.join(last, userCol)
      .select(((unix_micros(col("t1")) - unix_micros(col("t0"))) / 3.6e9)
        .as("hours"))
      .agg(count(lit(1)).as("n_converted"),
        round(expr("percentile(hours, 0.5)"), 6).as("p50_hours"),
        round(expr("percentile(hours, 0.9)"), 6).as("p90_hours"))
  }

  // ---- registered queries -------------------------------------------

  /** Top event-type PATHS: the most frequent length-`n` consecutive
    * event-type sequences across users (product-analytics "user paths",
    * also the n-gram census a behavioral-cloning pipeline runs over
    * action logs). Consecutive = adjacent in the user's (ts, event_id)
    * order; sequences never span users.
    *
    * Scale shape: ONE shuffle keyed by user + a per-user local sort (the
    * window), lead() is a zero-copy peek within the sorted run — per-user
    * event lists are never materialized. The global census is a map-side
    * combined groupBy on the path string, and top-k is a TakeOrdered, not
    * a global sort. */
  def pathNgrams(events: DataFrame, n: Int = 3,
      userCol: String = "user_id"): DataFrame = {
    require(n >= 2)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col("ts"), col("event_id"))
    val leads = (1 until n).map(i => lead(col("event_type"), i).over(w).as(s"_l$i"))
    events.select((col(userCol) +: col("ts") +: col("event_id") +:
        col("event_type").as("_l0") +: leads): _*)
      .where(col(s"_l${n - 1}").isNotNull) // windows that run off the user's tail
      .select(concat_ws(">", (0 until n).map(i => col(s"_l$i")): _*).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_paths"))
  }

  /** Multi-touch LINEAR attribution: every conversion event credits the
    * same user's touch events (of `touchTypes`) inside the lookback
    * window before it with 1/n each — the standard equal-split model
    * (first/last/position-based variants are a credit-expression swap;
    * LAST-touch alone is the as-of join in operators/Temporal).
    * Returns (touch_type, n_touches, credit_millionths): credits are
    * summed as round(1e6/n) INTEGERS, so the totals are exact and
    * order-independent — no float accumulation to diverge across
    * engines or partitionings.
    *
    * Scale shape: touches and conversions are pruned type slices
    * (pushed-down predicates) joined ON THE USER KEY with the time-range
    * predicate inside the join — never a cartesian; per-conversion touch
    * counts are a window keyed by the conversion id (high-cardinality,
    * skew-safe); the final rollup is a tiny per-type groupBy. */
  def attributionLinear(events: DataFrame, touchTypes: Seq[String],
      convType: String, lookbackHours: Double = 72.0,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lookbackUs = (lookbackHours * 3.6e9).toLong
    val touches = events.where(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("u"), col(typeCol).as("touch_type"),
        unix_micros(col(tsCol)).as("tt"))
    val convs = events.where(col(typeCol) === convType)
      .select(col(userCol).as("u"), unix_micros(col(tsCol)).as("ct"),
        col(idCol).as("cid"))
    val pairs = touches.join(convs, Seq("u"))
      .where(col("tt") < col("ct") && col("tt") >= col("ct") - lookbackUs)
    pairs
      .withColumn("n_in_conv",
        count(lit(1)).over(Window.partitionBy(col("cid"))))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_touches"),
        sum(round(lit(1000000.0) / col("n_in_conv")).cast("long"))
          .as("credit_millionths"))
  }

  private val FunnelSteps = Seq("signup", "view", "purchase")

  private def funnelQ(s: SparkSession, d: String): DataFrame =
    funnelSummary(Tables.rawEvents(s, d), FunnelSteps).orderBy(col("stage"))

  private def ttcQ(s: SparkSession, d: String): DataFrame =
    timeToConvert(Tables.rawEvents(s, d), FunnelSteps)

  private def cohortQ(s: SparkSession, d: String): DataFrame =
    cohortRetention(Tables.rawEvents(s, d))
      .orderBy(col("cohort"), col("week_offset"))

  private def pathsQ(s: SparkSession, d: String): DataFrame =
    pathNgrams(Tables.rawEvents(s, d), n = 3)
      .orderBy(col("n_paths").desc, col("path")).limit(25)

  private def attributionQ(s: SparkSession, d: String): DataFrame =
    attributionLinear(Tables.rawEvents(s, d),
        touchTypes = Seq("view", "click"), convType = "purchase",
        lookbackHours = 72.0)
      .orderBy(col("touch_type"))

  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "funnel_stages" -> (funnelQ _),
    "funnel_time_to_convert" -> (ttcQ _),
    "cohort_retention" -> (cohortQ _),
    "path_trigrams" -> (pathsQ _),
    "attribution_linear" -> (attributionQ _)
  )

  def oracles: Seq[(String, String)] = Seq(
    "funnel_stages" ->
      """WITH s1 AS (
        |  SELECT user_id, min(event_id) AS p FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.event_id) AS p FROM events e
        |  JOIN s1 ON s1.user_id = e.user_id
        |  WHERE e.event_type = 'view' AND e.event_id > s1.p GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.event_id) AS p FROM events e
        |  JOIN s2 ON s2.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.event_id > s2.p GROUP BY 1)
        |SELECT * FROM (
        |  SELECT 1 AS stage, 'signup' AS step, CAST(count(*) AS BIGINT) AS n_users FROM s1
        |  UNION ALL
        |  SELECT 2, 'view', CAST(count(*) AS BIGINT) FROM s2
        |  UNION ALL
        |  SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3)
        |ORDER BY stage""".stripMargin,
    "path_trigrams" ->
      """WITH l AS (
        |  SELECT event_type AS a,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS c
        |  FROM events)
        |SELECT a || '>' || b || '>' || c AS path, CAST(count(*) AS BIGINT) AS n_paths
        |FROM l WHERE c IS NOT NULL
        |GROUP BY 1 ORDER BY n_paths DESC, path LIMIT 25""".stripMargin,
    "funnel_time_to_convert" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS p FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS p FROM events e
        |  JOIN s1 ON s1.user_id = e.user_id
        |  WHERE e.event_type = 'view' AND e.ts > s1.p GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS p FROM events e
        |  JOIN s2 ON s2.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.p GROUP BY 1),
        |conv AS (
        |  SELECT (epoch_us(s3.p) - epoch_us(s1.p)) / 3600000000.0 AS hours
        |  FROM s3 JOIN s1 ON s1.user_id = s3.user_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_converted,
        |       round(quantile_cont(hours, 0.5), 6) AS p50_hours,
        |       round(quantile_cont(hours, 0.9), 6) AS p90_hours
        |FROM conv""".stripMargin,
    "cohort_retention" ->
      """WITH first AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort
        |  FROM events GROUP BY 1),
        |act AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
        |SELECT f.cohort,
        |       CAST(date_diff('day', f.cohort, a.wk) // 7 AS INT) AS week_offset,
        |       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
        |FROM act a JOIN first f ON f.user_id = a.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "attribution_linear" ->
      """WITH touches AS (
        |  SELECT user_id AS u, event_type AS touch_type, epoch_us(ts) AS tt
        |  FROM events WHERE event_type IN ('view', 'click')),
        |convs AS (
        |  SELECT user_id AS u, epoch_us(ts) AS ct, event_id AS cid
        |  FROM events WHERE event_type = 'purchase'),
        |pairs AS (
        |  SELECT t.touch_type, c.cid FROM touches t JOIN convs c ON t.u = c.u
        |  WHERE t.tt < c.ct AND t.tt >= c.ct - 259200000000),
        |counted AS (
        |  SELECT touch_type,
        |         count(*) OVER (PARTITION BY cid) AS n_in_conv
        |  FROM pairs)
        |SELECT touch_type, CAST(count(*) AS BIGINT) AS n_touches,
        |  CAST(sum(CAST(round(1000000.0 / n_in_conv) AS BIGINT)) AS BIGINT)
        |    AS credit_millionths
        |FROM counted GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
