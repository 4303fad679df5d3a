package graft.projections

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.sources.Tables

/** Correctness-gate queries for the projections engine (SURVEY.md §2.3).
  * Each query runs a real DSL fold (ordered, partitioned) whose final state
  * is independently expressible in SQL for the DuckDB oracle.
  *
  * Money is accumulated in integer cents inside fold states so the fold
  * (sequential per partition) and the oracle (set-oriented SQL aggregate)
  * agree bit-for-bit. */
object ProjectionQueries extends QueryModule {

  final case class CountSum(n: Long, cents: Long)
  /** Ordered-monoid state for the statesMonoid path: (count, sum, last).
    * `last` makes the combine non-commutative — the oracle catches any
    * block-order mistake in the two-level merge. */
  final case class MonoidAgg(n: Long, cents: Long, lastCents: Long)
  final case class UpDown(prev: Double, ups: Long, last: Double, n: Long)
  final case class TypeCounts(purchase: Long, click: Long, view: Long, lastPos: Long)

  private def cents(v: Double): Long = math.round(v * 100)

  private def log(s: SparkSession, d: String): DataFrame = Tables.eventLog(s, d)

  /** P1+P5+P7+P19: per-stream count/sum fold over one category. */
  private def p5CountSum(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Projections.fromCategory("purchase")
      .foreachStream()
      .init(CountSum(0, 0))
      .when("purchase")((st, e) => CountSum(st.n + 1, st.cents + cents(e.value)))
      .states(log(s, d))
      .toDF("partition", "state")
      .select(col("partition"), col("state.n").as("n"), col("state.cents").as("sum_cents"))
      .orderBy(col("partition"))
  }

  /** P5 order-dependence: state depends on event order within the stream
    * (count of value-increases + last value). */
  private def p5Ordered(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Projections.fromCategory("view")
      .foreachStream()
      .init(UpDown(Double.NaN, 0, Double.NaN, 0))
      .whenAny { (st, e) =>
        val ups = if (!st.prev.isNaN && e.value > st.prev) st.ups + 1 else st.ups
        UpDown(e.value, ups, e.value, st.n + 1)
      }
      .states(log(s, d))
      .toDF("partition", "state")
      .select(col("partition"), col("state.ups").as("ups"),
        col("state.last").as("last_value"), col("state.n").as("n"))
      .orderBy(col("partition"))
  }

  /** P7 at scale: the same per-stream fold via the two-level monoid path
    * (blockSize 512 forces many blocks per stream at every SF, so the
    * block fold + ordered merge are genuinely exercised, not degenerate).
    * `lastCents` is order-dependent: a block-order bug in the merge flips
    * it and the oracle catches it. */
  private def p7FoldMonoid(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Projections.fromCategory("purchase")
      .foreachStream()
      .init(MonoidAgg(0, 0, Long.MinValue))
      .when("purchase")((st, e) =>
        MonoidAgg(st.n + 1, st.cents + cents(e.value), cents(e.value)))
      .statesMonoid(log(s, d),
        (a, b) => if (b.n == 0) a
          else MonoidAgg(a.n + b.n, a.cents + b.cents, b.lastCents),
        blockSize = 512)
      .toDF("partition", "state")
      .select(col("partition"), col("state.n").as("n"),
        col("state.cents").as("sum_cents"), col("state.lastCents").as("last_cents"))
      .orderBy(col("partition"))
  }

  /** P6: custom partition key (correlation id from the event body). */
  private def p6PartitionBy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Projections.fromAll()
      .partitionBy(e => Option(e.correlation_id))
      .init(CountSum(0, 0))
      .whenAny((st, e) => CountSum(st.n + 1, st.cents + cents(e.value)))
      .states(log(s, d))
      .toDF("partition", "state")
      .select(col("partition"), col("state.n").as("n"), col("state.cents").as("sum_cents"))
      .orderBy(col("partition"))
  }

  /** P9 transformBy + P10 filterBy over final states. */
  private def p9p10(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Projections.fromCategory("error")
      .foreachStream()
      .init(CountSum(0, 0))
      .whenAny((st, e) => CountSum(st.n + 1, st.cents + cents(e.value)))
      .states(log(s, d))
      .filter(_._2.n >= 5) // P10 filterBy
      .map { case (p, st) => (p, st.n, st.cents.toDouble / 100.0 / st.n) } // P9 transformBy
      .toDF("partition", "n", "avg_value")
      .orderBy(col("partition"))
  }

  /** P2: fromStreams union in global-position order, single partition. */
  private def p2FromStreams(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Projections.fromStreams("purchase-1", "click-1", "view-1")
      .single()
      .init(TypeCounts(0, 0, 0, -1))
      .when("purchase")((st, e) => st.copy(purchase = st.purchase + 1, lastPos = e.log_position))
      .when("click")((st, e) => st.copy(click = st.click + 1, lastPos = e.log_position))
      .when("view")((st, e) => st.copy(view = st.view + 1, lastPos = e.log_position))
      .states(log(s, d))
      .toDF("partition", "state")
      .select(col("state.purchase").as("n_purchase"), col("state.click").as("n_click"),
        col("state.view").as("n_view"), col("state.lastPos").as("last_pos"))
  }

  /** P13: emit derived events from inside handlers. */
  private def p13Emit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Projections.fromCategory("purchase")
      .foreachStream()
      .init(CountSum(0, 0))
      .whenEmit("purchase") { (st, e, em) =>
        if (e.value > 150.0)
          em.emit("receipt-" + e.stream_id.split("-")(1), "ReceiptIssued",
            s"""{"cents":${cents(e.value)}}""")
        CountSum(st.n + 1, st.cents + cents(e.value))
      }
      .emitted(log(s, d))
      .toDF()
      .select(col("stream_id"), col("event_type"), col("data"),
        col("partition"), col("caused_by_position"))
      .orderBy(col("caused_by_position"))
  }

  /** P16 bi-state: per-partition state + shared state (two-level fold). */
  private def p16BiState(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val per = Projections.fromCategory("signup")
      .foreachStream()
      .init(CountSum(0, 0))
      .whenAny((st, e) => CountSum(st.n + 1, st.cents + cents(e.value)))
      .states(log(s, d))
      .toDF("partition", "state")
      .select(col("partition"), col("state.n").as("n"))
    val shared = Projections.fromCategory("signup")
      .single()
      .init(CountSum(0, 0))
      .whenAny((st, e) => CountSum(st.n + 1, st.cents + cents(e.value)))
      .states(log(s, d))
      .toDF("partition", "state")
      .select(col("state.n").as("total"))
    per.crossJoin(broadcast(shared))
      .select(col("partition"), col("n"), col("total"))
      .orderBy(col("partition"))
  }

  /** P8 outputState: final states as result events with the reference's
    * naming convention ($projections-{name}-{partition}-result,
    * ProjectionNamesBuilder.cs:40-75); the state body is JSON. */
  private def p8OutputState(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Projections.fromCategory("click")
      .foreachStream()
      .init(CountSum(0, 0))
      .when("click")((st, e) => CountSum(st.n + 1, st.cents + cents(e.value)))
      .outputState(log(s, d), "clicks",
        st => s"""{"n":${st.n},"cents":${st.cents}}""")
      .orderBy(col("partition"))
  }

  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "p8_output_state" -> (p8OutputState _),
    "p5_fold_count_sum" -> (p5CountSum _),
    "p5_fold_order_dependent" -> (p5Ordered _),
    "p7_fold_monoid" -> (p7FoldMonoid _),
    "p6_partition_by" -> (p6PartitionBy _),
    "p9_p10_transform_filter" -> (p9p10 _),
    "p2_from_streams" -> (p2FromStreams _),
    "p13_emit" -> (p13Emit _),
    "p16_bistate" -> (p16BiState _)
  )

  private val L = Tables.eventLogSql

  def oracles: Seq[(String, String)] = Seq(
    "p8_output_state" -> s"""$L
      |SELECT '$$projections-clicks-' || stream_id || '-result' AS stream_id,
      |       'Result' AS event_type,
      |       '{"n":' || CAST(count(*) AS VARCHAR) || ',"cents":' ||
      |         CAST(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS VARCHAR) || '}' AS data,
      |       stream_id AS partition
      |FROM log WHERE event_type = 'click' AND split_part(stream_id, '-', 1) = 'click'
      |GROUP BY stream_id ORDER BY partition""".stripMargin,
    "p5_fold_count_sum" -> s"""$L
      |SELECT stream_id AS partition, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM log WHERE event_type = 'purchase' AND split_part(stream_id, '-', 1) = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "p5_fold_order_dependent" -> s"""$L,
      |lagged AS (
      |  SELECT stream_id, value,
      |         lag(value) OVER (PARTITION BY stream_id ORDER BY log_position) AS prev,
      |         row_number() OVER (PARTITION BY stream_id ORDER BY log_position DESC) AS rn_desc
      |  FROM log WHERE split_part(stream_id, '-', 1) = 'view')
      |SELECT stream_id AS partition,
      |       CAST(count(*) FILTER (WHERE prev IS NOT NULL AND value > prev) AS BIGINT) AS ups,
      |       max(CASE WHEN rn_desc = 1 THEN value END) AS last_value,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM lagged GROUP BY 1 ORDER BY 1""".stripMargin,
    "p7_fold_monoid" -> s"""$L,
      |ranked AS (
      |  SELECT stream_id, value,
      |         row_number() OVER (PARTITION BY stream_id ORDER BY log_position DESC) AS rn_desc
      |  FROM log WHERE event_type = 'purchase' AND split_part(stream_id, '-', 1) = 'purchase')
      |SELECT stream_id AS partition, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |       CAST(max(CASE WHEN rn_desc = 1 THEN round(value * 100) END) AS BIGINT) AS last_cents
      |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin,
    "p6_partition_by" -> s"""$L
      |SELECT correlation_id AS partition, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM log WHERE correlation_id IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "p9_p10_transform_filter" -> s"""$L
      |SELECT stream_id AS partition, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
      |         / count(*) AS avg_value
      |FROM log WHERE split_part(stream_id, '-', 1) = 'error'
      |GROUP BY 1 HAVING count(*) >= 5 ORDER BY 1""".stripMargin,
    "p2_from_streams" -> s"""$L
      |SELECT CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
      |       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
      |       CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
      |       max(log_position) AS last_pos
      |FROM log WHERE stream_id IN ('purchase-1', 'click-1', 'view-1')""".stripMargin,
    "p13_emit" -> s"""$L
      |SELECT 'receipt-' || split_part(log.stream_id, '-', 2) AS stream_id,
      |       'ReceiptIssued' AS event_type,
      |       '{"cents":' || CAST(round(log.value * 100) AS BIGINT) || '}' AS data,
      |       log.stream_id AS partition,
      |       log.log_position AS caused_by_position
      |FROM log WHERE log.event_type = 'purchase' AND log.value > 150.0
      |ORDER BY caused_by_position""".stripMargin,
    "p16_bistate" -> s"""$L
      |SELECT stream_id AS partition, CAST(count(*) AS BIGINT) AS n,
      |       CAST((SELECT count(*) FROM log WHERE split_part(stream_id, '-', 1) = 'signup') AS BIGINT) AS total
      |FROM log WHERE split_part(stream_id, '-', 1) = 'signup'
      |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
