package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Retention

/** Retention-bounds derivation soak (the r9 verdict's ask: the stats-table
  * fast path landed with spec coverage but no scale measurement).
  *
  * At N streams, derives the per-stream retention bounds two ways and
  * times each materialization end-to-end from parquet:
  *
  *  - LOG: the original full-log aggregation ([[Retention.bounds]]) —
  *    groupBy(stream_id).max(event_number) over all N×k event rows;
  *  - STATS: the incremental stats-table path
  *    ([[Retention.boundsFromLasts]] — what
  *    `EventLogStore.retentionBounds` runs) — latest-row-per-stream
  *    window over the LSM stats table (N×d delta rows, d ≪ k), which is
  *    itself a shuffle whose cost at 10⁶–10⁸ streams is exactly what
  *    this probe measures.
  *
  * Both paths share one precomputed small metadata table (the `$$`
  * metastream scan is identical for both and not under test). The log
  * here is NARROW (no payload), so the measured ratio understates the
  * real win: production event rows carry kB-scale bodies and k runs
  * 10²–10⁴ events/stream, while the stats table stays d rows/stream of
  * four columns regardless.
  *
  * Usage: RetentionBoundsProbe [streams] [eventsPerStream] [deltas]
  * Prints one JSON line; results land in BASELINE.md.
  */
object RetentionBoundsProbe {

  def main(args: Array[String]): Unit = {
    val streams = if (args.length > 0) args(0).toLong else 1000000L
    val k = if (args.length > 1) args(1).toLong else 10L
    val d = if (args.length > 2) args(2).toLong else 3L

    val spark = graft.GraftSession
      .builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("graft_retbounds").toString
    val logDir = s"$root/log"
    val statsDir = s"$root/stats"

    // N×k narrow event rows (the bounds derivation reads only
    // stream_id/event_number; payload width would only widen the gap)
    spark.range(streams * k).select(
      concat(lit("s-"), pmod(col("id"), lit(streams))).as("stream_id"),
      expr(s"id div $streams").as("event_number"),
      to_timestamp(lit("2024-01-01 00:00:00")).as("timestamp"))
      .repartition(32)
      .write.mode("overwrite").parquet(logDir)

    // LSM stats deltas: d rows per stream ascending to exactly k-1 at the
    // newest max_log_position — latest-wins must recover the same _last
    // the log aggregation computes, so both paths yield identical bounds
    spark.range(streams * d).select(
      concat(lit("s-"), pmod(col("id"), lit(streams))).as("stream_id"),
      (lit(k - 1) - (lit(d - 1) - expr(s"id div $streams")))
        .as("last_event_number"),
      lit(false).as("tombstoned"),
      (expr(s"id div $streams") * streams + pmod(col("id"), lit(streams)))
        .as("max_log_position"))
      .repartition(32)
      .write.mode("overwrite").parquet(statsDir)

    // shared small metadata table: every 10th stream caps at $maxCount=5
    val meta = spark.range(streams / 10).select(
      concat(lit("s-"), col("id") * 10).as("stream_id"),
      lit(5L).as("max_count"),
      lit(null).cast("long").as("max_age_sec"),
      lit(null).cast("long").as("truncate_before"),
      lit(false).as("tombstoned"))

    val asOf = to_timestamp(lit("2024-06-01 00:00:00"))

    def timeOnce(df: => DataFrame): (Double, org.apache.spark.sql.Row) = {
      val t0 = System.nanoTime()
      val r = df.agg(count(lit(1)), sum(col("_min_event_number")),
        sum(when(col("_deleted"), 1L).otherwise(0L))).collect()(0)
      ((System.nanoTime() - t0) / 1e9, r)
    }
    // warm file listings + page cache once, then time the best of 2 —
    // run-order bias otherwise flatters whichever path runs last
    def run(name: String, df: => DataFrame): Double = {
      timeOnce(df)
      val (a, r) = timeOnce(df)
      val (b, _) = timeOnce(df)
      val sec = math.min(a, b)
      println(f"$name%-6s $sec%8.2f s  bounds=${r.getLong(0)} " +
        f"sum_min=${r.getLong(1)} deleted=${r.getLong(2)}")
      sec
    }

    val log = spark.read.parquet(logDir)
    val stats = spark.read.parquet(statsDir)
    // mirrors EventLogStore.statsLatest (EventLogStore.scala): the
    // row_number window over (max_log_position, last_event_number) desc —
    // THE production stats path, so "stats_path_sec" below times what the
    // store actually runs
    def statsLatest: DataFrame = stats
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("stream_id"))
          .orderBy(col("max_log_position").desc, col("last_event_number").desc)))
      .where(col("_rn") === 1)
      .select(col("stream_id"), col("last_event_number").as("_last"),
        col("tombstoned").as("_tombstoned"))
    // alternative kept for the comparison table: lexicographic struct-max
    // aggregation (map-side combine) instead of the per-group sort
    def statsLatestStructMax: DataFrame = stats
      .groupBy(col("stream_id"))
      .agg(max(struct(col("max_log_position"), col("last_event_number"),
        col("tombstoned"))).as("_w"))
      .select(col("stream_id"), col("_w.last_event_number").as("_last"),
        col("_w.tombstoned").as("_tombstoned"))

    val tLog = run("LOG", Retention.bounds(log, meta, asOf))
    val tStats = run("STATS",
      Retention.boundsFromLasts(statsLatest, meta, asOf))
    val tSmax = run("SMAX",
      Retention.boundsFromLasts(statsLatestStructMax, meta, asOf))

    println(s"""{"streams":$streams,"events_per_stream":$k,"deltas":$d,""" +
      f""""log_agg_sec":$tLog%.2f,"stats_path_sec":$tStats%.2f,""" +
      f""""stats_structmax_sec":$tSmax%.2f,"speedup":${tLog / tStats}%.2f}""")
    spark.stop()
  }
}
