package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.projections.Projections

/** Skewed-fold probe: one pathological stream (millions of events on one
  * key) against the serial per-key fold (`states`) and the two-level
  * monoid fold (`statesMonoid`). The serial path is bounded by the one
  * task that owns the hot key — the same bound as the reference's single
  * projection pump; the monoid path chunks the hot key into contiguous
  * log-range blocks and folds them cluster-wide. Numbers land in
  * BASELINE.md ("skewed-fold mitigation").
  *
  * Usage: SkewProbe [hotEvents] (default 2_000_000; plus 1000 cold
  * streams x 100 events so the partitioner has real work to balance). */
object SkewProbe {

  private def synth(spark: SparkSession, hotN: Long): DataFrame = {
    val hot = spark.range(hotN).select(
      lit("hot-1").as("stream_id"),
      col("id").as("event_number"),
      lit("E").as("event_type"),
      (col("id") * 2).as("log_position"))
    val cold = spark.range(1000L * 100).select(
      concat(lit("cold-"), (col("id") % 1000)).as("stream_id"),
      expr("id div 1000").as("event_number"),
      lit("E").as("event_type"),
      (col("id") * 2 + 1).as("log_position"))
    hot.unionAll(cold).select(
      col("stream_id"), col("event_number"), col("event_type"),
      col("log_position"),
      to_timestamp(lit("2024-01-01 00:00:00")).as("timestamp"),
      lit(null).cast("string").as("correlation_id"),
      lit(null).cast("string").as("data"),
      (col("log_position") % 97).cast("double").as("value"))
  }

  def main(args: Array[String]): Unit = {
    val hotN = if (args.nonEmpty) args(0).toLong else 2000000L
    val spark = graft.GraftSession.create(master = "local[32]", shufflePartitions = 32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val log = synth(spark, hotN).persist()
    log.count() // materialize the input so both folds time only the fold

    def builder = Projections.fromAll()
      .foreachStream()
      .init((0L, 0L)) // (n, sum_cents)
      .whenAny((st, e) => (st._1 + 1, st._2 + math.round(e.value * 100)))

    def time(label: String)(f: => Array[((String, (Long, Long)))]): Array[(String, (Long, Long))] = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (${r.length} partitions)")
      r
    }

    // warmup both plans once at small scale via limit? keep it simple: run
    // each twice and report the second (steady-state) timing
    var serial: Array[(String, (Long, Long))] = null
    var monoid: Array[(String, (Long, Long))] = null
    for (round <- 1 to 2) {
      println(s"--- pass $round ---")
      serial = time("serial states")(builder.states(log).collect())
      monoid = time("statesMonoid bs=65536")(
        builder.statesMonoid(log, (a, b) => (a._1 + b._1, a._2 + b._2)).collect())
    }
    require(serial.toMap == monoid.toMap, "monoid fold must equal serial fold")
    println("results identical: " + serial.toMap.get("hot-1"))
    spark.stop()
  }
}
