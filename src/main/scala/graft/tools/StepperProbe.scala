package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming throughput of the typed pre-state stepper
  * ([[graft.projections.js.JsStreamStepper]]) vs the interpreter
  * state-store path it replaces — BOTH folding the same pre-state JS
  * definition over the same file-backed subscription, AvailableNow.
  *
  * Synthesizes N events across `streams` distinct fold keys (body-keyed
  * partitionBy like the js_map_guard oracle), writes them as one parquet
  * log dir, then times the full streaming query twice: stepper on
  * (default) and `spark.graft.js.streamStepper=false` (interpreter).
  * Numbers land in BASELINE.md ("r14 stepper throughput").
  *
  * Usage: StepperProbe [events] [streams] (default 2000000, 50000) */
object StepperProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000000)
    val streams = args.lift(1).map(_.toInt).getOrElse(50000)
    val spark = graft.GraftSession.create(master = "local[32]", shufflePartitions = 32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = Files.createTempDirectory("stepper_probe").toString
    spark.range(n.toLong).select(
        concat(lit("acct-"), (col("id") % streams).cast("string")).as("stream_id"),
        (col("id") / streams).cast("long").as("event_number"),
        concat(lit("t"), (col("id") % 5).cast("string")).as("event_type"),
        col("id").as("log_position"),
        timestamp_millis(lit(1700000000000L) + col("id")).as("timestamp"),
        lit(null).cast("string").as("correlation_id"),
        concat(lit("""{"k":"k"""), (col("id") % 97).cast("string"), lit("\"}")).as("data"),
        (col("id") % 1000).cast("double").as("value"))
      .repartition(8).write.mode("overwrite").parquet(s"$dir/log")

    // the r12 map-guard oracle definition: membership + threshold reads
    // of a dynamic-key counter map — a stepper-served pre-state plan
    val p = graft.projections.js.JsProjection.compile("""
fromAll()
    .partitionBy(function(e) { return e.streamId; })
    .when({
        $init: function() { return { seen: {}, repeat_cents: 0, bursts: 0 } },
        $any: function(s, e) {
            if (s.seen[e.eventType]) { s.repeat_cents += Math.round(e.value * 100); }
            if ((s.seen[e.eventType] || 0) >= 2) { s.bursts += 1; }
            s.seen[e.eventType] = (s.seen[e.eventType] || 0) + 1;
            return s;
        }
    })""")

    def run(label: String, stepper: Boolean): Double = {
      spark.conf.set("spark.graft.js.streamStepper", stepper.toString)
      val ck = Files.createTempDirectory(s"stepck_$label").toString
      val src = graft.streaming.Subscriptions.subscribeAll(spark, s"$dir/log")
      val t0 = System.nanoTime()
      val q = p.statesStream(src)
        .writeStream.format("noop")
        .option("checkpointLocation", ck)
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(1200000)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[stepper_probe] $label%-12s $sec%8.1f s  (${n / sec / 1e6}%.2f M events/s)")
      sec
    }
    run("warmup", stepper = true)
    val sStep = run("stepper", stepper = true)
    val sInterp = run("interpreter", stepper = false)
    println(f"""{"events":$n,"streams":$streams,"stepper_sec":$sStep%.2f,""" +
      f""""interp_sec":$sInterp%.2f,"speedup":${sInterp / sStep}%.2f}""")
    spark.stop()
  }
}
