package graft.projections.js

import org.apache.spark.sql.SparkSession
import graft.sources.Tables

/** Compiled-vs-interpreter benchmark over the JS handler corpus: every
  * definition that compiles to Columns runs `states()` (or `emitted()`
  * for the emit definitions) BOTH ways at $SPARK_GRAFT_SF_DIR, noop-
  * materialized, best of two after a warmup pass. Prints one JSON line
  * per query plus a summary — the measured evidence behind the column
  * compiler's reason to exist (the interpreter pump costs a serial
  * tree-walk per event; the compiled plan is the aggregation Spark
  * would run for hand-written Scala). */
object JsCompileBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-js-compile-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // structure-preserving replication (SPARK_GRAFT_REPLICATE=N): each
    // replica keeps per-stream event counts and bodies, with disjoint
    // stream ids and log positions — the fold shapes scale, the key
    // cardinality scales, per-key work stays constant
    val replicate = sys.env.getOrElse("SPARK_GRAFT_REPLICATE", "1").toInt
    val base = Tables.eventLog(spark, sfDir)
    val log =
      if (replicate <= 1) base
      else {
        import org.apache.spark.sql.functions._
        val span = 10000000000L
        (0 until replicate).map { i =>
          base.withColumn("stream_id",
            concat(col("stream_id"), lit(if (i == 0) "" else s"~$i")))
            .withColumn("log_position", col("log_position") + lit(i * span))
        }.reduce(_ unionByName _)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
    log.write.mode("overwrite").format("noop").save() // materialize cache

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def best(f: => Unit): Double = { f; math.min(time(f), time(f)) }

    val rows = for ((name, src) <- JsProjectionQueries.handlerCorpus) yield {
      val p = JsProjection.compile(src)
      val emits = name == "js_emit" || name == "js_linkto"
      def run(): Unit =
        (if (emits) p.emitted(log) else p.states(log))
          .write.mode("overwrite").format("noop").save()
      val compiles = if (emits) p.emitsToColumns else p.compilesToColumns
      if (!compiles) (name, -1.0, best(run()))
      else {
        val fast = best(run())
        spark.conf.set("spark.graft.js.columnCompile", "false")
        val interp = try best(run())
        finally spark.conf.set("spark.graft.js.columnCompile", "true")
        (name, fast, interp)
      }
    }
    for ((name, fast, interp) <- rows) {
      val ratio = if (fast > 0) f"${interp / fast}%.1f" else "n/a"
      println(f"""[jscompilebench] {"query":"$name","compiled_sec":$fast%.3f,"interp_sec":$interp%.3f,"speedup":$ratio}""")
    }
    val (cf, ci) = rows.filter(_._2 > 0).map(r => (r._2, r._3))
      .foldLeft((0.0, 0.0)) { case ((a, b), (f, i)) => (a + f, b + i) }
    println(f"""[jscompilebench] {"total_compiled_sec":$cf%.2f,"total_interp_sec":$ci%.2f,"speedup":${ci / cf}%.1f,"sf_dir":"$sfDir"}""")
    spark.stop()
  }
}
