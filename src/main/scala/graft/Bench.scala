package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * $SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * Materialization via the noop sink (full plan execution, no collect). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // One untimed warmup pass over every query (JMH-style): pays the
    // one-time Catalyst planning + whole-stage-codegen compilation + JIT
    // cost up front, so the timed pass measures steady-state per-query
    // execution — the number that scales with data volume — rather than
    // compiler latency that is amortized away on any real corpus.
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(runOnce)

    val results = names.map(n => n -> runOnce(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
