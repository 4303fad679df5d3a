package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query profiler: runs the named queries N times each against a
  * SF dir and prints timings, to separate fixed planning overhead from
  * execution cost. `runMain graft.tools.QueryProbe q1_agg dedup_exact`. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_agg")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/session once
    graft.SparkEntry.queries("topk_orders")(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    for (n <- names; i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      println(f"[probe] $n run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
