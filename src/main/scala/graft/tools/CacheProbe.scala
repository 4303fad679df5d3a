package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object CacheProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("cache-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[cprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val cached = graft.sources.Tables.eventLog(spark, sfDir)
    time("materialize-cache")(cached.write.mode("overwrite").format("noop").save())
    for (i <- 1 to 3)
      time(s"cached-count-$i")(cached.groupBy("event_type").count().write.mode("overwrite").format("noop").save())
    for (i <- 1 to 3)
      time(s"cached-3col-agg-$i")(
        cached.select("stream_id", "event_type", "timestamp")
          .groupBy("event_type").agg(max("timestamp")).write.mode("overwrite").format("noop").save())
    val raw = graft.sources.Tables.rawEvents(spark, sfDir)
    for (i <- 1 to 3)
      time(s"raw-count-$i")(raw.groupBy("event_type").count().write.mode("overwrite").format("noop").save())
    cached.groupBy("event_type").count().explain("formatted")
    spark.stop()
  }
}
