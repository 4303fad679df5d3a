package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analytics.Dedup
import graft.sources.Tables

/** Measures the r17 shared substring census (VERDICT r16 #3): a pipeline
  * that runs several members of the substring family over ONE corpus —
  * stats for reporting, remove/spans for the cleaned text — previously
  * paid the scan + tokenize + window-hash build once PER OPERATOR. With a
  * caller-owned [[Dedup.substringCensus]] handle (persisted,
  * QueryCaches-tracked) the build is paid once and every operator reads
  * the cache.
  *
  * Usage: SubstringFamilyProbe [sfDir] — times the three-operator pipeline
  * (stats + remove + spans) independent vs shared, best of 2 passes each
  * after a warmup, and prints one JSON line (also /tmp/substring_probe.json).
  */
object SubstringFamilyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.fanout(Tables.documents(spark, sfDir))
      .select(col("doc_id").as("id"), col("text"))

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    def runIndependent(): Double = {
      val t0 = System.nanoTime()
      try {
        noop(Dedup.substringDupStats(docs, k = 8, "text", "id"))
        noop(Dedup.substringDupRemove(docs, k = 8, "text", "id"))
        noop(Dedup.substringDupRemoveSpans(docs, k = 8, minLen = 20, "text", "id"))
      } finally graft.QueryCaches.release()
      (System.nanoTime() - t0) / 1e9
    }

    def runShared(): Double = {
      val t0 = System.nanoTime()
      try {
        val census = graft.QueryCaches.track(
          Dedup.substringCensus(docs, k = 8, "text", "id")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        noop(Dedup.substringDupStats(docs, k = 8, "text", "id", Some(census)))
        noop(Dedup.substringDupRemove(docs, k = 8, "text", "id", Some(census)))
        noop(Dedup.substringDupRemoveSpans(docs, k = 8, minLen = 20, "text", "id",
          census = Some(census)))
      } finally graft.QueryCaches.release()
      (System.nanoTime() - t0) / 1e9
    }

    spark.sparkContext.setJobDescription("substring-family warmup")
    runIndependent(); runShared()
    spark.sparkContext.setJobDescription("substring-family independent")
    val ind = math.min(runIndependent(), runIndependent())
    spark.sparkContext.setJobDescription("substring-family shared")
    val sh = math.min(runShared(), runShared())
    val line = f"""{"sf":"$sfDir","independent_sec":$ind%.3f,"shared_sec":$sh%.3f,"speedup":${ind / sh}%.2f}"""
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/substring_probe.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
