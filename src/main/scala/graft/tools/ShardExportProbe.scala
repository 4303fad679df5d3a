package graft.tools

import org.apache.spark.sql.SparkSession
import graft.analytics.ShardExport

/** Shard-export scale probe: export the (optionally scaled) corpus once,
  * replay it, and report both walls — the evidence that the replay path
  * costs a narrow scan, not a re-export. Usage: ShardExportProbe [sfDir]
  * (default the x100 synthetic corpus if present, else sf0.1). */
object ShardExportProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse {
      if (java.nio.file.Files.exists(java.nio.file.Paths.get("/tmp/graft_scale/x100/_OK")))
        "/tmp/graft_scale/x100"
      else "/root/testdata/sf0.1"
    }
    val spark = SparkSession.builder()
      .master("local[32]").appName("shard-export-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = "/tmp/graft_shard_export"
    val p = java.nio.file.Paths.get(out)
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val n = docs.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (m1, exportSec) = timed {
      ShardExport.exportShards(docs, out, budget = 2048, shardSize = 10000).count()
    }
    val (m2, replaySec) = timed {
      ShardExport.exportShards(docs, out, budget = 2048, shardSize = 10000).count()
    }
    require(m1 == m2, s"replay changed the manifest: $m1 vs $m2")
    val line = f"""{"probe":"shard_export","sf":"$sfDir","docs":$n,""" +
      f""""shards":$m1,"export_sec":$exportSec%.2f,"replay_sec":$replaySec%.2f}"""
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/shard_export_probe.json"),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
