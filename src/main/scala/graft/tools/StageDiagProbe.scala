package graft.tools

import org.apache.spark.scheduler._

/** Per-STAGE diagnostic run of one registered query (r17; VERDICT r16 #1
  * asked for a diag-mode soak attributing spill/GC to stages, not just
  * query totals): runs the query once (after one untimed warmup) with a
  * listener that aggregates task metrics per stage, then prints stages
  * sorted by task time with their spill/shuffle/GC shares and the first
  * line of the stage's call-site/name so the operator is identifiable.
  *
  * Usage: StageDiagProbe <query> [sfDir] */
object StageDiagProbe {
  private final class StageAgg {
    var name = ""
    var tasks = 0
    var runMs = 0L
    var cpuMs = 0L
    var gcMs = 0L
    var spillMem = 0L
    var spillDisk = 0L
    var shufRead = 0L
    var shufWrite = 0L
    var peakExecMem = 0L
    var wallMs = 0L
  }

  def main(args: Array[String]): Unit = {
    val query = args.headOption.getOrElse(sys.error("usage: StageDiagProbe <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")

    val stages = new java.util.concurrent.ConcurrentHashMap[Int, StageAgg]()
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val a = stages.computeIfAbsent(e.stageInfo.stageId, _ => new StageAgg)
        a.name = e.stageInfo.name.linesIterator.next()
        a.wallMs = e.stageInfo.completionTime.getOrElse(0L) -
          e.stageInfo.submissionTime.getOrElse(0L)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          val a = stages.computeIfAbsent(e.stageId, _ => new StageAgg)
          a.synchronized {
            a.tasks += 1
            a.runMs += m.executorRunTime
            a.cpuMs += m.executorCpuTime / 1000000
            a.gcMs += m.jvmGCTime
            a.spillMem += m.memoryBytesSpilled
            a.spillDisk += m.diskBytesSpilled
            a.shufRead += m.shuffleReadMetrics.totalBytesRead
            a.shufWrite += m.shuffleWriteMetrics.bytesWritten
            a.peakExecMem = math.max(a.peakExecMem, m.peakExecutionMemory)
          }
        }
      }
    }

    def run(): Double = {
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(query)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      finally {
        graft.analytics.Corpus.releaseNbFeatureCache()
        graft.QueryCaches.release()
      }
      (System.nanoTime() - t0) / 1e9
    }

    spark.sparkContext.setJobDescription(s"$query warmup")
    run()
    stages.clear()
    spark.sparkContext.addSparkListener(listener)
    spark.sparkContext.setJobDescription(s"$query diag")
    val sec = run()
    // let the listener bus drain (private API not accessible — a short
    // sleep suffices for a finished local-mode job)
    Thread.sleep(2000)

    println(f"\n$query @ $sfDir: $sec%.1f s — stages by task time:")
    println(f"${"stage"}%-7s ${"tasks"}%5s ${"wall_s"}%7s ${"run_s"}%7s ${"cpu_s"}%7s " +
      f"${"gc_s"}%6s ${"spillM_GB"}%9s ${"spillD_GB"}%9s ${"shufR_MB"}%8s ${"shufW_MB"}%8s ${"peakMB"}%7s  name")
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(-_._2.runMs).take(20).foreach { case (id, a) =>
      println(f"$id%-7d ${a.tasks}%5d ${a.wallMs / 1e3}%7.1f ${a.runMs / 1e3}%7.1f " +
        f"${a.cpuMs / 1e3}%7.1f ${a.gcMs / 1e3}%6.1f ${a.spillMem / 1e9}%9.2f " +
        f"${a.spillDisk / 1e9}%9.2f ${a.shufRead / 1e6}%8.0f ${a.shufWrite / 1e6}%8.0f " +
        f"${a.peakExecMem / 1e6}%7.0f  ${a.name.take(70)}")
    }
    spark.stop()
  }
}
