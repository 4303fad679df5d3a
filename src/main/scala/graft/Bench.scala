package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * $SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * Materialization via the noop sink (full plan execution, no collect).
  * The same line is also written to /tmp/bench.json (and
  * $SPARK_GRAFT_BENCH_OUT if set) so the full per-query map survives even
  * if stdout is truncated by the harness. */
/** Accumulates task-level metrics between reset() calls — the per-query
  * window of the bench diag mode. Spark fires task-end events on the
  * listener bus asynchronously; snapshot() is read after the query's job
  * completes so late events only ever under-count by the bus-drain tail. */
private[graft] class BenchDiagListener
    extends org.apache.spark.scheduler.SparkListener {
  private val gc = new java.util.concurrent.atomic.AtomicLong
  private val spillMem = new java.util.concurrent.atomic.AtomicLong
  private val spillDisk = new java.util.concurrent.atomic.AtomicLong
  private val shufRead = new java.util.concurrent.atomic.AtomicLong
  private val shufWrite = new java.util.concurrent.atomic.AtomicLong
  private val cpuNs = new java.util.concurrent.atomic.AtomicLong
  private val runMs = new java.util.concurrent.atomic.AtomicLong
  private val tasks = new java.util.concurrent.atomic.AtomicLong
  def reset(): Unit =
    Seq(gc, spillMem, spillDisk, shufRead, shufWrite, cpuNs, runMs, tasks)
      .foreach(_.set(0L))
  override def onTaskEnd(
      e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      gc.addAndGet(m.jvmGCTime)
      spillMem.addAndGet(m.memoryBytesSpilled)
      spillDisk.addAndGet(m.diskBytesSpilled)
      shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      cpuNs.addAndGet(m.executorCpuTime)
      runMs.addAndGet(m.executorRunTime)
      tasks.incrementAndGet()
    }
  }
  def snapshot(): String =
    s""""taskGcMs":${gc.get},"spillMem":${spillMem.get},"spillDisk":${spillDisk.get},""" +
      s""""shufRead":${shufRead.get},"shufWrite":${shufWrite.get},""" +
      s""""cpuMs":${cpuNs.get / 1000000},"runMs":${runMs.get},"tasks":${tasks.get}"""
}

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

    // Diag (default ON since r16; SPARK_GRAFT_BENCH_DIAG=0 disables):
    // per-query JVM + Spark-metric deltas appended to
    // /tmp/bench_diag.jsonl so a full-suite distortion (r14 finding:
    // js_linkto 0.8 s isolated vs 13.3 s in-suite; r15: 16+ queries 2-6x
    // inflated by ambient run context) can be attributed to a mechanism
    // (GC wall, storage eviction, spill) instead of guessed at. The
    // listener adds no measurable overhead (atomic adds on task end).
    val diag = sys.env.get("SPARK_GRAFT_BENCH_DIAG").forall(_ != "0")
    val diagListener = if (diag) Some(new BenchDiagListener) else None
    diagListener.foreach(spark.sparkContext.addSparkListener)
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
    }
    def storageSnapshot(): String = {
      val infos = spark.sparkContext.getRDDStorageInfo
      val totalMem = infos.map(_.memSize).sum
      val totalDisk = infos.map(_.diskSize).sum
      // RDD "names" of cached frames can be multi-line plan strings —
      // flatten to keep each diag record one parseable JSON line
      val top = infos
        .filter(i => i.numCachedPartitions > 0)
        .sortBy(-_.memSize).take(3)
        .map(i => s""""${Option(i.name).getOrElse("rdd" + i.id)
          .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(80)}":[${i.numCachedPartitions},${i.memSize},${i.diskSize}]""")
        .mkString("{", ",", "}")
      s""""cachedRdds":${infos.count(_.numCachedPartitions > 0)},"storageMem":$totalMem,"storageDisk":$totalDisk,"top":$top"""
    }

    def runOnce(name: String, record: Boolean = false): Double = {
      val gc0 = if (diag) gcMillis() else 0L
      diagListener.foreach(_.reset())
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      } finally {
        // a lingering corpus-sized NB feature cache makes LATER queries'
        // numbers depend on run order/storage pressure (r12 finding): each
        // query pays its own cache population and leaves nothing behind
        graft.analytics.Corpus.releaseNbFeatureCache()
        // ... and so do the query-local library caches (inverted shingle
        // indexes, pipeline stage caches — r14 full-suite distortion):
        // release everything operators tracked for this query
        graft.QueryCaches.release()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      if (diag && record) {
        val m = diagListener.map(_.snapshot()).getOrElse("")
        val line = s"""{"q":"$name","sec":$sec,"gcMs":${gcMillis() - gc0},$m,${storageSnapshot()}}"""
        try java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/bench_diag.jsonl"),
          (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
        catch { case _: Throwable => () }
      }
      sec
    }

    // Cold-scan probe BEFORE any caching/warmup: a full parquet scan +
    // envelope adaptation of the events table, timed with nothing memoized.
    // The warmup below intentionally measures steady-state on the
    // ingest-materialized (cached) layout; this number keeps the raw
    // scan/IO path observable so scan regressions can't hide behind the
    // cache (BASELINE.md "bench methodology").
    val coldScanSec: Double = {
      val t0 = System.nanoTime()
      graft.sources.Tables.eventLog(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    // One untimed warmup pass over every query (JMH-style): pays the
    // one-time Catalyst planning + whole-stage-codegen compilation + JIT
    // cost up front, so the timed pass measures steady-state per-query
    // execution — the number that scales with data volume — rather than
    // compiler latency that is amortized away on any real corpus.
    // Optional args restrict the run to the named queries (iteration aid);
    // a filtered run never overwrites the in-repo BENCH_LOCAL.json.
    val all = SparkEntry.queries.keys.toSeq.sorted
    val names = if (args.nonEmpty) all.filter(args.toSet) else all
    names.foreach(n => runOnce(n))

    // BEST-OF-2 timed passes per query (r16 measurement fix — VERDICT r15
    // weak #1), run as TWO SEPARATED FULL SWEEPS since r17 (VERDICT r16
    // #2): pass A times every query, then pass B times every query, and
    // each query reports min(A, B). Back-to-back passes (the r16 form)
    // shared any multi-minute ambient load window — the driver-final r16
    // artifact showed two alphabetically contiguous blocks inflated up to
    // 9x with both passes inside the same window. A full sweep takes
    // minutes, so the two samples of any query are now minutes apart and
    // a load window can only contaminate one of them. The OLD (r15)
    // methodology's value — the first timed pass — is kept verbatim in
    // the file artifact as "queries_single_pass" so rounds remain
    // comparable. /proc/loadavg is recorded before/between/after so a
    // loaded machine is visible in the artifact itself.
    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      catch { case _: Throwable => "" }
    val loadBefore = loadavg()
    val passA = names.map(n => n -> runOnce(n, record = true))
    val loadMid = loadavg()
    val passB = names.map(n => n -> runOnce(n, record = true)).toMap
    val results = passA.map { case (n, t1) =>
      val t2 = passB(n)
      // a query that fails one pass but not the other is flaky — say so
      // loudly instead of silently reporting the surviving pass (r16
      // ADVICE: flakiness must be visible in the run log)
      if ((t1 < 0) != (t2 < 0))
        System.err.println(s"[bench] FLAKY $n: passA=$t1 passB=$t2 " +
          "(one pass failed; reporting the surviving pass)")
      val best = if (t1 < 0) t2 else if (t2 < 0) t1 else math.min(t1, t2)
      (n, best, t1)
    }
    val loadAfter = loadavg()
    def qmap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = qmap(results.map(r => r._1 -> r._2) :+
      ("cold_scan_events" -> coldScanSec))
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // file artifact carries the extended record (old-methodology pass-1
    // values + load markers + an explicit methodology marker, r16 ADVICE:
    // consumers comparing across rounds must see which aggregation
    // produced "queries"); the PRINTED contract line keeps the exact
    // driver shape, nothing added
    val extLine = line.dropRight(1) +
      s""","passes":2,"agg":"min","sweeps":"separated"""" +
      s""","queries_single_pass":${qmap(results.map(r => r._1 -> r._3))}""" +
      s""","loadavg_before":"$loadBefore","loadavg_mid":"$loadMid"""" +
      s""","loadavg_after":"$loadAfter"}"""
    println(line)
    // ... and a compact total-only record as the FINAL stdout line
    // (VERDICT r16 what's-wrong #2): the driver keeps only the last
    // ~2000 chars of stdout and the full 153-query line is ~12 KB, so in
    // 16 rounds it has never parsed one. This short line fits any tail;
    // the full per-query map stays in the contract line above and in the
    // file artifacts.
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","passes":2,"agg":"min"}""")
    // BENCH_LOCAL.json keeps the COMPLETE per-query map in-repo: the
    // driver's stdout capture truncates to the last ~60 queries, which
    // silently drops the early-alphabet families from round-over-round
    // comparison. Written only when cwd actually IS the project root
    // (build.sbt present) — run from anywhere else this must not scatter
    // stray files.
    // ... and only for the standard sf0.1 corpus AT THE STANDARD 32 cores:
    // ad-hoc runs against a scaled/synthetic dir — or the driver's
    // reduced-core scaling passes (SPARK_GRAFT_CPUS < 32 runs are FASTER
    // at sf0.1, overhead-bound) — must not masquerade as the round
    // baseline
    val inRepoOut =
      if (args.isEmpty && sfDir == "/root/testdata/sf0.1" && cpus == "32" &&
          java.nio.file.Files.exists(java.nio.file.Paths.get("build.sbt")))
        Seq("BENCH_LOCAL.json")
      else Seq.empty
    val outs = Seq("/tmp/bench.json") ++ inRepoOut ++
      sys.env.get("SPARK_GRAFT_BENCH_OUT")
    outs.foreach { p =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (extLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $p: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
