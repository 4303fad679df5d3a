package graft.tools

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Memory-constrained ×1000 scale point: every other scaling artifact in
  * this repo runs with a heap comfortably larger than its working set, so
  * spill paths are never exercised — the honest caveat BASELINE.md has
  * carried since r10. This probe runs the heaviest SCAN/AGG/WINDOW-shaped
  * registered queries against a ×1000 corpus (≈3.4 GB compressed, tens of
  * GB decompressed/shuffled) inside a DELIBERATELY small JVM (launch with
  * `java -Xmx4g`, local[16]) so the working set exceeds executor memory
  * by construction, and records wall time plus the shuffle SPILL bytes
  * (memory + disk) and input bytes per query — the evidence that the
  * plans degrade to spill instead of OOM, which is the property that
  * matters at 100 TB where the working set NEVER fits.
  *
  * Synthesis: ×10 id-shifted replicas of the ScaleProbe ×100 corpus
  * (10-way union, not a 1000-branch plan). The per-replica character
  * substitution space (169 distinct bijections) is exhausted past ×169,
  * so replicas repeat text byte-identically — fine for the scan/score/
  * window queries probed here, WRONG for the near-dup pair family (every
  * doc would gain ~6 literal copies and pair outputs would measure the
  * instrument, not the engine — the documented r7 lesson). Dedup-pair
  * queries are therefore excluded by design; their scale story is the
  * ×100 soak where the substitution space holds.
  *
  * Usage: first `ScaleProbe 100 <any query>` (builds x100), then launch
  * with a small heap: `java -Xmx4g -cp <spark jars + compiled classes>
  * graft.tools.IoBoundProbe`.
  * One JSON line, also written to /tmp/io_bound_probe.json. */
object IoBoundProbe {

  private val defaults = Seq(
    "classify_naive_bayes", "classify_naive_bayes_split", "perplexity_bucket",
    "dsir_weights", "quality_gopher", "text_winnow_fp", "pii_redact",
    "bpe_tokenize", "window_sliding_agg", "session_window_agg", "ann_sq8_topk")

  /** The registered queries, plus the SPLIT-form NB classifier: the
    * shared-hash pipeline's corpus-sized feature cache cannot degrade to
    * disk under memory pressure (tasks iterating cached blocks pin them
    * against eviction — this probe FOUND that at ×1000/8g), so the
    * memory-constrained deployment runs train+classify as two scans with
    * no cache; this variant measures that alternative. */
  private def queryFn(q: String): (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame =
    if (q == "classify_naive_bayes_split") { (s, dir) =>
      val docs = graft.sources.Tables.documents(s, dir)
      val model = graft.analytics.Corpus.naiveBayesTrain(
        docs.where(col("doc_id") % 5 =!= 0), "lang", "text")
      graft.analytics.Corpus.naiveBayesClassify(docs, model)
    } else SparkEntry.queries(q)

  private val x100 = "/tmp/graft_scale/x100"
  private val x1000 = "/tmp/graft_scale/x1000"

  private def synthesize(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (Files.exists(Paths.get(s"$x1000/_OK"))) return
    require(Files.exists(Paths.get(s"$x100/_OK")),
      "run ScaleProbe at x100 first (synthesizes /tmp/graft_scale/x100)")
    Files.createDirectories(Paths.get(x1000))
    def rep(table: String, shifts: Seq[(String, Long)]): Unit = {
      val base = spark.read.parquet(s"$x100/$table.parquet")
      (0 until 10).map { i =>
        shifts.foldLeft(base) { case (df, (c, span)) =>
          df.withColumn(c, col(c) + lit(i * span))
        }
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$x1000/$table.parquet")
    }
    rep("documents", Seq("doc_id" -> 1000000000L))
    rep("embeddings", Seq("vec_id" -> 1000000000L))
    rep("events", Seq("event_id" -> 10000000000000L, "user_id" -> 100000000L))
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach { t =>
        val dst = Paths.get(s"$x1000/$t.parquet")
        if (!Files.exists(dst)) Files.copy(Paths.get(s"$x100/$t.parquet"), dst)
      }
    Files.write(Paths.get(s"$x1000/_OK"), Array.emptyByteArray)
  }

  def main(args: Array[String]): Unit = {
    val queries = if (args.nonEmpty) args.toSeq else defaults
    val cpus = sys.env.getOrElse("GRAFT_PROBE_CPUS", "16")
    val spark = graft.GraftSession.create(master = s"local[$cpus]", shufflePartitions = 64)
    spark.sparkContext.setLogLevel("WARN")
    val heapMb = Runtime.getRuntime.maxMemory() / 1048576
    println(s"heap ${heapMb}MiB, local[$cpus]")

    val input = new AtomicLong; val spillMem = new AtomicLong; val spillDisk = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        input.addAndGet(m.inputMetrics.bytesRead)
        spillMem.addAndGet(m.memoryBytesSpilled)
        spillDisk.addAndGet(m.diskBytesSpilled)
      }
    })

    synthesize(spark)

    // which path the r13 size gate picks for the DEFAULT NB entry point
    // at this scale/heap (the r12 weak: shared-cache form dies at ×1000/8g)
    val (nbShare, nbEst, nbStor) = graft.analytics.Corpus.nbShareDecision(
      graft.sources.Tables.documents(spark, x1000))
    println(s"nb gate at x1000: share=$nbShare est=${nbEst / 1048576}MiB " +
      s"storage=${nbStor / 1048576}MiB")

    // one untimed pass at base scale pays codegen/JIT; the event-log
    // ingest materialization is untimed at x1000 (Bench's contract)
    queries.foreach { q =>
      try queryFn(q)(spark, "/root/testdata/sf0.1")
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => System.err.println(s"warm $q: ${e.getMessage}") }
    }
    graft.sources.Tables.eventLog(spark, x1000)
      .write.mode("overwrite").format("noop").save()

    val rows = queries.map { q =>
      spark.catalog.clearCache()
      Thread.sleep(1500) // listener drain from the previous query
      val (i0, m0, d0) = (input.get, spillMem.get, spillDisk.get)
      val t0 = System.nanoTime()
      val ok = try {
        queryFn(q)(spark, x1000).write.mode("overwrite").format("noop").save()
        true
      } catch { case e: Throwable =>
        System.err.println(s"$q FAILED: ${e.getMessage}"); false
      }
      val t = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      val (im, sm, sd) =
        ((input.get - i0) / 1048576, (spillMem.get - m0) / 1048576, (spillDisk.get - d0) / 1048576)
      println(f"$q%-24s ${if (ok) f"$t%8.1f" else "  FAIL"} s  in ${im}%7d MiB  " +
        f"spillMem ${sm}%7d MiB  spillDisk ${sd}%6d MiB")
      (q, if (ok) t else -1.0, im, sm, sd)
    }
    val json = s"""{"heap_mib":$heapMb,"cpus":$cpus,"queries":{""" +
      rows.map { case (q, t, im, sm, sd) =>
        f""""$q":{"sec":$t%.1f,"input_mib":$im,"spill_mem_mib":$sm,"spill_disk_mib":$sd}"""
      }.mkString(",") + "}}"
    println(json)
    Files.write(Paths.get("/tmp/io_bound_probe.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
