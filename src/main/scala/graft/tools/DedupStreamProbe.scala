package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.analytics.DedupStream
import graft.sources.Tables

/** Flatness probe for the incremental streaming near-dup resolver: feeds
  * N equal document batches through [[DedupStream.resolveNearDupsStream]]
  * (restarting the stream per batch, like a scheduled ingest job) and
  * times each batch. The claim under test: per-batch wall time stays FLAT
  * as the accumulated history grows N×, because each batch only shingles
  * its own documents, probes the persisted posting index, and rewrites
  * the resolved partitions its edges touch — the pre-r11 form re-indexed
  * and re-resolved the whole history every batch, so its batch time grew
  * linearly with batch number.
  *
  * Corpus: sf0.1 documents replicated `mult`× with ScaleProbe's bijective
  * per-replica character substitution (near-dup rate constant, replicas
  * shingle-disjoint), split into `nBatches` equal hash chunks.
  *
  * Beyond wall time, the probe reports the BYTES READ by each batch's
  * candidate-probe and verification stages (DedupStream.lastIoStats, the
  * local-mode `file`-scheme FS counters around those exact actions): with
  * the bk-sorted compacted index + bounded eq-list pushdown, probe bytes
  * must stay ~FLAT as history grows — the r11 residual was precisely this
  * scan growing with history. `compactEvery` (default 4) exercises the
  * in-stream compaction cadence.
  *
  * The probe also measures the SERVING path ([[DedupStream.findNearDups]],
  * the contamination-check lookup): a FIXED query batch runs against the
  * state at half history and again at full history, reporting wall time
  * and total bytes read (same FS-counter instrument). The claim under
  * test: serving bytes scale with |queries| × bands × page granule, NOT
  * with accumulated history — flat serving bytes while history doubles.
  *
  * Usage: DedupStreamProbe [mult] [nBatches] [compactEvery] (default 30 10 4)
  * Prints per-batch seconds plus one JSON line, also written to
  * /tmp/dedup_stream_probe.json. */
object DedupStreamProbe {

  def main(args: Array[String]): Unit = {
    val mult = args.lift(0).map(_.toInt).getOrElse(30)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(10)
    val compactEvery = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = graft.GraftSession.create(master = "local[32]", shufflePartitions = 32)
    spark.sparkContext.setLogLevel("WARN")
    DedupStream.ioStatsEnabled = true // probe-only FS-counter telemetry

    val root = Files.createTempDirectory("ndprobe").toString
    val srcDir = s"$root/src"
    val stateDir = s"$root/state"
    val ck = s"$root/ck"
    Files.createDirectories(Paths.get(srcDir))

    // documents only, same bijective substitution scheme as ScaleProbe
    val lo = "abcdefghijklm"
    val hi = "nopqrstuvwxyz"
    def rot(a: String, k: Int) = a.drop(k % a.length) + a.take(k % a.length)
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    val corpus = (0 until mult).map { i =>
      base.select((col("doc_id") + i * 10000000L).as("doc_id"),
        translate(col("text"), lo + hi, rot(lo, i % 13) + rot(hi, (i / 13) % 13)).as("text"))
    }.reduce(_ unionAll _)
      .withColumn("chunk", pmod(xxhash64(col("doc_id")), lit(nBatches)))
      .persist()
    val total = corpus.count()
    println(s"corpus: $total docs in $nBatches batches")

    val ix = DedupStream.MinHashIndexer(threshold = 0.5, k = 16, bands = 8,
      textCol = "text", idCol = "doc_id", n = 3)

    // fixed serving query batches, identical at both measurement points:
    // (a) 1000 replica-0 docs re-id'd into a query range — their match
    // count grows with how many of their near-dups are ingested yet, so
    // bytes ∝ hits is the EXPECTED (output-proportional) shape there;
    // (b) 1000 novel documents matching nothing — the zero-match control
    // whose bytes are the pure probe cost, which must stay FLAT as
    // history grows (the corpus-independence claim)
    val queryDocs = base.orderBy(col("doc_id")).limit(1000)
      .select((col("doc_id") + 9000000000L).as("doc_id"), col("text"))
      .localCheckpoint(true)
    val novelDocs = spark.range(1000)
      .select((col("id") + 9500000000L).as("doc_id"),
        concat_ws(" ", (0 until 40).map(j =>
          sha2(concat(col("id"), lit(s"novel$j")), 256)): _*).as("text"))
      .localCheckpoint(true)
    def serve(label: String, q: org.apache.spark.sql.DataFrame): (Double, Long, Long) = {
      val b0 = DedupStream.fsBytesReadNow()
      val t0 = System.nanoTime()
      val hits = DedupStream.findNearDups(spark, stateDir, q, ix).count()
      val t = (System.nanoTime() - t0) / 1e9
      val b = DedupStream.fsBytesReadNow() - b0
      println(f"serve[$label]  $t%7.2f s  ${b / 1048576.0}%8.2f MiB read  $hits hits")
      (t, b, hits)
    }

    var serveHalf: Option[(Double, Long, Long)] = None
    var serveHalfNovel: Option[(Double, Long, Long)] = None
    val stats = (0 until nBatches).map { i =>
      corpus.where(col("chunk") === i).select(col("doc_id"), col("text"))
        .coalesce(4).write.mode("append").parquet(srcDir)
      val t0 = System.nanoTime()
      val q = DedupStream.resolveNearDupsStream(
        spark.readStream
          .schema(org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, text STRING"))
          .parquet(srcDir),
        stateDir, ck, ix, compactEvery = compactEvery)
      q.awaitTermination(600000)
      val t = (System.nanoTime() - t0) / 1e9
      val io = DedupStream.lastIoStats(stateDir).filter(_.batchId == i)
      val (pb, vb) = io.map(s => (s.probeBytes, s.verifyBytes)).getOrElse((-1L, -1L))
      println(f"batch $i%2d  $t%7.2f s  probe ${pb / 1048576.0}%8.2f MiB  " +
        f"verify ${vb / 1048576.0}%8.2f MiB  (history ${(i + 1) * total / nBatches} docs)")
      if (i == nBatches / 2 - 1) {
        serveHalf = Some(serve(s"half, ${i + 1} batches", queryDocs))
        serveHalfNovel = Some(serve(s"half novel, ${i + 1} batches", novelDocs))
      }
      (t, pb, vb)
    }
    val serveFull = serve(s"full, $nBatches batches", queryDocs)
    val serveFullNovel = serve(s"full novel, $nBatches batches", novelDocs)
    val times = stats.map(_._1)
    corpus.unpersist()
    val tc0 = System.nanoTime()
    DedupStream.compactResolved(spark, stateDir)
    val compactSec = (System.nanoTime() - tc0) / 1e9
    val resolved = spark.read.parquet(s"$stateDir/resolved").count()
    // batch 1 pays JIT/codegen warmup, so the flatness ratio compares the
    // last batch to the SECOND — which only exists from 2 batches up
    val ratio = if (nBatches >= 2) times(nBatches - 1) / times(1) else 1.0
    val probeRatio = if (nBatches >= 2 && stats(1)._2 > 0)
      stats(nBatches - 1)._2.toDouble / stats(1)._2 else 1.0
    def serveJson(s: Option[(Double, Long, Long)]): String = s match {
      case Some((t, b, h)) => f"""{"sec":$t%.2f,"mib":${b / 1048576.0}%.2f,"hits":$h}"""
      case None => "null"
    }
    val json = s"""{"mult":$mult,"n_batches":$nBatches,"compact_every":$compactEvery,""" +
      s""""docs":$total,""" +
      s""""resolved":$resolved,"batch_sec":[${times.map(t => f"$t%.2f").mkString(",")}],""" +
      s""""probe_mib":[${stats.map(s => f"${s._2 / 1048576.0}%.2f").mkString(",")}],""" +
      s""""verify_mib":[${stats.map(s => f"${s._3 / 1048576.0}%.2f").mkString(",")}],""" +
      f""""last_over_second":$ratio%.2f,"probe_bytes_last_over_second":$probeRatio%.2f,""" +
      s""""serve_half":${serveJson(serveHalf)},"serve_full":${serveJson(Some(serveFull))},""" +
      s""""serve_half_novel":${serveJson(serveHalfNovel)},""" +
      s""""serve_full_novel":${serveJson(Some(serveFullNovel))},""" +
      f""""compact_sec":$compactSec%.2f}"""
    println(json)
    Files.write(Paths.get("/tmp/dedup_stream_probe.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
