package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.analytics.{CorpusStream, Similarity}
import graft.sources.Tables

/** Scale probe for [[CorpusStream.clusterQuotaSampleStream]]: feeds a
  * ScaleProbe-style replicated embedding corpus (sf0.1 × mult, diagonal
  * sign-flip replicas) through the quota-admission stream in equal
  * batches, restarting the query per batch like a scheduled ingest, and
  * times each batch. The claim under test: per-batch wall time stays
  * FLAT as accumulated history grows, because state is bounded at
  * clusters × quota admitted ids (never history-sized) and assignment is
  * |batch| × nlist arithmetic against a broadcast quantizer.
  *
  * Usage: QuotaStreamProbe [mult=100] [nBatches=10] [nlist=64] [quota=50]
  */
object QuotaStreamProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.lift(0).map(_.toInt).getOrElse(100)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(10)
    val nlist = args.lift(2).map(_.toInt).getOrElse(64)
    val quota = args.lift(3).map(_.toInt).getOrElse(50)
    val spark = graft.GraftSession.create(master = "local[32]", shufflePartitions = 32)
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("qsprobe").toString
    val srcDir = s"$root/src"; val outDir = s"$root/out"; val ck = s"$root/ck"
    Files.createDirectories(Paths.get(srcDir))

    val base = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val corpus = (0 until mult).map { i =>
      val vec =
        if (i == 0) col("embedding")
        else expr(
          s"transform(embedding, (x, d) -> CAST(x * (1 - 2 * (abs(hash(d, $i)) % 2)) AS FLOAT))")
      base.select((col("vec_id") + i * 10000000L).as("vec_id"), vec.as("embedding"))
    }.reduce(_ unionAll _)
      .withColumn("chunk", pmod(xxhash64(col("vec_id")), lit(nBatches)))
      .persist()
    val total = corpus.count()
    println(s"corpus: $total vectors, $nBatches batches, nlist=$nlist quota=$quota")

    val cent = Similarity.trainIvfCentroids(base, nlist, iters = 0)
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL("vec_id LONG, embedding ARRAY<FLOAT>")
    val times = (0 until nBatches).map { i =>
      corpus.where(col("chunk") === i).select(col("vec_id"), col("embedding"))
        .coalesce(4).write.mode("append").parquet(srcDir)
      val t0 = System.nanoTime()
      val q = CorpusStream.clusterQuotaSampleStream(
        spark.readStream.schema(schema).parquet(srcDir), cent, quota, outDir, ck)
      q.processAllAvailable(); q.stop()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"batch $i%2d  $t%7.2f s  (history ${(i + 1) * total / nBatches} vecs)")
      t
    }
    corpus.unpersist()
    val admitted = spark.read.parquet(outDir)
    val perList = admitted.groupBy(col("list_id")).count()
      .agg(max(col("count")).as("mx")).collect()(0).getLong(0)
    val nAdmitted = admitted.count()
    require(perList <= quota, s"quota violated: $perList > $quota")
    val ratio = if (nBatches >= 2) times(nBatches - 1) / times(1) else 1.0
    val json = s"""{"mult":$mult,"n_batches":$nBatches,"vectors":$total,""" +
      s""""nlist":$nlist,"quota":$quota,"admitted":$nAdmitted,""" +
      s""""batch_sec":[${times.map(t => f"$t%.2f").mkString(",")}],""" +
      f""""last_over_second":$ratio%.2f}"""
    println(json)
    Files.write(Paths.get("/tmp/quota_stream_probe.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
