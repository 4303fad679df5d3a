package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.analytics.{Similarity, SimilarityIndex}
import graft.sources.Tables

/** Amortization probe for persisted ANN indexes: the inline search forms
  * retrain/reassign/re-encode the corpus on every call, the saved-index
  * forms pay that once at build time and serve each query batch from the
  * persisted geometry. This measures both sides at a corpus the container
  * can hold (sf0.1 embeddings replicated `mult`×, orthogonal sign-flip
  * per replica — same scheme as ScaleProbe) and prints build / indexed
  * query / inline query seconds per index kind.
  *
  * Usage: AnnIndexProbe [mult]   (default 100 → 200k × 64-dim vectors)
  * One JSON line, also written to /tmp/ann_index_probe.json; results land
  * in BASELINE.md. */
object AnnIndexProbe {

  def main(args: Array[String]): Unit = {
    val mult = args.lift(0).map(_.toInt).getOrElse(100)
    val spark = graft.GraftSession.create(master = "local[32]", shufflePartitions = 32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val corpus = (0 until mult).map { i =>
      val vec =
        if (i == 0) col("embedding")
        else expr(
          s"transform(embedding, (x, d) -> CAST(x * (1 - 2 * (abs(hash(d, $i)) % 2)) AS FLOAT))")
      base.select((col("vec_id") + i * 10000000L).as("vec_id"), vec.as("embedding"))
    }.reduce(_ unionAll _).repartition(32)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = corpus.count()
    val queries = corpus.where(col("vec_id") < 20).localCheckpoint(true)
    val (nlist, nprobe) = Similarity.autoIvf(n)
    println(s"corpus: $n vectors; geometry nlist=$nlist nprobe=$nprobe")

    val root = Files.createTempDirectory("annidx").toString
    def time(body: => DataFrame): Double = {
      val t0 = System.nanoTime()
      body.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    def timeU(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    def phase(name: String): Unit = println(s"[annprobe] $name")

    // warm: plans + codegen for both sides at the same shapes
    phase("warm inline ivf")
    Similarity.ivfTopK(queries, corpus, 10, nlist, nprobe)
      .write.mode("overwrite").format("noop").save()

    phase("build ivf")
    val bIvf = timeU(SimilarityIndex.saveIvf(corpus, s"$root/ivf", nlist))
    phase("query ivf")
    val qIvf = time(SimilarityIndex.ivfTopK(spark, queries, s"$root/ivf", 10, nprobe))
    phase("inline ivf")
    val iIvf = time(Similarity.ivfTopK(queries, corpus, 10, nlist, nprobe))

    val (m, kcent) = (16, 256)
    phase("build ivfpq")
    val bPq = timeU(SimilarityIndex.saveIvfPq(corpus, s"$root/ivfpq", nlist, m, kcent))
    phase("query ivfpq")
    val qPq = time(SimilarityIndex.ivfPqTopK(spark, queries, s"$root/ivfpq", 10, nprobe))
    phase("inline ivfpq")
    val iPq = time(Similarity.ivfPqTopK(queries, corpus, 10, nlist, nprobe, m, kcent))

    phase("build sq8")
    val bSq = timeU(SimilarityIndex.saveSq8(corpus, s"$root/sq8"))
    phase("query sq8")
    val qSq = time(SimilarityIndex.sq8TopK(spark, queries, s"$root/sq8", 10))
    phase("inline sq8")
    val iSq = time(Similarity.sq8TopK(queries, corpus, 10))
    phase("add")

    // incremental add (after all base measurements, so it can't disturb
    // them): a 1/mult slice arrives with fresh ids — assign/encode with
    // the SAVED geometry and append; the comparison point is the full
    // rebuild (build_sec) that add replaces in the FAISS lifecycle
    val addB = base.select((col("vec_id") + mult.toLong * 10000000L).as("vec_id"),
      col("embedding")).localCheckpoint(true)
    val nAdd = addB.count()
    val aIvf = timeU(SimilarityIndex.addIvf(addB, s"$root/ivf"))
    val aPq = timeU(SimilarityIndex.addIvfPq(addB, s"$root/ivfpq"))
    val aSq = timeU(SimilarityIndex.addSq8(addB, s"$root/sq8"))
    val qIvfA = time(SimilarityIndex.ivfTopK(spark, queries, s"$root/ivf", 10, nprobe))
    val skew = SimilarityIndex.listSkew(spark, s"$root/ivf")

    val json =
      f"""{"mult":$mult,"vectors":$n,"nlist":$nlist,"nprobe":$nprobe,""" +
      f""""ivf":{"build_sec":$bIvf%.2f,"indexed_query_sec":$qIvf%.2f,"inline_sec":$iIvf%.2f},""" +
      f""""ivfpq":{"build_sec":$bPq%.2f,"indexed_query_sec":$qPq%.2f,"inline_sec":$iPq%.2f},""" +
      f""""sq8":{"build_sec":$bSq%.2f,"indexed_query_sec":$qSq%.2f,"inline_sec":$iSq%.2f},""" +
      f""""add":{"rows":$nAdd,"ivf_add_sec":$aIvf%.2f,"ivfpq_add_sec":$aPq%.2f,""" +
      f""""sq8_add_sec":$aSq%.2f,"post_add_query_sec":$qIvfA%.2f,"post_add_skew":$skew%.2f}}"""
    println(json)
    Files.write(java.nio.file.Paths.get("/tmp/ann_index_probe.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
