package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.analytics.{Dedup, Similarity}
import graft.functions.TextFunctions
import graft.sources.Tables

/** Empirical scaling probe (not part of the bench): replicates the sf0.1
  * corpus Nx with perturbed ids/text and times the heavy operators, to
  * validate that cost grows ~linearly with corpus size (the 100 TB
  * question, answered at the scale this container allows). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = if (args.nonEmpty) args(0).toInt else 10
    val spark = graft.GraftSession.create(master = "local[8]", shufflePartitions = 64)
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val base = Tables.documents(spark, d).select(col("doc_id").as("id"), col("text"))
    val big = (0 until mult).map { i =>
      base.select((col("id") + i * 1000000L).as("id"),
        concat(col("text"), lit(s" v$i")).as("text"))
    }.reduce(_ unionAll _)
    println(s"corpus: ${big.count()} docs")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }
    time("minhash_lsh")(Dedup.minhashLshPairs(big, 0.5, k = 16, bands = 4, "text", "id").count())
    time("ngram_jaccard")(Dedup.ngramJaccardPairs(big, 0.5, "text", "id").count())
    time("simhash")(Dedup.simhash(big, "text", "id").count())
    time("winnow")(big.select(col("id"),
      TextFunctions.winnowFingerprints(col("text"), 5, 4).as("fp")).count())
    time("simhash_band_pairs")(
      graft.analytics.Dedup.simhashNearDupPairs(big, maxHamming = 3, bands = 4,
        "text", "id").count())
    time("decontaminate")(
      graft.analytics.Corpus.decontaminate(big,
        base.where(col("id") < 100), 0.8, idCol = "id").count())
    time("pack_sequences")(
      graft.analytics.Corpus.packSequences(big, budget = 256, shardSize = 1000,
        idCol = "id").count())
    time("tfidf")(
      graft.analytics.Corpus.tfIdfKeywords(big, k = 3, n = mult * 5100L,
        idCol = "id").count())
    val emb = Tables.embeddings(spark, d)
    val bigEmb = (0 until mult).map { i =>
      emb.select((col("vec_id") + i * 1000000L).as("vec_id"), col("embedding"))
    }.reduce(_ unionAll _)
    time("ivf_topk")(Similarity.ivfTopK(
      bigEmb.where(col("vec_id") < 100), bigEmb, k = 10, nlist = 64, nprobe = 8).count())
    time("semantic_dedup")(
      Similarity.semanticDedup(bigEmb, nlist = 64, threshold = 0.95).count())
    // real codecs (javax.imageio / javax.sound.sampled): encode+decode+
    // resize/hash per row, all inside partitions — cost must stay linear
    // in row count
    val ids = big.select(col("id"))
    time("image_decode_resize")(
      graft.analytics.Multimodal.decodeImagesReal(
        graft.analytics.Multimodal.syntheticImages(ids, "id"), 16, 16).count())
    time("audio_decode")(
      graft.analytics.Multimodal.decodeAudioReal(
        graft.analytics.Multimodal.syntheticAudio(ids, "id")).count())
    spark.stop()
  }
}
