package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.analytics.Corpus
import graft.sources.Tables

/** Label-count scaling probe for the Naive Bayes classifier: per-row
  * scoring is O(tokens × labels) array arithmetic by construction, and
  * the model is labels × buckets doubles — this pins the MEASURED shape
  * at labels ∈ {5, 50, 500} (synthetic labels = xxhash64(doc_id) mod L
  * over a replicated sf0.1 corpus) so a many-class taxonomy filter has a
  * cost model instead of a guess. Also measures the r12 shared-hash
  * pipeline (`naiveBayesTrainClassify`, grams hashed once) against the
  * separate train+classify it replaces, at the base label count.
  *
  * Usage: NbLabelProbe [mult]   (default 10 → ~50k docs)
  * One JSON line, also written to /tmp/nb_label_probe.json. */
object NbLabelProbe {

  def main(args: Array[String]): Unit = {
    val mult = args.lift(0).map(_.toInt).getOrElse(10)
    val spark = graft.GraftSession.create(master = "local[32]", shufflePartitions = 32)
    spark.sparkContext.setLogLevel("WARN")

    val lo = "abcdefghijklm"
    val hi = "nopqrstuvwxyz"
    def rot(a: String, k: Int) = a.drop(k % a.length) + a.take(k % a.length)
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    val corpus = (0 until mult).map { i =>
      base.select((col("doc_id") + i * 10000000L).as("doc_id"),
        translate(col("text"), lo + hi, rot(lo, i % 13) + rot(hi, (i / 13) % 13)).as("text"))
    }.reduce(_ unionAll _).repartition(32)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = corpus.count()
    println(s"corpus: $n docs")

    def time(body: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      body.write.mode("overwrite").format("noop").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache() // drop the pipeline's feature cache
      corpus.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
      t
    }
    def labeled(l: Int) =
      corpus.withColumn("lab", pmod(xxhash64(col("doc_id")), lit(l)).cast("string"))

    // warm codegen/JIT at the smallest shape
    time(Corpus.naiveBayesTrainClassify(labeled(5), "lab", col("doc_id") % 5 =!= 0))

    val perLabel = Seq(5, 50, 500).map { l =>
      val t = time(Corpus.naiveBayesTrainClassify(labeled(l), "lab",
        col("doc_id") % 5 =!= 0))
      println(f"labels=$l%4d  $t%7.2f s")
      l -> t
    }
    // shared-hash pipeline vs the separate train+classify it replaces
    val tSplit = time {
      val d = labeled(5)
      val model = Corpus.naiveBayesTrain(d.where(col("doc_id") % 5 =!= 0), "lab", "text")
      Corpus.naiveBayesClassify(d, model)
    }
    val tShared = time(Corpus.naiveBayesTrainClassify(labeled(5), "lab",
      col("doc_id") % 5 =!= 0))
    println(f"split=$tSplit%.2f s shared=$tShared%.2f s")

    val json = s"""{"mult":$mult,"docs":$n,""" +
      perLabel.map { case (l, t) => f""""labels_$l":$t%.2f""" }.mkString(",") + "," +
      f""""split_5":$tSplit%.2f,"shared_5":$tShared%.2f,""" +
      f""""ratio_500_over_5":${perLabel(2)._2 / perLabel(0)._2}%.2f}"""
    println(json)
    Files.write(Paths.get("/tmp/nb_label_probe.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
