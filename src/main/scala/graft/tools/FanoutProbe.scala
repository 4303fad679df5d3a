package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Measures the single-row-group scan bottleneck: the driver testdata
  * parquet files hold ONE row group each, so a scan is one task and every
  * narrow CPU-heavy pipeline above it (tokenizers, quantizers, per-row
  * text ops) runs serial regardless of core count. This probe times
  * representative narrow queries as-is vs behind a round-robin fanout
  * repartition, to size the win before wiring anything in.
  *
  * Usage: FanoutProbe [sfDir]. One JSON line to stdout. */
object FanoutProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.create(master = "local[32]", shufflePartitions = 32)
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    def bpe(docs: DataFrame): DataFrame =
      docs.select(col("doc_id"),
        graft.analytics.Bpe.tokenize(col("text")).as("_t"))
        .select(col("doc_id"),
          size(col("_t")).cast("long").as("n_bpe_trained"),
          md5(concat_ws(graft.analytics.Bpe.PieceSep, col("_t"))).as("tok_md5"))
    def sq8(emb: DataFrame): DataFrame = graft.analytics.Similarity.sq8(emb)

    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // warmup both shapes once
    time(bpe(docs)); time(bpe(docs.repartition(32))); time(sq8(emb)); time(sq8(emb.repartition(32)))
    results("bpe_plain") = time(bpe(docs))
    results("bpe_fanout32") = time(bpe(docs.repartition(32)))
    results("sq8_plain") = time(sq8(emb))
    results("sq8_fanout32") = time(sq8(emb.repartition(32)))
    results("scan_parts_docs") = docs.rdd.getNumPartitions.toDouble
    results("scan_parts_emb") = emb.rdd.getNumPartitions.toDouble
    println(results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
