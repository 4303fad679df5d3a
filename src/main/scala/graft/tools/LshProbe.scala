package graft.tools

import org.apache.spark.sql.functions._

object LshProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create(master = "local[32]", shufflePartitions = 64)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Tables.embeddings(spark, "/tmp/graft_scale/x100")
    val n = emb.count()
    println(s"vectors: $n, autoPlanes: ${graft.analytics.Similarity.autoPlanes(n)}")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"$label ${(System.nanoTime() - t0) / 1e9}%.2f s ($c pairs)")
    }
    t("banded-auto warm")(graft.analytics.Similarity
      .lshNearDupPairsBanded(emb, 0.4, graft.analytics.Similarity.autoPlanes(n)).count())
    t("banded-auto")(graft.analytics.Similarity
      .lshNearDupPairsBanded(emb, 0.4, graft.analytics.Similarity.autoPlanes(n)).count())
    spark.stop()
  }
}
