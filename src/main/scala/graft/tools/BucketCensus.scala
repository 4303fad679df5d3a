package graft.tools

import org.apache.spark.sql.functions._

/** Sign-LSH bucket-size census over a scaled embeddings corpus — the
  * instrument behind the serving-ingest geometry choice (BASELINE.md
  * r14): prints the corpus count, the auto plane count at a given
  * bucket target, the ten largest buckets, and Σ count² — the ingest
  * probe self-join's candidate-pair volume, the quantity that must stay
  * inside executor memory at scale.
  *
  * Usage: BucketCensus [dir] [targetBucket] (defaults:
  * /tmp/graft_scale/x100, 256). */
object BucketCensus {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/x100")
    val target = args.lift(1).map(_.toLong).getOrElse(256L)
    val spark = graft.GraftSession.create(master = "local[16]", shufflePartitions = 32)
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val p = graft.analytics.Similarity.autoPlanes(n, target)
    println(s"n=$n targetBucket=$target planes=$p")
    val ix = graft.analytics.DedupStream.CosineLshIndexer(threshold = 0.4,
      planes = p, tables = 2, idCol = "id", vecCol = "embedding", dims = 64)
    val idx = ix.index(emb.select(col("vec_id").as("id"), col("embedding")))
    val buckets = idx
      .select(col("id"), posexplode(col("band_keys")).as(Seq("band", "bk")))
      .groupBy("band", "bk").count()
    buckets.orderBy(desc("count")).show(10, false)
    val pairs = buckets.agg(sum(col("count") * col("count"))).first().getLong(0)
    println(s"sum count^2 (ingest candidate volume) = $pairs")
    spark.stop()
  }
}
