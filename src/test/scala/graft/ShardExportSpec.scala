package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.analytics.{Corpus, ShardExport}
import graft.sources.Tables

/** Training-shard export: manifest integrity, one file per shard with
  * (seq, id) order and contiguous positions, deterministic digests,
  * replay no-op, crash resume, input-change detection. */
class ShardExportSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def listDataFiles(out: String): Map[String, Seq[java.io.File]] =
    new java.io.File(s"$out/data").listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      .map(d => d.getName ->
        d.listFiles().toSeq.filter(_.getName.endsWith(".parquet"))).toMap

  test("export writes one sorted file per shard; manifest matches the " +
    "pack assignment; positions are contiguous") {
    val docs = Tables.documents(spark, sf)
    val out = Files.createTempDirectory("shards").toString
    val manifest = ShardExport.exportShards(docs, out, budget = 256, shardSize = 20)
      .collect().map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_seqs"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))
      .toMap
    // independent expectation from the packer itself
    val expect = Corpus.packFfd(docs, 256, 20)
      .groupBy("shard").agg(countDistinct("seq").as("s"),
        count(lit(1)).as("d"), sum("n_tokens").as("t"))
      .collect().map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("s"), r.getAs[Long]("d"), r.getAs[Long]("t"))).toMap
    assert(manifest == expect)
    assert(Files.exists(Paths.get(out, "_SHARDS_OK")))
    // one parquet file per shard directory
    val files = listDataFiles(out)
    assert(files.nonEmpty && files.size == manifest.size)
    files.foreach { case (shard, fs) =>
      assert(fs.size == 1, s"$shard has ${fs.size} files")
    }
    // in-file order (seq, id), positions contiguous from 1
    files.keys.foreach { shardDir =>
      val rows = spark.read.parquet(s"$out/data/$shardDir")
        .select("seq", "id", "pos").collect()
        .map(r => (r.getAs[Long]("seq"), r.getAs[Long]("id"), r.getAs[Long]("pos")))
      val inOrder = rows.sortBy(r => (r._1, r._2))
      assert(rows.map(_._3).toSeq == (1L to rows.length).toSeq.sorted,
        s"$shardDir: positions not contiguous")
      assert(inOrder.map(_._3).toSeq == (1L to rows.length),
        s"$shardDir: pos does not follow (seq, id) order")
    }
  }

  test("replay is a no-op; crash resume rewrites identically; changed " +
    "input re-exports") {
    val docs = Tables.documents(spark, sf)
    val out = Files.createTempDirectory("shards").toString
    val m1 = ShardExport.exportShards(docs, out, 256, 20).collect().toSeq
    val stamps = listDataFiles(out).values.flatten.map(f => f.getPath -> f.lastModified)
    // replay: marker digest matches -> nothing rewritten
    val m2 = ShardExport.exportShards(docs, out, 256, 20).collect().toSeq
    assert(m2.map(_.toSeq).toSet == m1.map(_.toSeq).toSet)
    stamps.foreach { case (p, t) =>
      assert(new java.io.File(p).lastModified == t, s"replay rewrote $p")
    }
    assert(!Files.exists(Paths.get(out, "manifest_tmp")),
      "replay must clean up its staged manifest")
    // crash resume: marker lost -> full rewrite, manifest identical
    Files.delete(Paths.get(out, "_SHARDS_OK"))
    val m3 = ShardExport.exportShards(docs, out, 256, 20).collect().toSeq
    assert(m3.map(_.toSeq).toSet == m1.map(_.toSeq).toSet,
      "re-export after marker loss must be byte-deterministic")
    assert(Files.exists(Paths.get(out, "_SHARDS_OK")))
    // changed input -> digest mismatch -> re-export reflects the change
    val smaller = docs.where(col("doc_id") =!= 0L)
    val m4 = ShardExport.exportShards(smaller, out, 256, 20).collect().toSeq
    assert(m4.map(_.toSeq).toSet != m1.map(_.toSeq).toSet)
    val shard0 = m4.map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs")))
      .toMap.get(0L)
    val before = m1.map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs")))
      .toMap.apply(0L)
    assert(shard0.contains(before - 1))
  }
}
