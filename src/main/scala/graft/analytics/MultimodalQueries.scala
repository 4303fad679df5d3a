package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.sources.Tables

/** Correctness-gate queries for the multimodal plumbing. The media corpus
  * is derived deterministically from `documents` (UTF-8 text bytes as the
  * blob), so the stub codecs are fully oracle-checkable in SQL byte math. */
object MultimodalQueries extends QueryModule {

  private def media(s: SparkSession, d: String): DataFrame =
    Multimodal.asMedia(Tables.documents(s, d), "doc_id", "text")

  /** Feature extraction + codegen'd cosine top-3 over the feature column. */
  private def knn(s: SparkSession, d: String): DataFrame = {
    val feats = Multimodal.extractFeatures(media(s, d), dim = 8)
    Similarity.bruteForceTopK(
        feats.where(col("media_id") < 10), feats, 3, "media_id", "feature")
      .withColumn("sim", round(col("sim"), 6))
      .orderBy(col("query_id"), col("rank"))
  }

  private def frames(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFrames(media(s, d).where(col("media_id") < 50), 256)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        max(when(col("frame_idx") === 0, col("checksum"))).as("frame0_checksum"))
      .orderBy(col("media_id"))

  private def decodeResize(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeAndResize(media(s, d).where(col("media_id") < 20), 64)
      .select(col("media_id"), col("width"), col("height"),
        length(col("resized")).as("resized_len"))
      .orderBy(col("media_id"))

  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "multimodal_feature_knn" -> (knn _),
    "multimodal_frames" -> (frames _),
    "multimodal_decode_resize" -> (decodeResize _)
  )

  def oracles: Seq[(String, String)] = Seq(
    "multimodal_feature_knn" ->
      s"""WITH pos AS (
        |  SELECT doc_id AS media_id, i, ascii(substr(text, CAST(i AS INT), 1)) AS bv
        |  FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i FROM documents)),
        |dims AS (
        |  SELECT media_id, CAST((i - 1) % 8 AS INT) AS d, sum(bv) AS s
        |  FROM pos GROUP BY 1, 2),
        |feats AS (
        |  SELECT media_id, list(CAST(s % 997 AS DOUBLE) / 997.0 ORDER BY d) AS v
        |  FROM dims GROUP BY 1),
        |scored AS (
        |  SELECT q.media_id AS query_id, c.media_id AS neighbor_id,
        |    list_dot_product(q.v, c.v)
        |      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS sim
        |  FROM feats q JOIN feats c ON q.media_id < 10 AND q.media_id <> c.media_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim
        |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "multimodal_frames" ->
      s"""WITH pos AS (
        |  SELECT doc_id AS media_id, i, ascii(substr(text, CAST(i AS INT), 1)) AS bv,
        |         length(text) AS len
        |  FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i FROM documents)
        |  WHERE doc_id < 50)
        |SELECT media_id,
        |  CAST(ceil(CAST(max(len) AS DOUBLE) / 256.0) AS BIGINT) AS n_frames,
        |  CAST(sum(CASE WHEN i <= 256 THEN bv ELSE 0 END) AS BIGINT) AS frame0_checksum
        |FROM pos GROUP BY 1 ORDER BY 1""".stripMargin,
    "multimodal_decode_resize" ->
      s"""WITH dims AS (
        |  SELECT doc_id AS media_id, length(text) AS len,
        |    greatest(1, CAST(floor(sqrt(CAST(length(text) AS DOUBLE))) AS INT)) AS w
        |  FROM documents WHERE doc_id < 20)
        |SELECT media_id, w AS width,
        |  CAST(greatest(1, len // w) AS INT) AS height,
        |  CAST(least(len, 64) AS INT) AS resized_len
        |FROM dims ORDER BY 1""".stripMargin
  )
}
