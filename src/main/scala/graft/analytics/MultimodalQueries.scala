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

  /** REAL image path: executor-side synthetic PNG encode (javax.imageio),
    * real decode, deterministic nearest-neighbor resize to 16×16, and the
    * position-weighted pixel hash the oracle recomputes from the synthetic
    * pixel formula — proving decode→resize→hash is bit-exact, not stubbed. */
  private def imageReal(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeImagesReal(
        Multimodal.syntheticImages(
          Tables.documents(s, d).where(col("doc_id") < 20), "doc_id"), 16, 16)
      .select(col("media_id"), col("width"), col("height"), col("resized_hash"))
      .orderBy(col("media_id"))

  /** REAL audio path: executor-side synthetic WAV encode
    * (javax.sound.sampled), real PCM decode, SQL-reproducible sample hash. */
  private def audioDecode(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeAudioReal(
        Multimodal.syntheticAudio(
          Tables.documents(s, d).where(col("doc_id") < 30), "doc_id"))
      .select(col("media_id"), col("sample_rate"), col("channels"),
        col("n_samples"), col("sample_hash"))
      .orderBy(col("media_id"))

  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "multimodal_feature_knn" -> (knn _),
    "multimodal_frames" -> (frames _),
    "multimodal_decode_resize" -> (decodeResize _),
    "multimodal_image_real" -> (imageReal _),
    "multimodal_audio_decode" -> (audioDecode _)
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
        |FROM dims ORDER BY 1""".stripMargin,
    // the synthetic pixel formula pixel(x,y) = (seed*31 + x*7 + y*13) % 256
    // with nearest-neighbor mapping sx = tx*w//16 recomputed in pure SQL —
    // matches only if PNG encode→ImageIO decode→resize is bit-exact
    "multimodal_image_real" ->
      s"""WITH ids AS (
        |  SELECT doc_id AS media_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
        |  FROM documents WHERE doc_id < 20),
        |px AS (
        |  SELECT media_id, w, h, t2.ty, t1.tx,
        |    (media_id * 31 + ((t1.tx * w) // 16) * 7 + ((t2.ty * h) // 16) * 13) % 256 AS g
        |  FROM ids, range(16) AS t1(tx), range(16) AS t2(ty))
        |SELECT media_id, CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
        |  CAST(sum(g * (ty * 16 + tx + 1)) AS BIGINT) AS resized_hash
        |FROM px GROUP BY media_id ORDER BY media_id""".stripMargin,
    // sample(i) = ((seed*31 + i*7) % 2001) - 1000, hash = Σ s_i·(i+1):
    // exact under 16-bit PCM, so WAV encode→javax.sound decode must
    // round-trip bit-exactly for the hash to match
    "multimodal_audio_decode" ->
      s"""WITH ids AS (
        |  SELECT doc_id AS media_id, 50 + doc_id % 50 AS n
        |  FROM documents WHERE doc_id < 30),
        |smp AS (
        |  SELECT media_id, t.i, (media_id * 31 + t.i * 7) % 2001 - 1000 AS s
        |  FROM ids, range(100) AS t(i) WHERE t.i < ids.n)
        |SELECT media_id, CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(sum(s * (i + 1)) AS BIGINT) AS sample_hash
        |FROM smp GROUP BY media_id ORDER BY media_id""".stripMargin
  )
}
