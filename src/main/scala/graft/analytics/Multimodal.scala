package graft.analytics

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support for training-data
  * pipelines.
  *
  * Design: media are opaque `binary` columns with a typed metadata struct —
  * the 100 TB-scale pattern where blobs travel with their rows (or as
  * object-store pointers) and decode happens batched inside partitions,
  * never on the driver. The Spark-side plumbing here (schema, batch shape,
  * partition-wise execution, feature-column handoff to Similarity) is real
  * and tested; the actual codec calls are STUBBED with deterministic
  * byte-level fakes because no image/audio libraries ship in this
  * environment — swap [[StubCodecs]] for real decoders in production.
  */
object Multimodal {

  /** Canonical media envelope: blob + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("channels", IntegerType)
    )))))

  /** Deterministic stand-ins for the codec layer. Each function is a pure
    * function of the blob bytes so tests and oracles are reproducible. */
  object StubCodecs {
    /** STUB image decode: pretend the blob is a row-major grayscale image.
      * A real implementation would call an image codec here. */
    def decodeDims(bytes: Array[Byte]): (Int, Int) = {
      val w = math.max(1, math.sqrt(bytes.length.toDouble).toInt)
      (w, math.max(1, bytes.length / w))
    }

    /** STUB feature extractor: `dim` features; feature d = (sum of byte
      * values at positions ≡ d mod dim, as unsigned) % 997 / 997.0. */
    def features(bytes: Array[Byte], dim: Int): Array[Double] = {
      val acc = new Array[Long](dim)
      var i = 0
      while (i < bytes.length) {
        acc(i % dim) += bytes(i) & 0xff
        i += 1
      }
      acc.map(s => (s % 997).toDouble / 997.0)
    }

    /** STUB frame sampler: a "video" blob yields one frame per
      * `frameBytes` chunk; frame checksum = sum of its unsigned bytes. */
    def frames(bytes: Array[Byte], frameBytes: Int): Seq[(Int, Long)] =
      bytes.grouped(frameBytes).zipWithIndex.map { case (chunk, idx) =>
        (idx, chunk.foldLeft(0L)((a, b) => a + (b & 0xff)))
      }.toSeq

    /** STUB resize: keeps a deterministic subsample of the blob. */
    def resize(bytes: Array[Byte], targetLen: Int): Array[Byte] =
      if (bytes.length <= targetLen) bytes
      else Array.tabulate(targetLen)(i => bytes(i * bytes.length / targetLen))
  }

  /** Wrap any table with a text/blob column as a media table (used to
    * derive a deterministic media corpus from the documents table). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
      kind: String = "image"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(payloadCol).cast("binary").as("bytes"),
      struct(
        lit("stub").as("format"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        (length(col(payloadCol)) * 10).cast("long").as("duration_ms"),
        lit(1).as("channels")).as("meta"))

  /** Batched partition-wise feature extraction (the mapInPandas-shaped
    * path: iterator-of-batches in, iterator-of-batches out; executors touch
    * bytes, the driver never does). Output: (media_id, feature: array<double>). */
  def extractFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    val out = StructType(Seq(
      StructField("media_id", LongType),
      StructField("feature", ArrayType(DoubleType))))
    val enc = org.apache.spark.sql.Encoders.row(out)
    media.select(col("media_id"), col("bytes")).mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        Row(r.getAs[Long]("media_id"), StubCodecs.features(bytes, dim).toSeq)
      }
    }(enc)
  }

  /** Decode + resize pipeline: fills meta dims from the (stub) decoder and
    * attaches a resized blob — same partition-wise batch shape. */
  def decodeAndResize(media: DataFrame, targetLen: Int): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("resized", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    media.select(col("media_id"), col("bytes")).mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        val (w, h) = StubCodecs.decodeDims(bytes)
        Row(r.getAs[Long]("media_id"), w, h, StubCodecs.resize(bytes, targetLen))
      }
    }(enc)
  }

  /** Frame sampling: one output row per sampled frame. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 256): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("checksum", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    media.select(col("media_id"), col("bytes")).mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        StubCodecs.frames(bytes, frameBytes).map { case (idx, sum) =>
          Row(r.getAs[Long]("media_id"), idx, sum)
        }
      }
    }(enc)
  }
}
