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
  * and tested. Image decode is REAL — [[ImageCodecs]] uses `javax.imageio`
  * (in the JDK: PNG/JPEG/GIF/BMP) with a deterministic nearest-neighbor
  * resize. Audio decode is REAL — [[AudioCodecs]] uses
  * `javax.sound.sampled` (in the JDK: WAV/AIFF, PCM). Blobs that are not
  * decodable fall back to the deterministic byte-level [[StubCodecs]],
  * which also stand in for the video codec layer (no video library ships
  * in this environment — that one stays a loudly-labeled stub).
  */
object Multimodal {

  /** Real image codec layer on `javax.imageio` — decode, deterministic
    * resize, and an order-independent pixel hash that pure SQL can
    * reproduce for synthetic images (the oracle path).
    *
    * Determinism notes: PNG is lossless and gray samples round-trip
    * exactly; nearest-neighbor source mapping is integer math
    * (`sx = tx*srcW/dstW`), no filtering kernel, so the resized raster is
    * bit-reproducible across JVMs — unlike Graphics2D scaling hints. */
  object ImageCodecs {

    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    /** Deterministic synthetic grayscale PNG for tests/oracles:
      * pixel(x,y) = (seed*31 + x*7 + y*13) mod 256. */
    def syntheticPng(seed: Long, w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, ((seed * 31 + x * 7 + y * 13) % 256).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Decode via ImageIO; None when the bytes are not a supported image
      * (ImageIO.read returns null rather than throwing for unknown data).
      * NonFatal, not just IOException: plugin readers throw runtime
      * exceptions (IllegalArgument, CMM, index) on malformed/truncated
      * blobs, and a bad blob must take the stub fallback, not fail the
      * task. */
    def decode(bytes: Array[Byte]): Option[BufferedImage] =
      if (bytes == null || bytes.length == 0) None
      else try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }

    /** Nearest-neighbor resize with exact integer source mapping
      * (`sx = tx*srcW/dstW`), output grayscale. */
    def resizeNearest(img: BufferedImage, tw: Int, th: Int): BufferedImage = {
      val out = new BufferedImage(tw, th, BufferedImage.TYPE_BYTE_GRAY)
      val src = img.getRaster
      val dst = out.getRaster
      val gray = img.getType == BufferedImage.TYPE_BYTE_GRAY
      var ty = 0
      while (ty < th) {
        val sy = ty * img.getHeight / th
        var tx = 0
        while (tx < tw) {
          val sx = tx * img.getWidth / tw
          val g =
            if (gray) src.getSample(sx, sy, 0)
            else { // luma of packed RGB, integer BT.601 (deterministic)
              val rgb = img.getRGB(sx, sy)
              ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
            }
          dst.setSample(tx, ty, 0, g)
          tx += 1
        }
        ty += 1
      }
      out
    }

    /** Order-independent pixel hash a SQL oracle can recompute:
      * Σ gray(x,y) · (y·W + x + 1) — position-weighted so permutations
      * differ, pure integer math so engines agree exactly. */
    def pixelHash(img: BufferedImage): Long = {
      val raster = img.getRaster
      var h = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          h += raster.getSample(x, y, 0).toLong * (y.toLong * img.getWidth + x + 1)
          x += 1
        }
        y += 1
      }
      h
    }

    /** Re-encode as PNG (the resized-blob handoff format). */
    def encodePng(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  /** Real audio codec layer on `javax.sound.sampled` (in the JDK: WAV/AIFF
    * containers, PCM encodings) — the same no-new-dependency pattern as
    * [[ImageCodecs]]. Decode converts any PCM stream to 16-bit signed
    * mono-interleaved samples; PCM is lossless so synthetic WAV bytes
    * round-trip exactly, making the sample hash SQL-reproducible. */
  object AudioCodecs {

    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    final case class Decoded(sampleRate: Int, channels: Int, samples: Array[Int])

    /** Deterministic synthetic 16-bit PCM mono WAV for tests/oracles:
      * sample(i) = ((seed*31 + i*7) mod 2001) - 1000. */
    def syntheticWav(seed: Long, nSamples: Int, sampleRate: Int = 8000): Array[Byte] = {
      val pcm = new Array[Byte](nSamples * 2)
      var i = 0
      while (i < nSamples) {
        val s = (((seed * 31 + i.toLong * 7) % 2001) - 1000).toInt
        pcm(2 * i) = (s & 0xff).toByte          // little-endian
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
      val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nSamples.toLong)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Decode a WAV/AIFF blob to 16-bit signed samples (channel-interleaved
      * when stereo). None for non-audio or malformed bytes — undecodable
      * blobs take the stub fallback, never fail the task. */
    def decode(bytes: Array[Byte]): Option[Decoded] =
      if (bytes == null || bytes.length == 0) None
      else try {
        val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
        val src = in.getFormat
        val target = new AudioFormat(
          src.getSampleRate, 16, src.getChannels, true, false)
        val pcmIn =
          if (src.matches(target)) in
          else AudioSystem.getAudioInputStream(target, in)
        val raw = pcmIn.readAllBytes()
        val n = raw.length / 2
        val samples = new Array[Int](n)
        var i = 0
        while (i < n) {
          samples(i) = ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff))
          i += 1
        }
        Some(Decoded(src.getSampleRate.toInt, src.getChannels, samples))
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Position-weighted sample hash a SQL oracle can recompute:
      * Σ sample(i) · (i + 1) — integer math, exact under PCM. */
    def sampleHash(samples: Array[Int]): Long = {
      var h = 0L
      var i = 0
      while (i < samples.length) {
        h += samples(i).toLong * (i + 1)
        i += 1
      }
      h
    }

    /** Feature extraction for the Similarity handoff: mean absolute
      * amplitude per of `dim` equal time buckets, scaled to [0, 1). */
    def features(samples: Array[Int], dim: Int): Array[Double] = {
      val sums = new Array[Long](dim)
      val counts = new Array[Long](dim)
      var i = 0
      while (i < samples.length) {
        val d = if (samples.length < dim) i % dim else i * dim / samples.length
        sums(d) += math.abs(samples(i))
        counts(d) += 1
        i += 1
      }
      Array.tabulate(dim)(d =>
        if (counts(d) == 0) 0.0 else sums(d).toDouble / counts(d) / 32768.0)
    }
  }

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

  /** Deterministic synthetic image corpus: one grayscale PNG per id, dims
    * derived from the id — REAL encoded bytes generated inside partitions
    * (executors encode; the driver never touches a blob). At 100 TB the
    * blobs arrive in the table instead; everything downstream is the
    * same. */
  def syntheticImages(ids: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType),
      StructField("bytes", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    ids.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w = 8 + (id % 9).toInt
        val h = 8 + (id % 7).toInt
        Row(id, ImageCodecs.syntheticPng(id, w, h))
      }
    }(enc)
  }

  /** Deterministic synthetic WAV corpus (16-bit PCM mono, real containers):
    * n_samples = 50 + id mod 50. */
  def syntheticAudio(ids: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType),
      StructField("bytes", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    ids.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, AudioCodecs.syntheticWav(id, 50 + (id % 50).toInt))
      }
    }(enc)
  }

  /** REAL image decode + resize: javax.imageio decode, deterministic
    * nearest-neighbor resize to tw×th, position-weighted pixel hash.
    * Blobs that are not decodable images fall back to the stub dims with
    * `decoded = false` (the documented contract: bad blobs never fail the
    * task). Partition-wise; the driver never sees a blob. */
  def decodeImagesReal(media: DataFrame, tw: Int = 16, th: Int = 16): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType),
      StructField("decoded", BooleanType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("resized_hash", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    media.select(col("media_id"), col("bytes")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        ImageCodecs.decode(bytes) match {
          case Some(img) =>
            val resized = ImageCodecs.resizeNearest(img, tw, th)
            Row(id, true, img.getWidth, img.getHeight, ImageCodecs.pixelHash(resized))
          case None =>
            val (w, h) = StubCodecs.decodeDims(if (bytes == null) Array.emptyByteArray else bytes)
            Row(id, false, w, h, 0L)
        }
      }
    }(enc)
  }

  /** REAL audio decode: javax.sound.sampled WAV/PCM decode → sample count,
    * rate, channels, and the SQL-reproducible sample hash; undecodable
    * blobs fall back to the stub with `decoded = false`. */
  def decodeAudioReal(media: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType),
      StructField("decoded", BooleanType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("n_samples", LongType),
      StructField("sample_hash", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    media.select(col("media_id"), col("bytes")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        AudioCodecs.decode(bytes) match {
          case Some(d) =>
            Row(id, true, d.sampleRate, d.channels,
              (d.samples.length / d.channels).toLong, AudioCodecs.sampleHash(d.samples))
          case None =>
            Row(id, false, 0, 0, 0L, 0L)
        }
      }
    }(enc)
  }

  /** Audio feature handoff: decoded bucket-amplitude features as
    * array<double> for Similarity (brute-force / IVF / LSH all accept it). */
  def extractAudioFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType),
      StructField("feature", ArrayType(DoubleType))))
    val enc = org.apache.spark.sql.Encoders.row(out)
    media.select(col("media_id"), col("bytes")).mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](1)
        AudioCodecs.decode(bytes).map { d =>
          Row(r.getLong(0), AudioCodecs.features(d.samples, dim).toSeq)
        }
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
