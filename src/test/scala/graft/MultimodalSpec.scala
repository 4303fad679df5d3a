package graft

import org.apache.spark.sql.functions._
import graft.analytics.{Multimodal, Similarity}

/** Multimodal plumbing: schema, batch shape, determinism, feature handoff. */
class MultimodalSpec extends SparkTestBase {

  private lazy val media = {
    val s = spark; import s.implicits._
    Multimodal.asMedia(
      Seq((1L, "a" * 300), (2L, "ab" * 200), (3L, "xyz")).toDF("id", "payload"),
      "id", "payload", kind = "video")
  }

  test("media envelope has the canonical blob + typed-metadata shape") {
    assert(media.schema("bytes").dataType.typeName == "binary")
    val meta = media.where(col("media_id") === 1).select("meta.duration_ms", "meta.channels").head
    assert(meta.getLong(0) == 3000L && meta.getInt(1) == 1)
  }

  test("feature extraction is deterministic and lands in array<double>") {
    val f1 = Multimodal.extractFeatures(media, 8).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(media, 8).orderBy("media_id").collect()
    assert(f1.map(_.getSeq[Double](1)).toSeq == f2.map(_.getSeq[Double](1)).toSeq)
    assert(f1.head.getSeq[Double](1).size == 8)
    // 'a'*300: every byte 97; feature d = (sum over ~37-38 bytes) % 997 / 997
    val a = f1.find(_.getLong(0) == 1L).get.getSeq[Double](1)
    assert(a.forall(v => v >= 0.0 && v < 1.0))
  }

  test("features flow into similarity search") {
    val feats = Multimodal.extractFeatures(media, 8)
    val top = Similarity.bruteForceTopK(
      feats.where(col("media_id") === 1), feats, 1, "media_id", "feature")
    assert(top.count() == 1)
  }

  test("frame sampling yields ceil(len/frameBytes) frames per blob") {
    val fr = Multimodal.sampleFrames(media, 256)
      .groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fr == Map(1L -> 2L, 2L -> 2L, 3L -> 1L)) // 300->2, 400->2, 3->1
  }

  test("decode/resize stub fills dims and caps blob size") {
    val d = Multimodal.decodeAndResize(media, 64).orderBy("media_id").collect()
    val r1 = d(0)
    assert(r1.getInt(1) == 17 && r1.getInt(2) == 17) // sqrt(300)≈17
    assert(d.forall(_.getAs[Array[Byte]]("resized").length <= 64))
    assert(d(2).getAs[Array[Byte]]("resized").length == 3) // short blob kept
  }

  // ------------------------------------------------------- real codecs

  test("image: PNG encode → ImageIO decode → resize → hash is bit-exact") {
    import Multimodal.ImageCodecs
    val (seed, w, h) = (5L, 10, 9)
    val img = ImageCodecs.decode(ImageCodecs.syntheticPng(seed, w, h)).get
    assert(img.getWidth == w && img.getHeight == h)
    val resized = ImageCodecs.resizeNearest(img, 16, 16)
    // expected hash straight from the synthetic pixel formula + NN mapping
    var expected = 0L
    for (ty <- 0 until 16; tx <- 0 until 16) {
      val (sx, sy) = (tx * w / 16, ty * h / 16)
      val g = ((seed * 31 + sx * 7 + sy * 13) % 256).toInt
      expected += g.toLong * (ty * 16 + tx + 1)
    }
    assert(ImageCodecs.pixelHash(resized) == expected)
    assert(ImageCodecs.decode("not an image".getBytes).isEmpty)
  }

  test("audio: WAV encode → javax.sound decode round-trips PCM exactly") {
    import Multimodal.AudioCodecs
    val wav = AudioCodecs.syntheticWav(7L, 100)
    val d = AudioCodecs.decode(wav).get
    assert(d.sampleRate == 8000 && d.channels == 1 && d.samples.length == 100)
    val expected = Array.tabulate(100)(i => (((7L * 31 + i * 7) % 2001) - 1000).toInt)
    assert(d.samples.toSeq == expected.toSeq)
    assert(AudioCodecs.sampleHash(d.samples) ==
      expected.zipWithIndex.map { case (s, i) => s.toLong * (i + 1) }.sum)
    assert(AudioCodecs.decode("not audio at all".getBytes).isEmpty)
  }

  test("decodeAudioReal: real rows decode, garbage rows take the stub fallback") {
    val s = spark; import s.implicits._
    val rows = Seq(
      (1L, Multimodal.AudioCodecs.syntheticWav(1L, 60)),
      (2L, "garbage-bytes".getBytes)).toDF("media_id", "bytes")
    val out = Multimodal.decodeAudioReal(rows).orderBy("media_id").collect()
    assert(out(0).getBoolean(1) && out(0).getLong(4) == 60L)
    assert(!out(1).getBoolean(1) && out(1).getLong(4) == 0L)
  }

  test("realistic blob sizes decode partition-locally; >16 MiB blobs refused at the log layer") {
    val s = spark; import s.implicits._
    // a 4-megapixel image (what a real photo decodes to) and a >1 MiB WAV:
    // decode + resize + hash run inside the partition and stay memory-bounded
    // (one decoded blob at a time per task, never collected to the driver)
    val bigPng = Multimodal.ImageCodecs.syntheticPng(11L, 2048, 2048)
    val bigWav = Multimodal.AudioCodecs.syntheticWav(11L, 600000)
    assert(bigWav.length > 1024 * 1024)
    val img = Multimodal.decodeImagesReal(
      Seq((1L, bigPng)).toDF("media_id", "bytes")).head()
    assert(img.getBoolean(1) && img.getInt(2) == 2048 && img.getInt(3) == 2048)
    val aud = Multimodal.decodeAudioReal(
      Seq((2L, bigWav)).toDF("media_id", "bytes")).head()
    assert(aud.getBoolean(1) && aud.getLong(4) == 600000L)
    // the log layer's record ceiling (reference TFConsts 16 MiB) is the
    // pinned max blob size for event-carried media; larger blobs belong in
    // media tables as parquet binary, which has no such ceiling
    val store = new graft.sources.EventLogStore(spark,
      java.nio.file.Files.createTempDirectory("blob").toString)
    val err = intercept[graft.sources.MaxAppendSizeExceededException] {
      store.append(Seq(graft.sources.PendingEvent(
        "media-1", "e-blob", "BlobAttached", "x" * (16 * 1024 * 1024 + 1))))
    }
    assert(err.getMessage.contains("16 MiB"))
  }

  test("audio features flow into similarity search") {
    val s = spark; import s.implicits._
    val ids = Seq(1L, 2L, 3L, 4L).toDF("id")
    val audio = Multimodal.syntheticAudio(ids, "id")
    val feats = Multimodal.extractAudioFeatures(audio, 8)
    assert(feats.count() == 4)
    assert(feats.head.getSeq[Double](1).size == 8)
    val top = Similarity.bruteForceTopK(
      feats.where(col("media_id") === 1), feats, 2, "media_id", "feature")
    assert(top.count() == 2)
  }
}
