package graft

import org.apache.spark.sql.functions._
import graft.analytics.Corpus
import graft.sources.Tables

/** Corpus-assembly operators: packing, chunking, cleaning, quota sampling. */
class CorpusSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("packSequences: offsets are the within-shard prefix sums; windows cut at the budget") {
    val packed = Corpus.packSequences(Tables.documents(spark, sf), budget = 256, shardSize = 100)
    val rows = packed.orderBy("shard", "id").collect()
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
    byShard.foreach { case (_, docs) =>
      var expectedStart = 0L
      docs.sortBy(_.getAs[Long]("id")).foreach { r =>
        assert(r.getAs[Long]("start") == expectedStart)
        assert(r.getAs[Long]("seq") == expectedStart / 256)
        expectedStart += r.getAs[Long]("n_tokens")
      }
    }
    // every doc packed exactly once
    assert(packed.count() == Tables.documents(spark, sf).count())
  }

  test("packGreedyNoSplit: windows never exceed the budget; docs never split") {
    val docs = Tables.documents(spark, sf)
    val budget = 256
    val packed = Corpus.packGreedyNoSplit(docs, budget, shardSize = 100)
    assert(packed.count() == docs.count()) // every doc packed exactly once
    val bad = packed.groupBy("shard", "seq")
      .agg(sum("n_tokens").as("total"), count(lit(1)).as("n"))
      .where(col("total") > budget && col("n") > 1) // single long docs exempt
    assert(bad.count() == 0)
    // greedy fill order: within a shard, seq is nondecreasing in id
    val rows = packed.orderBy("shard", "id").collect()
    rows.groupBy(_.getAs[Long]("shard")).values.foreach { ds =>
      val seqs = ds.sortBy(_.getAs[Long]("id")).map(_.getAs[Long]("seq"))
      assert(seqs.zip(seqs.tail).forall { case (a, b) => b == a || b == a + 1 })
    }
  }

  test("packFfd: JVM-twin equality, budget invariant, and never more " +
    "sequences than the arrival-order greedy") {
    val docs = Tables.documents(spark, sf)
    val budget = 256
    val packed = Corpus.packFfd(docs, budget, shardSize = 100)
    assert(packed.count() == docs.count()) // every doc packed exactly once
    val bad = packed.groupBy("shard", "seq")
      .agg(sum("n_tokens").as("total"), count(lit(1)).as("n"))
      .where(col("total") > budget && col("n") > 1) // single long docs exempt
    assert(bad.count() == 0)
    // exact FFD twin: replay the loop per shard from the same (n, id) set
    val rows = packed.collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("seq")))
    rows.groupBy(_._1).foreach { case (_, ds) =>
      val sorted = ds.sortBy { case (_, id, n, _) => (-n, id) }
      val rem = scala.collection.mutable.ArrayBuffer.empty[Long]
      sorted.foreach { case (_, id, n, gotSeq) =>
        val idx = rem.indexWhere(_ >= n)
        val want =
          if (idx >= 0) { rem(idx) -= n; idx.toLong }
          else { rem += (budget.toLong - n); (rem.size - 1).toLong }
        assert(gotSeq == want, s"doc $id: seq $gotSeq, twin expects $want")
      }
    }
    // FFD never opens more bins than the greedy arrival-order packer
    def bins(df: org.apache.spark.sql.DataFrame): Long =
      df.select("shard", "seq").distinct().count()
    val greedy = Corpus.packGreedyNoSplit(docs, budget, shardSize = 100)
    assert(bins(packed) <= bins(greedy),
      s"FFD used ${bins(packed)} bins, greedy ${bins(greedy)}")
  }

  test("chunkDocuments: strided chunks reconstruct the original text") {
    val docs = Tables.documents(spark, sf).where(col("doc_id") < 10)
    val chunks = Corpus.chunkDocuments(docs, chunkSize = 120, stride = 90)
      .orderBy("id", "chunk_id").collect()
      .groupBy(_.getAs[Long]("id"))
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, text) =>
      val cs = chunks(id).map(_.getAs[String]("chunk"))
      val rebuilt = cs.dropRight(1).map(_.take(90)).mkString + cs.last
      assert(rebuilt == text, s"doc $id: chunk reconstruction mismatch")
      // overlap: consecutive chunks share chunkSize - stride chars
      cs.sliding(2).foreach {
        case Array(a, b) if a.length == 120 => assert(a.drop(90) == b.take(30))
        case _ => ()
      }
    }
  }

  test("chunkByTokens: windows land on token boundaries and reassemble losslessly") {
    val s = spark; import s.implicits._
    val docs = Tables.documents(spark, sf).where(col("doc_id") < 10)
      .select(col("doc_id"), col("text"))
      .unionAll(Seq((90001L, ""), (90002L, "one-token")).toDF("doc_id", "text"))
    // stride == chunk: concatenation reconstructs the document exactly
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val whole = Corpus.chunkByTokens(docs, 16, 16)
      .orderBy("id", "chunk_id").collect().groupBy(_.getAs[Long]("id"))
    texts.foreach { case (id, text) =>
      assert(whole(id).map(_.getAs[String]("chunk")).mkString == text, s"doc $id")
    }
    // overlapping windows: every chunk is a contiguous substring, and
    // n_tokens re-tokenizes to itself (boundaries never split a token)
    val firstId = texts.keys.min
    val over = Corpus.chunkByTokens(docs.where(col("doc_id") === firstId), 8, 5)
      .orderBy("chunk_id").collect()
    assert(over.length > 2)
    over.foreach { r =>
      val chunk = r.getAs[String]("chunk")
      assert(texts(firstId).contains(chunk))
      val n = spark.range(1).select(
        graft.functions.TextFunctions.bpeTokenCount(lit(chunk))).head.getInt(0)
      assert(n == r.getAs[Int]("n_tokens"), s"chunk re-tokenizes to $n tokens")
    }
  }

  test("cleanText strips urls/emails, collapses whitespace, and is idempotent") {
    val s = spark; import s.implicits._
    val df = Seq(
      "See https://ex.com/a?x=1&y=2 now",
      "mail bob.smith+spam@ex-mail.io\t twice  bob@x.io ",
      "  already   clean\ttext  "
    ).toDF("text")
    val once = df.select(Corpus.cleanText(col("text")).as("c"))
    val twice = once.select(Corpus.cleanText(col("c")).as("c"))
    assert(once.as[String].collect().toSeq ==
      Seq("See now", "mail twice", "already clean text"))
    assert(once.as[String].collect().toSeq == twice.as[String].collect().toSeq)
    val leftovers = once.where(
      col("c").rlike(Corpus.UrlPattern) || col("c").rlike(Corpus.EmailPattern))
    assert(leftovers.count() == 0)
  }

  test("repetitionStats: self-repeated text shows high dup ratio, unique text none") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "one two three four five six"),
      (2L, "spam spam spam spam spam spam spam spam")
    ).toDF("doc_id", "text")
    val stats = Corpus.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> (r.getAs[Double]("dup_ratio"), r.getAs[Double]("top_gram_share")))
      .toMap
    assert(stats(1L)._1 == 0.0) // all 3-grams unique
    assert(stats(2L)._1 > 0.8 && stats(2L)._2 == 1.0) // one gram repeated 6x
  }

  test("mixSources: rate 1.0 keeps everything, 0.0 drops everything, runs are identical") {
    val docs = Tables.documents(spark, sf)
    val src0Count = docs.where(col("source") === "src0").count()
    val mixed = Corpus.mixSources(docs, Map("src0" -> 1.0), defaultRate = 0.0)
    assert(mixed.count() == src0Count)
    assert(mixed.select("source").distinct().collect().map(_.getString(0)).toSeq == Seq("src0"))
    // deterministic: identical selection across runs
    val again = Corpus.mixSources(docs, Map("src0" -> 1.0), defaultRate = 0.0)
    assert(mixed.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("selectToTokenBudget equals the naive global-sort selection") {
    val s = spark; import s.implicits._
    val docs = Tables.documents(spark, sf)
    val budget = 3000L
    val selected = Corpus.selectToTokenBudget(docs, budget)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(selected.map(_._2).sum <= budget)
    // reference: sort ALL docs by (quality desc, id), take while cum <= budget
    val naive = docs.select(col("doc_id"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("q"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy { case (id, q, _) => (-q, id) }
    var cum = 0L
    val expect = naive.takeWhile { case (_, _, n) => { cum += n; cum <= budget } }
      .map(_._1).toSet
    assert(selected.map(_._1).toSet == expect)
    // trained-BPE counter through the tokenCounter seam: same property
    // at the new unit (selection set AND n_tokens move together)
    val selBpe = Corpus.selectToTokenBudget(docs, budget,
        tokenCounter = graft.analytics.Bpe.tokenCount(_))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(selBpe.map(_._2).sum <= budget)
    val naiveBpe = docs.select(col("doc_id"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("q"),
        graft.analytics.Bpe.tokenCount(col("text")).as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy { case (id, q, _) => (-q, id) }
    var cumB = 0L
    val expectBpe = naiveBpe.takeWhile { case (_, _, n) => { cumB += n; cumB <= budget } }
      .map(_._1).toSet
    assert(selBpe.map(_._1).toSet == expectBpe)
    assert(selBpe.map(_._1).toSet != selected.map(_._1).toSet ||
      selBpe.map(_._2).sum != selected.map(_._2).sum,
      "BPE counter must actually change the unit (token counts differ)")
  }

  test("decontaminate flags eval copies, not unrelated docs") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota"), // superset of eval
      (3L, "totally different words entirely here now friend")
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val flagged = graft.analytics.Corpus.decontaminate(corpus, eval, 0.8)
      .select("id").as[Long].collect().toSet
    assert(flagged == Set(1L, 2L)) // 2's shingles are ~87% contained in eval
    // cleaned corpus via anti-join
    val clean = corpus.join(
      graft.analytics.Corpus.decontaminate(corpus, eval, 0.8)
        .withColumnRenamed("id", "doc_id"),
      Seq("doc_id"), "left_anti")
    assert(clean.select("doc_id").as[Long].collect().toSeq == Seq(3L))
  }

  test("quotaSample keeps at most cap docs per source, preferring higher quality") {
    val docs = Tables.documents(spark, sf)
    val cap = 5
    val sampled = Corpus.quotaSample(docs, cap)
    val counts = sampled.groupBy("source").count().collect()
    assert(counts.forall(_.getLong(1) <= cap))
    // every kept doc's quality >= every dropped doc's quality, per source
    val dropped = docs.join(sampled.select("doc_id"), Seq("doc_id"), "left_anti")
      .withColumn("quality", graft.functions.TextFunctions.qualityScore(col("text")))
    val minKept = sampled.groupBy("source").agg(min("quality").as("min_kept"))
    val maxDropped = dropped.groupBy("source").agg(max("quality").as("max_dropped"))
    val bad = minKept.join(maxDropped, "source")
      .where(col("max_dropped") > col("min_kept"))
    assert(bad.count() == 0)
  }

  test("heavyHitters: exact counts under skew with a tiny MG capacity") {
    val s2 = spark; import s2.implicits._
    // 200 singleton tokens + two hot ones; capacity 9 forces constant MG
    // eviction, yet the guarantee floor N/(cap+1) = 720/10 = 72 < 100.
    val words = (0 until 200).map(i =>
        s"rare${('a' + i / 26).toChar}${('a' + i % 26).toChar}") ++
      Seq.fill(300)("hotone") ++ Seq.fill(220)("hottwo")
    val docs = words.grouped(10).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text").repartition(7)
    val out = Corpus.heavyHitters(docs, minCount = 100L, capacity = 9)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("hotone" -> 300L, "hottwo" -> 220L))
  }

  test("heavyHitters: refuses when capacity cannot guarantee the superset (autoGrow off)") {
    val s2 = spark; import s2.implicits._
    val docs = Seq.tabulate(50)(i => (i.toLong, s"w$i w$i w$i")).toDF("doc_id", "text")
    // N = 150 tokens, capacity 2 -> floor 50; minCount 10 is below it
    val ex = intercept[IllegalArgumentException] {
      Corpus.heavyHitters(docs, minCount = 10L, capacity = 2, autoGrow = false)
    }
    assert(ex.getMessage.contains("guarantee floor"))
  }

  test("heavyHitters: autoGrow re-runs pass 1 and stays exact with an undersized capacity") {
    val s2 = spark; import s2.implicits._
    // same skewed fixture, capacity 2: floor 720/3 = 240 >= 100, so the
    // first pass cannot guarantee a superset — autoGrow must recover both
    // hot tokens exactly anyway.
    val words = (0 until 200).map(i =>
        s"rare${('a' + i / 26).toChar}${('a' + i % 26).toChar}") ++
      Seq.fill(300)("hotone") ++ Seq.fill(220)("hottwo")
    val docs = words.grouped(10).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text").repartition(7)
    val out = Corpus.heavyHitters(docs, minCount = 100L, capacity = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("hotone" -> 300L, "hottwo" -> 220L))
  }

  test("snapshotDiff: statuses partition the id space; identical snapshots all 'same'") {
    val s = spark; import s.implicits._
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("doc_id", "text")
    val b = Seq((2L, "y"), (3L, "z2"), (4L, "w")).toDF("doc_id", "text")
    val out = Corpus.snapshotDiff(a, b).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(1L -> "removed", 2L -> "same", 3L -> "changed", 4L -> "added"))
    assert(Corpus.snapshotDiff(a, a).where(col("status") =!= "same").count() == 0)
  }

  test("gopherQuality: each planted violation trips exactly its rule") {
    val s = spark; import s.implicits._
    val good = (1 to 60).map(i => s"the quick brown fox and word$i").mkString(" ")
    val docs = Seq(
      1L -> good,                                     // passes everything
      2L -> "too short of the and",                   // < 50 words
      3L -> ("• line one\n• line two\n• line three\n• the and of that have " + good),
      4L -> ((1 to 5).map(i => s"the and of line$i...").mkString("\n")),
      5L -> (good + " #" * 100),                      // symbol-stuffed
      6L -> ((1 to 60).map(_ => "12345 67890 ..... #### !!!").mkString(" ") + " the of")
    ).toDF("doc_id", "text")
    val out = Corpus.gopherQuality(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def b(id: Long, c: String) = out(id).getBoolean(out(id).fieldIndex(c))
    assert(b(1, "pass"))
    assert(!b(2, "r_word_count") && b(2, "r_stop"))
    assert(!b(3, "r_bullet") && b(3, "r_word_count"))
    assert(!b(4, "r_ellipsis"))
    assert(!b(5, "r_symbol") && !b(5, "r_alpha"))
    assert(!b(6, "r_alpha") && b(6, "r_stop"))
  }

  test("gopherQuality: hostile shapes (empty / blank) never throw") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, ""), (2L, " "), (3L, "\n\n"), (4L, "• \n• ")).toDF("doc_id", "text")
    val out = Corpus.gopherQuality(docs).collect()
    assert(out.length == 4)
  }

  test("temperatureSample: alpha=1 keeps everything; alpha=0.5 keeps the smallest source whole and tempers the rest") {
    val s = spark; import s.implicits._
    val docs = (0 until 900).map(i =>
        (i.toLong, if (i < 800) "big" else "small"))
      .toDF("doc_id", "source")
    assert(Corpus.temperatureSample(docs, alpha = 1.0).count() == 900)
    val kept = Corpus.temperatureSample(docs, alpha = 0.5)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("small") == 100L)
    // big keeps ~ 800 * sqrt(100/800) = 283; the hash gate is uniform so
    // allow generous slack, but it must be a real downsample
    assert(kept("big") > 180L && kept("big") < 380L)
    // determinism: same input -> identical kept set
    val a = Corpus.temperatureSample(docs, alpha = 0.5).select("doc_id").collect().map(_.getLong(0)).toSet
    val b2 = Corpus.temperatureSample(docs, alpha = 0.5).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b2)
  }

  test("perplexityScore: in-domain text lands in head, gibberish in tail; " +
    "sub-2-token docs are excluded; UNK keeps OOV text scoreable") {
    val s = spark; import s.implicits._
    val train = (0 until 40).map(i =>
      (1000L + i, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // in-domain
      (2L, "the fox jumps over the dog"),                  // in-domain-ish
      (3L, "zxq qvv wub nlp gqr xxj plo"),                 // all-OOV gibberish
      (4L, "single"),                                      // < 2 tokens: excluded
      (5L, "")                                             // empty: excluded
    ).toDF("doc_id", "text")
    val out = Corpus.perplexityScore(docs, train, vocab = 50)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getString(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L)._1 < out(3L)._1, "in-domain must score below gibberish")
    assert(out(1L)._2 == "head" && out(3L)._2 == "tail")
    // deterministic across runs
    val again = Corpus.perplexityScore(docs, train, vocab = 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(again == out.map { case (k, v) => k -> v._1 })
  }

  test("importanceWeights: target-like docs outweigh off-domain ones; " +
    "empty docs are excluded; top quartile is flagged") {
    val s = spark; import s.implicits._
    val target = (0 until 30).map(i =>
      (2000L + i, "machine learning models train on curated text corpora"))
      .toDF("doc_id", "text")
    val raw = (Seq(
      (1L, "machine learning models train on curated text"), // target-like
      (2L, "curated corpora text machine"),                  // target-ish
      (3L, "xylophone quartz banana umbrella kiwi"),         // off-domain
      (4L, "")                                               // excluded
    ) ++ (10L until 16L).map(i => (i, "assorted filler words here")))
      .toDF("doc_id", "text")
    val out = Corpus.importanceWeights(raw, target, buckets = 512)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getBoolean(3))).toMap
    assert(!out.contains(4L))
    assert(out(1L)._1 > out(3L)._1, "target-like must outweigh off-domain")
    assert(out(1L)._2, "the most target-like doc must be selected")
    // quartile flag covers ~25% of scored docs
    val nSel = out.values.count(_._2)
    assert(nSel >= 1 && nSel <= out.size / 2)
    // tie rule: when EVERY doc scores identically the 75th-percentile
    // cutoff equals that score and the strict comparison selects none —
    // a >= rule would select the whole corpus through the gate
    val same = (0L until 8L).map(i => (i, "machine learning text"))
      .toDF("doc_id", "text")
    val tied = Corpus.importanceWeights(same, target, buckets = 512).collect()
    assert(tied.length == 8 && tied.forall(!_.getBoolean(3)),
      "an all-tied corpus must select nothing, not everything")
  }

  test("naiveBayes: disjoint-vocab classes classify perfectly; all-OOV " +
    "docs get a deterministic prediction; empty docs are excluded") {
    val s = spark; import s.implicits._
    val train = (
      (0 until 12).map(i => (s"spark shuffle partition exchange plan $i plan", "systems")) ++
      (0 until 6).map(i => (s"sonnet meter rhyme stanza verse $i verse", "poetry"))
    ).toDF("text", "label")
    val model = Corpus.naiveBayesTrain(train, "label", "text", buckets = 512)
    val docs = Seq(
      (1L, "shuffle exchange plan partition"),   // systems vocab
      (2L, "rhyme stanza meter"),                // poetry vocab
      (3L, "zzz qqq unseen tokens entirely"),    // all OOV -> prior decides
      (4L, "")                                   // unscoreable
    ).toDF("doc_id", "text")
    val out = Corpus.naiveBayesClassify(docs, model, buckets = 512)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == "systems" && out(2L) == "poetry",
      s"expected vocab-driven predictions, got $out")
    // all-OOV: hashing makes the exact winner bucket-collision-dependent,
    // but it must be a model label and identical on every run
    assert(Set("systems", "poetry")(out(3L)))
    val rerun = Corpus.naiveBayesClassify(docs, model, buckets = 512)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(rerun == out)
    // model stays bounded: one row, one dense count array per class
    val m = Corpus.naiveBayesTrain(train, "label", "text", buckets = 512).collect()
    assert(m.length == 1)
    assert(m(0).getSeq[String](0).toSeq == Seq("poetry", "systems"))
    assert(m(0).getSeq[scala.collection.Seq[Double]](3).forall(_.length == 512))
    // persisted model classifies identically to the inline one
    val dir = java.nio.file.Files.createTempDirectory("nbmodel").toString
    Corpus.saveNaiveBayes(model, dir)
    val reloaded = Corpus.loadNaiveBayes(spark, dir)
    val viaSaved = Corpus.naiveBayesClassify(docs, reloaded, buckets = 512)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(viaSaved == out)
    // an empty model (nothing scoreable to train on) predicts NOTHING —
    // unguarded, sequence(1,0) is the DESCENDING [1,0] in Spark and the
    // l = 0 probe throws ELEMENT_AT_BY_INDEX_ZERO instead of returning
    val emptyModel = Corpus.naiveBayesTrain(
      Seq(("", "a")).toDF("text", "label"), "label", "text", buckets = 512)
    assert(Corpus.naiveBayesClassify(docs, emptyModel, buckets = 512).count() == 0)
  }

  test("naiveBayesTrainClassify: shared-cache and split paths return " +
    "identical rows; the size gate picks shared for small inputs and " +
    "split past the configured fraction") {
    val s = spark; import s.implicits._
    val docs = (
      (0 until 12).map(i => (i.toLong * 2, s"spark shuffle partition exchange plan $i", "systems")) ++
      (0 until 12).map(i => (i.toLong * 2 + 1, s"sonnet meter rhyme stanza verse $i", "poetry"))
    ).toDF("doc_id", "text", "label")
    val isTrain = col("doc_id") % 3 =!= 0
    def rows(share: Option[Boolean]) =
      Corpus.naiveBayesTrainClassify(docs, "label", isTrain, buckets = 512,
          shareFeatures = share)
        .collect().map(r => (r.getLong(0), r.getAs[String]("pred_label"),
          r.getAs[Double]("log_score"))).sortBy(_._1).toSeq
    val shared = rows(Some(true))
    val split = rows(Some(false))
    assert(shared == split, "gate paths must be result-invisible")
    assert(rows(None) == shared)
    Corpus.releaseNbFeatureCache()
    // the gate: tiny corpus → shared; with the allowed fraction forced to
    // ~zero the SAME corpus flips to split (decision only — rows pinned
    // equal above)
    assert(Corpus.nbShareDecision(docs)._1)
    spark.conf.set("spark.graft.nb.cacheFraction", "1e-12")
    try assert(!Corpus.nbShareDecision(docs)._1)
    finally spark.conf.unset("spark.graft.nb.cacheFraction")
    // release is idempotent and re-execution after release still works
    Corpus.releaseNbFeatureCache()
    assert(rows(Some(true)) == shared)
    Corpus.releaseNbFeatureCache()
  }
}
