package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.analytics.{Corpus, Dedup, Pii}
import graft.functions.TextFunctions

/** Adversarial-input hardening for the text/dedup family. The oracle
  * corpus is well-formed prose; a 100 TB crawl is not. These properties
  * feed the operators the inputs a real corpus contains — nulls, empty
  * and whitespace-only strings, astral-plane characters, UNPAIRED
  * surrogates, combining marks, RTL and CJK runs, control bytes, regex
  * metacharacters, and multi-megabyte single documents with no
  * whitespace — and assert the domain invariants that must survive them:
  * no exception, values in range, chunking lossless and never splitting
  * a code point, redaction idempotent.
  *
  * Note on unpaired surrogates: Spark stores UTF8String; a lone
  * surrogate in a JVM String has no UTF-8 encoding and round-trips
  * through the engine as the standard replacement. Invariants therefore
  * compare Spark output against Spark-round-tripped input, never against
  * the raw JVM string. */
class FuzzSpec extends SparkTestBase {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(97L + i * 7919L)))

  // Hostile building blocks.
  private val fragments: Seq[String] = Seq(
    "", " ", "   \t\n  ", "plain english words here",
    "😀𝔘🍕",       // astral: emoji + math 𝔘
    "\uD800", "\uDFFF", "a\uD800b", "\uDC00tail", // unpaired surrogates
    "é combining ä",                  // combining diacritics
    "مرحبا بالعالم",                              // RTL Arabic
    "的是了在和有汉字无空格",                        // CJK, no whitespace
    "x" * 500,                                    // unbroken ASCII run
    "((([[[{{{", "\\d+\\", "$^.*?|",              // regex metacharacters
    "\u0000\u0007\u001b[0m",                      // NUL, BEL, ANSI escape
    "a@b.co 4111-1111-1111-1111 999-99-9999",     // PII shapes
    "word " * 40, ".,;:!?.,;:!?")

  private val hostileGen: Gen[String] =
    Gen.chooseNum(0, 6).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf(fragments)).map(_.mkString))

  /** Hostile corpus incl. explicit null text rows: (doc_id, text). */
  private def hostileDocs(n: Int) = {
    val s = spark; import s.implicits._
    val rows = samples(hostileGen, n).zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      Seq((9000L, null: String), (9001L, ""), (9002L, " "))
    rows.toDF("doc_id", "text")
  }

  test("perplexityScore + importanceWeights: hostile corpus never throws; " +
    "scores finite; null/empty/short docs excluded; empty train defined") {
    val docs = hostileDocs(50)
    val train = docs.where(col("doc_id") < 25)
    val ppl = Corpus.perplexityScore(docs, train, vocab = 100).collect()
    ppl.foreach { r =>
      val lp = r.getDouble(2)
      assert(!lp.isNaN && !lp.isInfinite && lp >= 0, s"log_ppl domain: $r")
      assert(Set("head", "middle", "tail")(r.getString(3)), s"bucket: $r")
    }
    val ids = ppl.map(_.getLong(0)).toSet
    assert(!ids(9000L) && !ids(9001L) && !ids(9002L),
      "null/empty/whitespace docs must be excluded")
    val dw = Corpus.importanceWeights(docs, train, buckets = 128).collect()
    dw.foreach { r =>
      assert(!r.getDouble(2).isNaN && !r.getDouble(2).isInfinite, s"weight: $r")
      assert(r.getInt(1) > 0, s"features: $r")
    }
    val ids2 = dw.map(_.getLong(0)).toSet
    assert(!ids2(9000L) && !ids2(9001L))
    // a train sample with zero tokens still yields defined scores: the
    // smoothed unigram term degenerates to 1, so every bigram scores
    // p = (1−λ)·1 and log_ppl is the constant −ln(1−λ) ≈ 2.302585
    val emptyTrain = docs.where(col("doc_id") === 9001L)
    val ppl0 = Corpus.perplexityScore(docs, emptyTrain, vocab = 10).collect()
    assert(ppl0.nonEmpty)
    ppl0.foreach(r => assert(r.getDouble(2) == 2.302585, s"empty-train ppl: $r"))
    val dw0 = Corpus.importanceWeights(docs, emptyTrain, buckets = 64).collect()
    dw0.foreach(r => assert(!r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
  }

  test("text stats family: never throws; every score stays in its domain") {
    val docs = hostileDocs(60)
    val out = docs.select(
      col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("toks"),
      TextFunctions.bpeTokenCount(col("text")).as("bpe"),
      TextFunctions.punctRatio(col("text")).as("punct"),
      TextFunctions.qualityScore(col("text")).as("quality"),
      TextFunctions.langId(col("text")).as("lang"),
      TextFunctions.fingerprint(col("text")).as("fp")
    ).collect()
    assert(out.length == docs.count())
    out.foreach { r =>
      if (!r.isNullAt(1)) assert(r.getInt(1) >= 0, s"toks: $r")
      if (!r.isNullAt(2)) assert(r.getInt(2) >= 0, s"bpe: $r")
      if (!r.isNullAt(3)) {
        val p = r.getDouble(3); assert(p >= 0.0 && p <= 1.0, s"punct: $r")
      }
      if (!r.isNullAt(4)) {
        val q = r.getDouble(4); assert(q >= 0.0 && q <= 1.0, s"quality: $r")
      }
      if (!r.isNullAt(5)) // "und" = undetermined (null text scores no lexicon)
        assert(("und" +: TextFunctions.LangLexicons.map(_._1)).contains(r.getString(5)))
      if (!r.isNullAt(6)) assert(r.getString(6).matches("[0-9a-f]{32}"), s"fp: $r")
    }
  }

  test("gopherQuality + temperatureSample: hostile corpus never throws; " +
    "ratios stay in domain; sampling is a subset and deterministic") {
    val docs = hostileDocs(60)
      .withColumn("source", concat(lit("s"), pmod(col("doc_id"), lit(3))))
    val n = docs.count()
    val g = Corpus.gopherQuality(docs).collect()
    assert(g.length == n)
    g.foreach { r =>
      if (!r.isNullAt(1)) assert(r.getLong(r.fieldIndex("n_words")) >= 0)
    }
    val kept = Corpus.temperatureSample(docs, alpha = 0.5)
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(all))
    val again = Corpus.temperatureSample(docs, alpha = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == again)
  }

  test("shingles + winnowing: non-null in, non-empty structurally-sane out") {
    val docs = hostileDocs(60).where(col("text").isNotNull)
    val out = docs.select(
      TextFunctions.shingles(col("text"), 3).as("sh"),
      TextFunctions.winnowFingerprints(col("text"), 5, 4).as("wf")
    ).collect()
    out.foreach { r =>
      val sh = r.getSeq[String](0)
      assert(sh.nonEmpty, "a document always has at least its whole-text shingle")
      val wf = r.getSeq[Long](1)
      assert(wf.nonEmpty && wf == wf.sorted && wf.distinct == wf, s"winnow: $wf")
      wf.foreach(h => assert(h >= 0L, "hash60 is a positive 60-bit value"))
    }
    // the explode path used by the pair-gen inverted index
    val idx = Dedup.shingleIndex(docs, "text", "doc_id", 3)
    assert(idx.where(col("shingle").isNull).count() == 0)
  }

  test("chunkDocuments: stride==chunkSize reassembles exactly; chunks never exceed size or split code points") {
    val s = spark; import s.implicits._
    val docs = hostileDocs(40).where(col("text").isNotNull)
    // what Spark itself holds for each doc (surrogate-normalized)
    val full = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = Corpus.chunkDocuments(docs, chunkSize = 7, stride = 7)
    // no chunk longer than chunkSize, measured in Spark code points
    assert(chunks.where(length(col("chunk")) > 7).count() == 0)
    val rebuilt = chunks.select(col("id"), col("chunk_id"), col("chunk")).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getLong(1)).map(r => Option(r.getString(2)).getOrElse("")).mkString
      }
    full.foreach { case (id, text) =>
      assert(rebuilt(id) == text, s"doc $id reassembly")
    }
    // astral-only doc: 2-codepoint chunks must contain whole characters
    val astral = Seq((1L, "😀🍕𝔘😀")).toDF("doc_id", "text")
    Corpus.chunkDocuments(astral, 2, 2).select(col("chunk")).collect().foreach { r =>
      val c = r.getString(0)
      assert(c.codePointCount(0, c.length) <= 2)
      assert(!c.exists(ch => Character.isHighSurrogate(ch) && c.indexOf(ch) == c.length - 1),
        s"chunk ends on a dangling high surrogate: ${c.toList}")
    }
  }

  test("PII redaction: counts non-negative, idempotent, never throws on hostile text") {
    val docs = hostileDocs(60)
    val once = Pii.redact(docs, "text")
    val rows = once.collect()
    rows.foreach { r =>
      Pii.categories.foreach { case (nameCat, _, _) =>
        val v = r.getAs[Any](s"n_$nameCat")
        if (v != null) assert(v.asInstanceOf[Int] >= 0)
      }
    }
    // a second pass finds nothing: placeholders contain no redactable spans
    val twice = Pii.redact(once.select(col("doc_id"), col("text")), "text")
    val residual = twice.where(
      Pii.categories.map { case (c, _, _) => col(s"n_$c") > 0 }.reduce(_ || _))
    assert(residual.count() == 0, "redaction must be idempotent")
  }

  test("multi-MB single document with no whitespace survives the per-row array ops") {
    val s = spark; import s.implicits._
    val big = ("lorem1pIcksUm" * 160000) // ~2.1 MB, zero whitespace
    val docs = Seq((1L, big)).toDF("doc_id", "text")
    val r = docs.select(
      TextFunctions.bpeTokenCount(col("text")).as("bpe"),
      TextFunctions.tokenCount(col("text")).as("toks"),
      size(TextFunctions.shingles(col("text"), 3)).as("nsh"),
      size(TextFunctions.winnowFingerprints(col("text"), 8, 16)).as("nwf")
    ).head()
    assert(r.getInt(0) >= 1)
    assert(r.getInt(1) == 1, "no whitespace => one token")
    assert(r.getInt(2) == 1, "one token => whole-text shingle")
    assert(r.getInt(3) >= 1)
    // chunking a 2 MB doc: ~2100 chunks, lossless length
    val chunked = Corpus.chunkDocuments(docs, 1024, 1024)
    assert(chunked.agg(sum(length(col("chunk")))).head.getLong(0) == big.length)
  }

  test("degenerate embeddings (zero vectors) never pollute similarity results") {
    val s = spark; import s.implicits._
    import graft.analytics.Similarity
    // real corpora contain zero vectors (failed encoder outputs): cosine is
    // NaN, and Spark orders NaN LARGEST — unguarded they'd top every list
    val vecs = ((0 until 20).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 8 + d).toFloat))
    } :+ (99L, Array.fill(8)(0.0f))).toDF("vec_id", "embedding")
    val q = vecs.where(col("vec_id") < 3)
    val top = Similarity.bruteForceTopK(q, vecs, 5).collect()
    assert(top.nonEmpty)
    top.foreach { r =>
      assert(r.getLong(2) != 99L, "zero vector must never rank")
      assert(!r.getDouble(3).isNaN)
    }
    val ivf = Similarity.ivfTopK(q, vecs, k = 5, nlist = 4, nprobe = 4).collect()
    assert(ivf.nonEmpty && ivf.forall(r => r.getLong(2) != 99L))
    val pairs = Similarity.nearDupPairs(vecs, 0.0).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(r => r.getLong(0) != 99L && r.getLong(1) != 99L),
      "NaN >= threshold must not near-dup the zero vector against everything")
    // the zero vector is never *dropped as a duplicate* by semantic dedup
    val sem = Similarity.semanticDedup(vecs, nlist = 4, threshold = 0.99)
      .where(col("id") === 99L).head()
    assert(sem.getBoolean(3), "a degenerate vector is kept, not silently deduped")
    // a zero QUERY yields no results rather than NaN rankings
    val zq = Similarity.bruteForceTopK(vecs.where(col("vec_id") === 99L), vecs, 5)
    assert(zq.count() == 0)
  }

  test("langIdTable: one non-null prediction per doc, nulls included") {
    val docs = hostileDocs(40)
    val out = TextFunctions.langIdTable(docs, "doc_id", "text")
    assert(out.count() == docs.count())
    assert(out.where(col("predicted").isNull).count() == 0)
  }

  test("substring dedup family: hostile corpus never throws; stats and removal stay coherent") {
    val docs = hostileDocs(50)
    val n = docs.count()
    val stats = Dedup.substringDupStats(docs, k = 3)
    val rem = Dedup.substringDupRemove(docs, k = 3)
    assert(stats.count() == n && rem.count() == n)
    stats.collect().foreach { r =>
      if (!r.isNullAt(1)) {
        val (nw, nd) = (r.getLong(1), r.getLong(2))
        assert(nw >= 0 && nd >= 0 && nd <= nw, s"window bounds: $r")
        if (nw > 0) assert(math.abs(r.getDouble(3) - nd.toDouble / nw) < 1e-12)
      }
    }
    rem.collect().foreach { r =>
      if (!r.isNullAt(1)) {
        val (nt, nr) = (r.getLong(1), r.getLong(2))
        assert(nr >= 0 && nr <= nt, s"removal bounds: $r")
        if (nr == nt) assert(r.getString(3) == "", s"full removal must empty the doc: $r")
      }
    }
    // stats and removal agree on WHO has duplicated text; untouched docs
    // come back whitespace-normalized but token-identical
    val joined = stats.select(col("id"), col("n_dup_windows"))
      .join(rem.select(col("id"), col("n_removed"), col("text_clean")), "id")
      .join(docs.select(col("doc_id").as("id"),
        array_join(TextFunctions.tokens(col("text")), " ").as("norm")), "id")
    assert(joined.where((col("n_dup_windows") > 0) =!= (col("n_removed") > 0)).count() == 0)
    assert(joined.where(col("n_removed") === 0 && col("norm").isNotNull &&
      col("text_clean") =!= col("norm")).count() == 0)
    // the length-thresholded form never throws either, and removes a
    // strict SUBSET of the fixed-k coverage (runs below minLen survive)
    val spans = Dedup.substringDupRemoveSpans(docs, k = 3, minLen = 5)
    assert(spans.count() == n)
    val sj = spans.select(col("id"), col("n_removed").as("span_removed"),
        col("n_tokens").as("span_nt"), col("text_clean").as("span_clean"))
      .join(rem.select(col("id"), col("n_removed")), "id")
    assert(sj.where(col("span_removed") > col("n_removed")).count() == 0,
      "minLen can only shrink the excised set")
    sj.collect().foreach { r =>
      if (!r.isNullAt(2)) {
        assert(r.getLong(1) >= 0 && r.getLong(1) <= r.getLong(2), s"span bounds: $r")
        if (r.getLong(1) == r.getLong(2))
          assert(r.getString(3) == "", s"full span removal must empty: $r")
      }
    }
  }

  test("fully-duplicated multi-MB doc: segment-slice rebuild stays linear") {
    val s = spark; import s.implicits._
    // two copies of one ~2 MB document: every token position is covered,
    // so the covered set is as large as the token array. The r10 rebuild
    // scanned that set per token (array_contains) — ~n² in the document's
    // own length, minutes at this size; the segment-slice rebuild is
    // O(n + |cov| log |cov|) and finishes in seconds.
    val nTok = 300000
    val txt = (0 until nTok).map(i => s"tok${i % 97}").mkString(" ")
    val docs = Seq((1L, txt), (2L, txt)).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val rem = Dedup.substringDupRemove(docs, k = 8).collect()
    val spans = Dedup.substringDupRemoveSpans(docs, k = 8, minLen = 20).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    rem.foreach { r =>
      assert(r.getLong(1) == nTok && r.getLong(2) == nTok, s"full coverage: $r")
      assert(r.getString(3) == "", "full removal must empty the doc")
    }
    spans.foreach(r => assert(r.getString(3) == "", "one full-length run must empty the doc"))
    assert(secs < 120.0, f"rebuild took $secs%.1f s — per-token covered-set scan regression?")
  }

  test("naiveBayes train+classify: hostile corpus never throws; every " +
    "scoreable doc gets exactly one finite-scored model label") {
    val s = spark; import s.implicits._
    val docs = hostileDocs(50)
      .withColumn("label", (col("doc_id") % 3).cast("string"))
    val model = graft.analytics.Corpus.naiveBayesTrain(
      docs.where(col("doc_id") % 2 === 0), "label", "text", buckets = 64)
    val out = graft.analytics.Corpus.naiveBayesClassify(docs, model, buckets = 64)
      .select(col("doc_id"), col("pred_label"), col("log_score")).collect()
    val labels = model.collect()(0).getSeq[String](0).toSet
    // null/empty/whitespace docs are unscoreable and excluded; the rest
    // predict a model label with a finite negative score
    assert(out.forall(r => labels(r.getString(1)) && !r.isNullAt(2) &&
      !r.getDouble(2).isNaN && !r.getDouble(2).isInfinite && r.getDouble(2) <= 0.0))
    val ids = out.map(_.getLong(0)).toSet
    assert(Seq(9000L, 9001L, 9002L).forall(!ids.contains(_)))
    assert(out.length == ids.size, "exactly one prediction per doc")
  }

  test("trained tokenizer trio (BPE / Unigram / WordPiece): hostile corpus " +
    "never throws; round-trip and vocabulary-membership invariants hold") {
    import graft.analytics.{Bpe, Unigram, WordPiece}
    val docs = hostileDocs(40)
    val rows = docs.select(col("doc_id"), col("text"),
        Bpe.tokenize(col("text")).as("bpe"),
        Unigram.tokenize(col("text")).as("uni"),
        WordPiece.tokenize(col("text")).as("wp"))
      .collect()
    assert(rows.nonEmpty)
    val wpVocab = WordPiece.FixedModel.vocab.toSet
    rows.foreach { r =>
      // compare against the Spark-round-tripped text (see class scaladoc)
      Option(r.getAs[String]("text")).foreach { text =>
        val bpe = r.getAs[scala.collection.Seq[String]]("bpe")
        val uni = r.getAs[scala.collection.Seq[String]]("uni")
        val wp = r.getAs[scala.collection.Seq[String]]("wp")
        // BPE pieces tile the ENTIRE sentinel-stripped text
        val stripped = text.replace(Bpe.Sep, "").replace(Bpe.PieceSep, "")
        assert(bpe.mkString == stripped, s"BPE round-trip broke on doc ${r.getLong(0)}")
        // unigram tokens tile the whitespace-dropped text
        assert(uni.mkString == text.split("\\s+").filter(_.nonEmpty).mkString,
          s"unigram round-trip broke on doc ${r.getLong(0)}")
        // every WordPiece token is a vocabulary member or [UNK]; non-UNK
        // words round-trip with ## stripped
        wp.foreach(t => assert(t == "[UNK]" || wpVocab.contains(t),
          s"WordPiece emitted non-vocab token '$t'"))
        text.split("\\s+").filter(_.nonEmpty).foreach { w =>
          val toks = WordPiece.segmentWord(w, WordPiece.FixedModel)
          if (!toks.contains("[UNK]"))
            assert(toks.map(_.stripPrefix("##")).mkString == w)
          else assert(toks.length == 1, s"[UNK] must collapse the whole word '$w'")
        }
      }
    }
    // null text stays null through all three
    val nullRow = docs.where(col("doc_id") === 9000L)
      .select(Bpe.tokenize(col("text")), Unigram.tokenize(col("text")),
        WordPiece.tokenize(col("text"))).collect().head
    assert(nullRow.isNullAt(0) && nullRow.isNullAt(1) && nullRow.isNullAt(2))
  }

  test("clusterBalancedSample: degenerate embeddings (zero/NaN cosine) " +
    "never throw and every vector lands in exactly one cluster") {
    val s = spark; import s.implicits._
    import graft.analytics.Similarity
    val vecs = (0 until 40).map { i =>
      val v =
        if (i % 7 == 0) Array.fill(8)(0.0f) // zero vector -> NaN cosine
        else Array.tabulate(8)(d => math.sin(i * 8 + d).toFloat)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val out = Similarity.clusterBalancedSample(vecs, quota = 3, nlist = 4).collect()
    assert(out.length == 40, "every vector assigned exactly once")
    val perList = out.groupBy(_.getAs[Int]("list_id"))
    perList.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length))
      assert(rs.count(_.getAs[Boolean]("selected")) == math.min(3, rs.length))
    }
  }
}
