package graft

import org.apache.spark.sql.functions._
import graft.analytics.WordPiece
import graft.analytics.WordPiece.WordPieceModel

/** WordPiece tokenizer: maximal-munch optimality against brute force,
  * the whole-word-[UNK] rule, the column/JVM twin equality, conditional
  * round-trip, determinism and likelihood sanity of the trainer, and
  * save/load. */
class WordPieceSpec extends SparkTestBase {

  private val rng = new scala.util.Random(43)

  test("segmentWord == reference maximal munch on random words and " +
    "vocabularies (longest match wins; no match anywhere => whole word [UNK])") {
    // independent reference implementation: at each position scan ALL
    // vocab pieces, keep matches, take max raw length
    def refSegment(w: String, m: WordPieceModel): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var pos = 0
      while (pos < w.length) {
        val cands = m.vocab.filter { p =>
          val initial = !p.startsWith(WordPiece.ContPrefix)
          val raw = if (initial) p else p.substring(2)
          raw.nonEmpty && raw.length <= m.maxPieceLen &&
            (if (pos == 0) initial else !initial) &&
            w.regionMatches(pos, raw, 0, raw.length)
        }
        if (cands.isEmpty) return List(m.unkToken)
        val best = cands.maxBy(p =>
          if (p.startsWith(WordPiece.ContPrefix)) p.length - 2 else p.length)
        out += best
        pos += (if (best.startsWith(WordPiece.ContPrefix)) best.length - 2
                else best.length)
      }
      out.toList
    }
    (1 to 80).foreach { _ =>
      val alpha = "abcd"
      val w = (1 to (1 + rng.nextInt(8))).map(_ => alpha(rng.nextInt(4))).mkString
      // random vocab: some initial pieces, some continuations, a PARTIAL
      // char floor so [UNK] genuinely occurs
      val pieces = (1 to (3 + rng.nextInt(6))).map { _ =>
        val len = 1 + rng.nextInt(3)
        val body = (1 to len).map(_ => alpha(rng.nextInt(4))).mkString
        if (rng.nextBoolean()) body else WordPiece.ContPrefix + body
      }
      val floor = alpha.filter(_ => rng.nextBoolean()).flatMap(c =>
        Seq(c.toString, WordPiece.ContPrefix + c))
      val vocab = (pieces ++ floor).distinct.toVector
      if (vocab.nonEmpty) {
        val m = WordPieceModel(vocab, maxPieceLen = 3)
        val got = WordPiece.segmentWord(w, m).toList
        val want = refSegment(w, m)
        assert(got == want, s"word $w vocab $vocab: kernel $got reference $want")
        if (!got.contains(m.unkToken))
          assert(got.map(_.stripPrefix(WordPiece.ContPrefix)).mkString == w,
            s"word $w: non-UNK tokens do not tile: $got")
        else assert(got == List(m.unkToken),
          s"word $w: [UNK] must collapse the WHOLE word, got $got")
      }
    }
  }

  test("FixedModel segments the corpus vocabulary as designed: whole words, " +
    "prefix+suffix splits, shadowed shorter pieces, and [UNK] on non-initial y") {
    def seg(w: String) = WordPiece.segmentWord(w, WordPiece.FixedModel).toList
    assert(seg("table") == List("table"), "longest match must beat 'ta'")
    assert(seg("stream") == List("stream"))
    assert(seg("value") == List("val", "##ue"))
    assert(seg("filter") == List("fil", "##ter"))
    assert(seg("customer") == List("c", "##ustom", "##er"))
    assert(seg("column") == List("col", "##umn"))
    assert(seg("window") == List("wind", "##ow"))
    assert(seg("group") == List("gr", "##oup"))
    // non-initial y has no continuation piece => whole word [UNK]
    assert(seg("key") == List("[UNK]"))
    assert(seg("query") == List("[UNK]"))
    // initial y still matches the initial floor
    assert(seg("y") == List("y"))
  }

  test("column tokenize == JVM twin over the corpus; non-UNK words " +
    "round-trip with ## stripped") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = docs.select(col("doc_id"), col("text"),
        WordPiece.tokenize(col("text")).as("toks"))
      .collect()
    assert(rows.nonEmpty)
    var sawUnk = false
    rows.foreach { r =>
      val text = r.getAs[String]("text")
      val got = r.getAs[scala.collection.Seq[String]]("toks").toList
      val twin = WordPiece.segmentText(text, WordPiece.FixedModel).toList
      assert(got == twin, s"doc ${r.getLong(0)}: column != JVM twin")
      sawUnk ||= got.contains("[UNK]")
      // per-word conditional round-trip
      text.split("\\s+").filter(_.nonEmpty).foreach { w =>
        val toks = WordPiece.segmentWord(w, WordPiece.FixedModel)
        if (!toks.contains("[UNK]"))
          assert(toks.map(_.stripPrefix(WordPiece.ContPrefix)).mkString == w)
      }
    }
    assert(sawUnk, "corpus should exercise the [UNK] rule (key/query)")
  }

  test("tokenize handles hostile inputs: null, empty, all-whitespace, " +
    "out-of-vocabulary unicode") {
    val s = spark; import s.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, ""), (2L, "   "), (3L, "\t\n"), (4L, "héllo wörld"),
      (5L, null)).toDF("id", "text")
    val got = df.select(col("id"), WordPiece.tokenize(col("text")).as("t"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[scala.collection.Seq[String]]("t")).map(_.toList)).toMap
    assert(got(1L).contains(Nil) && got(2L).contains(Nil) && got(3L).contains(Nil))
    assert(got(5L).isEmpty, "null text must stay null")
    // é/ö have no vocab entry at any position => both words collapse
    assert(got(4L).contains(List("[UNK]", "[UNK]")))
  }

  test("train: deterministic, likelihood-greedy first merge, segments its " +
    "own corpus without [UNK], and save/load round-trips") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val m1 = WordPiece.train(docs, vocabSize = 96)
    val m2 = WordPiece.train(docs, vocabSize = 96)
    assert(m1 == m2, "training is not deterministic")
    assert(m1.vocab.size <= 96)
    assert(m1.vocab.exists(p => p.stripPrefix(WordPiece.ContPrefix).length > 1),
      "no multi-char piece learned")
    // the trained vocab contains its own seed alphabet, so every corpus
    // word segments without [UNK] and round-trips
    val sample = docs.limit(30).collect().map(_.getAs[String]("text"))
    sample.foreach { t =>
      t.split("\\s+").filter(_.nonEmpty).foreach { w =>
        val toks = WordPiece.segmentWord(w, m1)
        assert(!toks.contains(m1.unkToken), s"trained model UNKs own word $w")
        assert(toks.map(_.stripPrefix(WordPiece.ContPrefix)).mkString == w)
      }
    }
    // trained multi-char pieces are actually used: fewer tokens than chars
    val nTok = sample.map(t => WordPiece.segmentText(t, m1).length).sum
    val nChar = sample.map(_.count(!_.isWhitespace)).sum
    assert(nTok < nChar, s"trained model never uses multi-char pieces ($nTok vs $nChar)")
    // first merge = the max-likelihood pair by brute force on a tiny corpus
    val s = spark; import s.implicits._
    val tiny = Seq("ab ab ab cd", "ab cd cd").toDF("text")
    val tinyModel = WordPiece.train(tiny, vocabSize = 5) // alphabet {a,##b,c,##d} + 1 merge
    val learned = tinyModel.vocab.filter(p => p.stripPrefix("##").length > 1)
    // counts: words ab(freq4: a,##b), cd(freq3: c,##d) — pairs
    // (a,##b):4 score 4/(4*4)=0.25; (c,##d):3 score 3/9=0.333 => c##d wins
    assert(learned == Vector("cd"), s"expected likelihood winner 'cd', got $learned")
    // save/load
    val dir = java.nio.file.Files.createTempDirectory("wordpiece").toString
    WordPiece.save(spark, m1, dir)
    val loaded = WordPiece.load(spark, dir)
    assert(loaded == m1, "save/load must round-trip the model exactly")
    sample.foreach { t =>
      assert(WordPiece.segmentText(t, loaded).toList ==
        WordPiece.segmentText(t, m1).toList)
    }
  }

  test("maxPieceLen caps merges: no trained piece spans more raw chars") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val m = WordPiece.train(docs, vocabSize = 200, maxPieceLen = 3)
    m.vocab.foreach { p =>
      assert(p.stripPrefix(WordPiece.ContPrefix).length <= 3,
        s"piece $p exceeds maxPieceLen")
    }
  }

  test("tokenCount plugs into the token-budget seam") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val counted = docs.select(col("doc_id"),
        WordPiece.tokenCount(col("text")).as("n")).collect()
    counted.foreach { r =>
      assert(r.getLong(1) > 0, s"doc ${r.getLong(0)} counted zero tokens")
    }
  }
}
