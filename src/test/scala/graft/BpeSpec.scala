package graft

import org.apache.spark.sql.functions._
import graft.analytics.Bpe

/** Trained BPE tokenizer: greedy-merge semantics, column/JVM twin
  * equivalence, lossless round-trip, training contraction order, and the
  * budget-operator integration. */
class BpeSpec extends SparkTestBase {

  private val pat = java.util.regex.Pattern.compile(graft.functions.TextFunctions.BpePattern)

  /** Both sentinels are stripped before tokenization (the column fold
    * uses them as token envelope / piece barrier). */
  private def strip(text: String): String =
    text.replace("\u0001", "").replace("\u0002", "")

  private def expected(text: String, ms: Seq[(String, String)]): Seq[String] = {
    val m = pat.matcher(strip(text))
    val out = Seq.newBuilder[String]
    while (m.find()) out ++= Bpe.tokenizePieceJvm(m.group(), ms)
    out.result()
  }

  test("fixed-merge tokenize: known segmentation, count, lossless round-trip") {
    val s = spark; import s.implicits._
    val texts = Seq(
      "the thing", "running in the north", "a  b\n\nc!", "", "th",
      "aaa", "... the end.", "tab\tand  spaces", "Mixed CASE Words",
      // sentinel-bearing hostile text: both U+0001 and U+0002 are
      // stripped before tokenization (round-trip is vs the stripped text)
      "a\u0001b \u0002the\u0001\u0002", "\u0001\u0002")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select(col("id"), Bpe.tokenize(col("text")).as("toks"),
        Bpe.tokenCount(col("text")).as("n")).collect()
      .map(r => (r.getLong(0), r.getSeq[String](1), r.getLong(2))).sortBy(_._1)
    got.foreach { case (i, toks, n) =>
      assert(toks.mkString("") == strip(texts(i.toInt)),
        s"round-trip failed for '${texts(i.toInt)}'")
      assert(n == toks.size)
      assert(toks == expected(texts(i.toInt), Bpe.FixedMerges))
    }
    // hand-derived: the(t+h, th+e); " thing" -> ' ' th in(+g) -> ' ', th, ing
    assert(got(0)._2 == Seq("the", " ", "th", "ing"))
  }

  test("column fold == JVM twin over adversarial pieces and merge tables " +
    "(runs, rebuilt products, unicode)") {
    val s = spark; import s.implicits._
    val tables = Seq(
      Seq.empty[(String, String)],                     // no merges: per-char tokens
      Seq("a" -> "a"),                                 // overlapping runs
      Seq("a" -> "a", "aa" -> "a"),                    // product rebuilt on product
      Seq("a" -> "a", "aa" -> "aa"),                   // product pairs
      Seq("l" -> "l", "h" -> "e", "he" -> "ll"),       // chained products
      Bpe.FixedMerges)
    val texts = Seq("aaaa", "aaa", "aaaaa", "hello", "llll", "ab", "héllo",
      "😀😀a", "the cat and the hat", "  ", "a a a",
      "a\u0001a\u0002aa", "\u0002\u0001")
    for (ms <- tables) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val got = df.select(col("id"), Bpe.tokenize(col("text"), ms).as("toks")).collect()
        .map(r => (r.getLong(0), r.getSeq[String](1))).sortBy(_._1)
      got.foreach { case (i, toks) =>
        assert(toks == expected(texts(i.toInt), ms),
          s"mismatch for '${texts(i.toInt)}' under $ms: $toks")
      }
    }
  }

  test("train: expected contraction order, deterministic ties, early stop, " +
    "and the trained table tokenizes the corpus losslessly") {
    val s = spark; import s.implicits._
    val docs = Seq((0L, "aaab aaab"), (1L, "aaab")).toDF("doc_id", "text")
    // (a,a)=6 wins round 1; round 2 ties (aa,a)=3 vs (a,b)=3 -> lexicographic
    assert(Bpe.train(docs, 2, minPairCount = 1) == Seq("a" -> "a", "a" -> "b"))
    // early stop: all remaining pairs below minPairCount
    assert(Bpe.train(docs, 50, minPairCount = 7) == Seq.empty)
    // a trained-then-empty table must DEGRADE (per-character tokens), not
    // crash analysis (empty array() types as array<void>)
    val perChar = docs.select(Bpe.tokenize(col("text"), Seq.empty).as("toks"),
        Bpe.tokenCount(col("text"), Seq.empty).as("n")).collect()
    perChar.foreach { r =>
      assert(r.getSeq[String](0).forall(_.length == 1) && r.getLong(1) > 0)
    }
    assert(Bpe.chunkByTokens(docs, 4, Seq.empty).count() > 0)
    // a trained table on richer text still round-trips everything
    val rich = Seq((0L, "the northern lights shine over the northern town"),
      (1L, "a runner running north"), (2L, "shine on, shine on")).toDF("doc_id", "text")
    val trained = Bpe.train(rich, 12, minPairCount = 1)
    assert(trained.nonEmpty && trained.size <= 12)
    val rt = rich.select(col("text"), Bpe.tokenize(col("text"), trained).as("toks"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    rt.foreach { case (t, toks) => assert(toks.mkString("") == t) }
  }

  test("saveMerges/loadMerges round-trip preserves order; pack/chunk run on " +
    "real BPE counts") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    Bpe.saveMerges(spark, Bpe.FixedMerges, s"$dir/merges")
    assert(Bpe.loadMerges(spark, s"$dir/merges") == Bpe.FixedMerges)
    val docs = Seq((0L, "the thing and the other thing"),
      (1L, "north running runner")).toDF("doc_id", "text")
    val packed = graft.analytics.Corpus.packSequences(docs, budget = 4, shardSize = 100,
      tokenCounter = Bpe.tokenCount(_))
    val total = packed.agg(sum(col("n_tokens"))).first().getLong(0)
    val direct = docs.select(Bpe.tokenCount(col("text")).as("n"))
      .agg(sum(col("n"))).first().getLong(0)
    assert(total == direct && total > 0)
  }

  /** JVM reference of the greedy chunk fold: (start, n, tokens) per chunk. */
  private def chunkRef(text: String, budget: Int): Seq[(Int, Int, Long)] = {
    val m = pat.matcher(strip(text))
    val pieces = Iterator.continually(m).takeWhile(_.find()).map(_.group()).toArray
    val ws = pieces.map(p => Bpe.tokenizePieceJvm(p, Bpe.FixedMerges).size.toLong)
    val out = Seq.newBuilder[(Int, Int, Long)]
    var s = 0; var t = 0L
    for (i <- ws.indices) {
      if (i > s && t + ws(i) > budget) { out += ((s, i - s, t)); s = i; t = ws(i) }
      else t += ws(i)
    }
    out += ((s, pieces.length - s, t))
    out.result()
  }

  test("chunkByTokens: greedy fill == JVM reference; oversized pieces own a " +
    "chunk; empty docs yield the empty chunk; chunks reassemble the text") {
    val s = spark; import s.implicits._
    val texts = Seq(
      "the cat and the hat went over there and sat",
      "a", "",
      "supercalifragilisticexpialidocious is quite long",
      ("x " * 30).trim,
      "line one\n\nline two\tand three",
      "chunk\u0001 with \u0002sentinels inside")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for (budget <- Seq(1, 3, 8, 1000)) {
      val got = Bpe.chunkByTokens(df, budget).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getString(4)))
        .sortBy(r => (r._1, r._2))
      for ((text, id) <- texts.zipWithIndex) {
        val mine = got.filter(_._1 == id).sortBy(_._2)
        val ref = chunkRef(text, budget)
        assert(mine.length == ref.length, s"chunk count for '$text' at $budget")
        // chunk ids are dense from 0; counts match the reference fold
        mine.zip(ref).zipWithIndex.foreach { case (((_, cid, np, nt, _), (_, rn, rt)), k) =>
          assert(cid == k && np == rn && nt == rt,
            s"chunk $k of '$text' at $budget: got ($np, $nt) want ($rn, $rt)")
        }
        // round-trip: concatenated chunks reproduce the stripped text
        assert(mine.map(_._5).mkString("") == strip(text), s"round-trip of '$text'")
        // budget honored except single-piece overflows
        mine.foreach { case (_, _, np, nt, _) =>
          assert(nt <= budget || np == 1, s"overfull multi-piece chunk in '$text'")
        }
      }
    }
  }
}
