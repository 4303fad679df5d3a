package graft

import org.apache.spark.sql.functions._
import graft.analytics.Unigram
import graft.analytics.Unigram.UnigramModel

/** Unigram-LM tokenizer: Viterbi optimality against brute force, the
  * column/JVM twin equality, round-trip, determinism and EM sanity of
  * the trainer, and save/load. */
class UnigramSpec extends SparkTestBase {

  private val rng = new scala.util.Random(41)

  test("Viterbi == brute-force max-likelihood segmentation on random words " +
    "and vocabularies (smallest-k tie-break)") {
    def bruteBest(w: String, m: UnigramModel): (Double, List[String]) = {
      // enumerate all segmentations; higher score wins, ties prefer the
      // segmentation the k-ascending DP would build (leftmost-shortest):
      // compare token lists by length DESC then lexicographic piece-wise
      // is NOT the DP order — instead replicate the DP tie rule directly:
      // among equal scores prefer the one whose FINAL piece is shorter,
      // recursively (that is exactly what strict > with k ascending does)
      def go(n: Int): (Double, List[String]) =
        if (n == 0) (0.0, Nil)
        else {
          var best: (Double, List[String]) = (Double.NegativeInfinity, Nil)
          var k = 1
          val kMax = math.min(n, m.maxPieceLen)
          while (k <= kMax) {
            val piece = w.substring(n - k, n)
            val lpOpt = Option(m.lookup.get(piece)).map(_.doubleValue())
              .orElse(if (k == 1) Some(m.unkScore) else None)
            lpOpt.foreach { lp =>
              val (s, toks) = go(n - k)
              // strict >: the smallest final k wins ties, matching the DP
              if (s + lp > best._1) best = (s + lp, toks :+ piece)
            }
            k += 1
          }
          best
        }
      go(w.length)
    }
    (1 to 60).foreach { _ =>
      val alpha = "abcd"
      val w = (1 to (1 + rng.nextInt(8))).map(_ => alpha(rng.nextInt(4))).mkString
      val nPieces = 2 + rng.nextInt(5)
      val pieces = (1 to nPieces).map { _ =>
        val len = 1 + rng.nextInt(3)
        (1 to len).map(_ => alpha(rng.nextInt(4))).mkString
      }.distinct.toVector
      val vocab = (pieces ++ alpha.map(_.toString)).distinct
        .map(p => p -> -(1.0 + rng.nextInt(8) * 0.5))
      val m = UnigramModel(vocab, maxPieceLen = 4)
      val got = Unigram.segmentWord(w, m).toList
      val (bestScore, bestToks) = bruteBest(w, m)
      val gotScore = got.map(p =>
        Option(m.lookup.get(p)).map(_.doubleValue()).getOrElse(m.unkScore)).sum
      assert(got.mkString == w, s"$got does not tile $w")
      assert(gotScore == bestScore, s"word $w vocab $vocab: dp $gotScore brute $bestScore")
      assert(got == bestToks, s"word $w vocab $vocab: dp $got brute $bestToks")
    }
  }

  test("column tokenize == JVM twin over the corpus; concatenation round-trips " +
    "the whitespace-stripped text") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = docs.select(col("doc_id"), col("text"),
        Unigram.tokenize(col("text")).as("toks"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val text = r.getAs[String]("text")
      val got = r.getAs[scala.collection.Seq[String]]("toks").toList
      val twin = Unigram.segmentText(text, Unigram.FixedModel).toList
      assert(got == twin, s"doc ${r.getLong(0)}: column != JVM twin")
      assert(got.mkString == text.split("\\s+").filter(_.nonEmpty).mkString,
        s"doc ${r.getLong(0)}: tokens do not round-trip")
    }
  }

  test("tokenize handles hostile inputs: null, empty, all-whitespace, " +
    "out-of-vocabulary unicode") {
    val s = spark; import s.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, ""), (2L, "   "), (3L, "\t\n"), (4L, "héllo wörld ✓"),
      (5L, null)).toDF("id", "text")
    val got = df.select(col("id"), Unigram.tokenize(col("text")).as("t"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[scala.collection.Seq[String]]("t")).map(_.toList)).toMap
    assert(got(1L).contains(Nil) && got(2L).contains(Nil) && got(3L).contains(Nil))
    assert(got(5L).isEmpty, "null text must stay null")
    val uni = got(4L).get
    assert(uni.mkString == "héllowörld✓", s"unicode round-trip broke: $uni")
  }

  test("train: deterministic, normalized, beats the single-char floor on its " +
    "own corpus, and save/load round-trips") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val m1 = Unigram.train(docs, vocabSize = 64, emRounds = 3)
    val m2 = Unigram.train(docs, vocabSize = 64, emRounds = 3)
    assert(m1 == m2, "training is not deterministic")
    // multi-char pieces survive and the probabilities roughly normalize
    assert(m1.pieces.exists(_._1.length > 1), "no multi-char piece learned")
    val mass = m1.pieces.map { case (_, lp) => math.exp(lp) }.sum
    assert(mass > 0.9 && mass < 1.1, s"probability mass $mass far from 1")
    // the fitted model segments the corpus at higher likelihood than the
    // uniform single-char floor model
    val charModel = UnigramModel(
      m1.pieces.filter(_._1.length == 1).map { case (p, _) => p -> -8.0 },
      maxPieceLen = 1)
    def totalScore(m: UnigramModel): Double =
      docs.select(col("text")).collect().map { r =>
        Unigram.segmentText(r.getString(0), m).map(p =>
          Option(m.lookup.get(p)).map(_.doubleValue()).getOrElse(m.unkScore)).sum
      }.sum
    assert(totalScore(m1) > totalScore(charModel),
      "EM fit does not beat the single-char floor")
    // fewer tokens than characters (multi-char pieces actually used)
    val sample = docs.limit(20).collect().map(_.getAs[String]("text"))
    val nTok = sample.map(t => Unigram.segmentText(t, m1).length).sum
    val nChar = sample.map(_.count(!_.isWhitespace)).sum
    assert(nTok < nChar, s"trained model never uses multi-char pieces ($nTok vs $nChar)")
    // save/load
    val dir = java.nio.file.Files.createTempDirectory("unigram").toString
    Unigram.save(spark, m1, dir)
    val loaded = Unigram.load(spark, dir)
    assert(loaded.pieces.toMap == m1.pieces.toMap &&
      loaded.maxPieceLen == m1.maxPieceLen)
    // a loaded model segments identically
    sample.foreach { t =>
      assert(Unigram.segmentText(t, loaded).toList ==
        Unigram.segmentText(t, m1).toList)
    }
  }

  test("tokenCount plugs into the token-budget seam") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val counted = docs.select(col("doc_id"),
        Unigram.tokenCount(col("text")).as("n")).collect()
    counted.foreach { r =>
      assert(r.getLong(1) > 0, s"doc ${r.getLong(0)} counted zero tokens")
    }
  }
}
