package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-language-model tokenizer (the SentencePiece unigram model,
  * Kudo 2018, "Subword Regularization") — the second trained tokenizer
  * family next to [[Bpe]]: where BPE composes merges bottom-up, the
  * unigram model keeps a piece vocabulary with log-probabilities and
  * segments each word by VITERBI — the max-likelihood split
  * argmax Σ log p(pieceᵢ).
  *
  * Training is the [[Bpe.train]] architecture re-used: ONE distributed
  * word-count pass collapses the corpus to a bounded (word, freq) table
  * (top `wordCap` by count, ties lexicographic — deterministic), and the
  * EM fit runs driver-local over that summary — seed vocabulary from
  * substring frequencies, forward-backward expected counts per round,
  * prune to the target size. Cost after the one shuffle is
  * O(wordCap · len · maxPieceLen) per round, corpus-independent — the
  * bounded-model shape every trainer in this repo uses (BPE pair loop,
  * IVF quantizer, NB model).
  *
  * Apply is a native Catalyst expression ([[UnigramSegment]]): split on
  * whitespace exactly like [[graft.functions.TextFunctions.tokens]],
  * Viterbi per word against the model's hash map (O(len · maxPieceLen)
  * lookups), flatten in order. The expression participates in whole-stage
  * codegen (generated code calls the segment kernel through a referenced
  * model object — the same pattern Spark's own regexp expressions use for
  * their compiled patterns), so tokenization stays a stateless,
  * zero-shuffle corpus scan at any scale. Characters outside the
  * vocabulary surface as single-char tokens at [[UnigramModel.unkScore]]
  * (min vocab log-prob − 10), so segmentation totals stay finite and the
  * oracle can replay them.
  *
  * Determinism contract (what the DuckDB oracle replays, candidate by
  * candidate): at position j the candidates are piece lengths
  * k = 1..min(j, maxPieceLen); each scores dp[j−k] + lp(piece) — one
  * double addition of identical literals in both engines — and the
  * SMALLEST k wins score ties (strict `>` improvement, k ascending).
  *
  * Oracle geometry: the registered query uses [[FixedVocab]] embedded as
  * literals on both sides (the [[Bpe.FixedMerges]] split); library
  * callers default to [[train]]'s corpus-fit model, pinned by the
  * JVM-twin and EM property specs. */
object Unigram {

  /** A trained unigram model: pieces with log-probabilities. `unkScore`
    * is the out-of-vocabulary single-character penalty (derived, not
    * fitted: min piece log-prob − 10). Equality is by the fitted data —
    * the expression embeds the model, and Catalyst compares expressions
    * structurally. */
  final case class UnigramModel(pieces: Vector[(String, Double)],
      maxPieceLen: Int) extends Serializable {
    require(pieces.nonEmpty, "unigram model needs at least one piece")
    val unkScore: Double = pieces.map(_._2).min - 10.0
    @transient lazy val lookup: java.util.HashMap[String, java.lang.Double] = {
      val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
      pieces.foreach { case (p, lp) => m.put(p, lp) }
      m
    }
  }

  /** Oracle-geometry vocabulary: pieces over the synthetic corpus's
    * vocabulary (TESTDATA.md's documents are space-joined lowercase
    * words) plus every lowercase letter and digit as single-char floor.
    * Log-probs are plain decimal literals — both engines parse them to
    * the same doubles, so Viterbi sums are bit-identical. Small enough
    * to embed as a literal SQL map. */
  val FixedVocab: Vector[(String, Double)] = {
    val words = Vector(
      "the" -> -3.0, "key" -> -3.5, "agg" -> -3.5, "row" -> -3.5,
      "scan" -> -3.75, "slow" -> -3.75, "fast" -> -3.75, "table" -> -4.0,
      "value" -> -4.0, "part" -> -3.75, "hash" -> -3.75, "merge" -> -4.0,
      "batch" -> -4.0, "spark" -> -4.0, "line" -> -3.5, "sort" -> -3.5,
      "window" -> -4.25, "join" -> -3.5, "index" -> -4.0, "query" -> -4.0,
      "plan" -> -3.75, "shuffle" -> -4.5, "column" -> -4.25, "filter" -> -4.25,
      "er" -> -4.5, "in" -> -4.0, "an" -> -4.0, "on" -> -4.0, "at" -> -4.0,
      "st" -> -4.5, "ta" -> -4.75, "le" -> -4.5)
    val chars = (('a' to 'z') ++ ('0' to '9')).toVector
      .map(c => c.toString -> -8.0)
    words ++ chars
  }

  /** The fixed model the registered query and its oracle share. */
  val FixedModel: UnigramModel = UnigramModel(FixedVocab, maxPieceLen = 7)

  // -------------------------------------------------------------- kernel

  /** Code-point boundary offsets of `w`: bounds(i) is the char index
    * where code point i starts, bounds(n) = length. Pieces are CODE
    * POINT sequences, never surrogate halves — a lone half has no UTF-8
    * encoding (it would round-trip through the engine as `?`), and the
    * DuckDB oracle's `substr` counts code points, so char-indexed pieces
    * would desynchronize the two engines on astral-plane text. */
  private[analytics] def cpBounds(w: String): Array[Int] = {
    val n = w.codePointCount(0, w.length)
    val b = new Array[Int](n + 1)
    var i = 0; var cp = 0
    while (cp < n) { b(cp) = i; i = w.offsetByCodePoints(i, 1); cp += 1 }
    b(n) = w.length
    b
  }

  /** Viterbi segmentation of ONE word — the single JVM kernel shared by
    * the expression's interpreted eval, its generated code, and the spec
    * twins, so the recurrence can never desynchronize between them.
    * Positions and piece lengths count CODE POINTS ([[cpBounds]]). */
  def segmentWord(w: String, model: UnigramModel): Array[String] = {
    if (w.isEmpty) return Array.empty
    val b = cpBounds(w)
    val n = b.length - 1
    val maxK = model.maxPieceLen
    val dp = new Array[Double](n + 1)
    val bp = new Array[Int](n + 1)
    var j = 1
    while (j <= n) {
      var best = Double.NegativeInfinity
      var bestK = 1
      var k = 1
      val kMax = math.min(j, maxK)
      while (k <= kMax) {
        val piece = w.substring(b(j - k), b(j))
        val lp = model.lookup.get(piece)
        val s =
          if (lp != null) dp(j - k) + lp.doubleValue()
          else if (k == 1) dp(j - 1) + model.unkScore
          else Double.NaN
        // strict > with k ascending: the smallest k wins ties (NaN —
        // an unmatchable multi-char span — never compares greater)
        if (s > best) { best = s; bestK = k }
        k += 1
      }
      dp(j) = best
      bp(j) = bestK
      j += 1
    }
    // backtrace
    var cnt = 0
    var pos = n
    while (pos > 0) { cnt += 1; pos -= bp(pos) }
    val out = new Array[String](cnt)
    pos = n
    var i = cnt - 1
    while (pos > 0) {
      out(i) = w.substring(b(pos - bp(pos)), b(pos))
      pos -= bp(pos)
      i -= 1
    }
    out
  }

  /** Whole-text segmentation: words = split(trim-spaces, \s+) with
    * empties dropped (exactly [[graft.functions.TextFunctions.tokens]]'s
    * tiles), each word segmented by [[segmentWord]], flattened in
    * order. */
  def segmentText(text: String, model: UnigramModel): Array[String] = {
    // Spark's trim() strips only ' ' (0x20) — replicate, don't "improve"
    var s = 0; var e = text.length
    while (s < e && text.charAt(s) == ' ') s += 1
    while (e > s && text.charAt(e - 1) == ' ') e -= 1
    val trimmed = text.substring(s, e)
    if (trimmed.isEmpty) return Array.empty
    trimmed.split("\\s+").iterator.filter(_.nonEmpty)
      .flatMap(w => segmentWord(w, model)).toArray
  }

  /** Codegen bridge: segment a UTF8String into Catalyst array data. */
  def segmentUtf8(text: UTF8String, model: UnigramModel): ArrayData =
    new GenericArrayData(
      segmentText(text.toString, model).map(UTF8String.fromString(_)))

  // ---------------------------------------------------------- expression

  /** Native tokenize expression: array<string> of unigram tokens. Keeps
    * whole-stage codegen alive — the generated code is one call into the
    * shared kernel via a referenced model object. */
  case class UnigramSegment(child: Expression, model: UnigramModel)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unigram_segment expects a string input, got ${child.dataType.simpleString}")
    override def nullSafeEval(t: Any): Any =
      Unigram.segmentUtf8(t.asInstanceOf[UTF8String], model)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val modelRef = ctx.addReferenceObj("unigramModel", model,
        classOf[UnigramModel].getName)
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.analytics.Unigram.segmentUtf8($t, $modelRef);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Unigram tokens of `text` (array<string>); concatenating them
    * reproduces the whitespace-stripped text — the round-trip property
    * `UnigramSpec` pins. */
  def tokenize(text: Column, model: UnigramModel = FixedModel): Column =
    Bridge.column(UnigramSegment(Bridge.expression(text), model))

  /** Unigram token count (LONG — the type the budget operators sum;
    * usable as `tokenCounter` for [[Corpus.selectToTokenBudget]] and
    * [[Corpus.packSequences]]). */
  def tokenCount(text: Column, model: UnigramModel = FixedModel): Column =
    size(tokenize(text, model)).cast("long")

  // ------------------------------------------------------------ training

  /** Fit a unigram model by EM (Kudo 2018 §3): seed with frequent
    * substrings, iterate forward-backward expected counts over the
    * bounded word table, prune toward `vocabSize` keeping the single-char
    * floor. One distributed pass (the word count); everything after runs
    * on the driver over ≤ `wordCap` rows.
    *
    *  - Seeds: every substring of every counted word up to `maxPieceLen`,
    *    scored freq·len; top `vocabSize · seedFactor` multi-char seeds
    *    plus ALL single chars (the floor that keeps every word
    *    segmentable without UNK).
    *  - E-step: per word, forward/backward log-sums over the piece
    *    lattice; expected piece count = exp(α(j) + lp − β-complement)
    *    · freq.
    *  - M-step: lp = log(count / total).
    *  - Prune: drop the lowest-expected-count QUARTER of multi-char
    *    pieces each round while above `vocabSize` (the SentencePiece
    *    shrink schedule, simplified to count-based ranking).
    *
    * Deterministic end to end: exact long word counts with lexicographic
    * tie-break, driver-local double math, stable orderings. */
  def train(docs: DataFrame, vocabSize: Int = 256, maxPieceLen: Int = 7,
      emRounds: Int = 4, wordCap: Int = 20000, seedFactor: Int = 4,
      textCol: String = "text"): UnigramModel = {
    require(vocabSize > 0 && maxPieceLen > 0 && emRounds > 0)
    val words = docs
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(wordCap)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // ---- seed vocabulary
    val subScore = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, c) =>
      val b = cpBounds(w)
      val n = b.length - 1
      var i = 0
      while (i < n) {
        var k = 1
        val kMax = math.min(maxPieceLen, n - i)
        while (k <= kMax) {
          val p = w.substring(b(i), b(i + k))
          subScore.update(p, subScore.getOrElse(p, 0L) + c * k)
          k += 1
        }
        i += 1
      }
    }
    val cpLen: String => Int = p => p.codePointCount(0, p.length)
    val singles = subScore.keysIterator.filter(cpLen(_) == 1).toVector.sorted
    val multiSeeds = subScore.iterator.filter(p => cpLen(p._1) > 1).toVector
      .sortBy { case (p, s) => (-s, p) }
      .take(vocabSize * seedFactor).map(_._1)
    var vocab: Vector[String] = singles ++ multiSeeds
    val totalSeed = vocab.iterator.map(subScore(_)).sum.toDouble
    var logp = scala.collection.mutable.HashMap.empty[String, Double]
    vocab.foreach(p => logp(p) = math.log(subScore(p) / totalSeed))

    // ---- EM rounds with pruning
    var round = 0
    while (round < emRounds) {
      val expected = scala.collection.mutable.HashMap.empty[String, Double]
      words.foreach { case (w, c) =>
        val b = cpBounds(w)
        val n = b.length - 1
        // forward: alpha(j) = logsumexp over pieces ending at j
        val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
        alpha(0) = 0.0
        var j = 1
        while (j <= n) {
          var k = 1
          val kMax = math.min(j, maxPieceLen)
          while (k <= kMax) {
            val lp = logp.get(w.substring(b(j - k), b(j)))
            lp.foreach(v => alpha(j) = logAdd(alpha(j), alpha(j - k) + v))
            k += 1
          }
          j += 1
        }
        // beta: beta(j) = logsumexp of completions from j to n
        val beta = Array.fill(n + 1)(Double.NegativeInfinity)
        beta(n) = 0.0
        j = n - 1
        while (j >= 0) {
          var k = 1
          val kMax = math.min(n - j, maxPieceLen)
          while (k <= kMax) {
            val lp = logp.get(w.substring(b(j), b(j + k)))
            lp.foreach(v => beta(j) = logAdd(beta(j), v + beta(j + k)))
            k += 1
          }
          j -= 1
        }
        val z = alpha(n)
        if (!z.isNegInfinity) {
          j = 0
          while (j < n) {
            var k = 1
            val kMax = math.min(n - j, maxPieceLen)
            while (k <= kMax) {
              val piece = w.substring(b(j), b(j + k))
              logp.get(piece).foreach { v =>
                val post = math.exp(alpha(j) + v + beta(j + k) - z)
                if (post > 0.0)
                  expected.update(piece, expected.getOrElse(piece, 0.0) + post * c)
              }
              k += 1
            }
            j += 1
          }
        }
      }
      // M-step over surviving pieces (singles always survive). The total
      // sums in sorted-key order: double addition is order-sensitive and
      // a hash-order sum would make the fit depend on HashMap internals.
      val total = expected.toVector.sortBy(_._1).iterator.map(_._2).sum
      val next = scala.collection.mutable.HashMap.empty[String, Double]
      vocab.foreach { p =>
        val e = expected.getOrElse(p, 0.0)
        if (cpLen(p) == 1 || e > 0.0)
          next(p) = math.log(math.max(e, 1e-10) / math.max(total, 1e-10))
      }
      // prune multi-char tail toward vocabSize (quarter per round)
      val multis = next.keysIterator.filter(cpLen(_) > 1).toVector
        .sortBy(p => (-expected.getOrElse(p, 0.0), p))
      val keepTarget = math.max(vocabSize - singles.size,
        (multis.size * 3) / 4)
      val keep = if (round == emRounds - 1) math.max(vocabSize - singles.size, 0)
        else keepTarget
      val kept = multis.take(math.max(keep, 0)).toSet
      vocab = singles ++ multis.filter(kept)
      logp = next.filter { case (p, _) => cpLen(p) == 1 || kept(p) }
      round += 1
    }
    val pieces = vocab.map(p => p -> logp(p))
    UnigramModel(pieces, maxPieceLen)
  }

  private def logAdd(a: Double, b: Double): Double =
    if (a.isNegInfinity) b
    else if (b.isNegInfinity) a
    else { val m = math.max(a, b); m + math.log(math.exp(a - m) + math.exp(b - m)) }

  /** Persist a model as (ord, piece, logprob, max_piece_len) parquet;
    * `ord` preserves the fitted piece order, so a save/load round-trip
    * reproduces the model EXACTLY — including case-class equality, which
    * Catalyst uses to compare expressions built from it structurally. */
  def save(spark: SparkSession, model: UnigramModel, path: String): Unit = {
    import spark.implicits._
    model.pieces.zipWithIndex.map { case ((p, lp), i) =>
      (i, p, lp, model.maxPieceLen)
    }.toDF("ord", "piece", "logprob", "max_piece_len")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): UnigramModel = {
    val df = spark.read.parquet(path)
    // pre-r13 saves carried no ord column; fall back to piece order
    val rows = (if (df.columns.contains("ord")) df.orderBy(col("ord"))
      else df.orderBy(col("piece"))).collect()
    require(rows.nonEmpty, s"unigram model at $path is empty")
    UnigramModel(
      rows.map(r => (r.getAs[String]("piece"), r.getAs[Double]("logprob"))).toVector,
      rows.head.getAs[Int]("max_piece_len"))
  }

  // --------------------------------------------------------- oracle SQL

  /** DuckDB literal map of [[FixedVocab]] — shared source of truth with
    * the Spark side. */
  private[analytics] def vocabMapSql: String = {
    val keys = FixedVocab.map { case (p, _) => s"'$p'" }.mkString(",")
    val vals = FixedVocab.map { case (_, lp) => s"CAST($lp AS DOUBLE)" }.mkString(",")
    s"map([$keys],[$vals])"
  }
}
