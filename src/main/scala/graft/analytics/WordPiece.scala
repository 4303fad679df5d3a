package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenizer (Schuster & Nakajima 2012, "Japanese and Korean
  * voice search"; the tokenizer BERT-family pipelines budget in) — the
  * third trained-tokenizer family next to [[Bpe]] (bottom-up merges) and
  * [[Unigram]] (Viterbi max-likelihood): a piece VOCABULARY with `##`
  * continuation marking, applied by greedy LONGEST-MATCH-FIRST (maximal
  * munch) per word. No backtracking: if at any position no vocabulary
  * piece matches, the ENTIRE word becomes the single `[UNK]` token —
  * exactly the published BERT apply rule, which the spec and the DuckDB
  * oracle both pin.
  *
  * Training is the [[Bpe.train]]/[[Unigram.train]] architecture re-used:
  * ONE distributed word-count pass collapses the corpus to a bounded
  * (word, freq) table (top `wordCap` by count, ties lexicographic), and
  * the merge loop runs driver-local over that summary. Where BPE merges
  * the most FREQUENT adjacent pair, WordPiece merges the pair maximizing
  * the likelihood ratio count(ab) / (count(a) · count(b)) — the score the
  * public WordPiece trainers document. Scores are compared in exact
  * BigInt cross-multiplication (no float ties), ties broken
  * lexicographically, so training is deterministic end to end. Cost per
  * merge is O(wordCap · avgLen), corpus-independent — the bounded-model
  * shape every trainer in this repo uses.
  *
  * Apply is a native Catalyst expression ([[WordPieceSegment]]): split on
  * whitespace exactly like [[graft.functions.TextFunctions.tokens]],
  * maximal-munch per word against the model's hash set (O(len ·
  * maxPieceLen) lookups), flatten in order. The expression participates
  * in whole-stage codegen (generated code calls the shared kernel through
  * a referenced model object — the [[Unigram.UnigramSegment]] pattern),
  * so tokenization stays a stateless, zero-shuffle corpus scan at any
  * scale.
  *
  * Oracle geometry: the registered query uses [[FixedVocab]] embedded as
  * literals on both sides (the [[Bpe.FixedMerges]] split — DuckDB replays
  * the greedy scan as ONE recursive CTE over the same literal piece map);
  * library callers default to [[train]]'s corpus-fit vocabulary, pinned
  * by the JVM-twin and trainer property specs. [[FixedVocab]] has no
  * continuation piece ending in `y`, so corpus words with a non-initial
  * `y` (`key`, `query`) exercise the whole-word-`[UNK]` rule INSIDE the
  * oracle, not just in the spec. */
object WordPiece {

  /** Continuation-piece prefix: a piece starting with `##` may only
    * match at a non-initial position within a word (and the `##` itself
    * matches zero characters). */
  val ContPrefix = "##"

  /** A trained WordPiece model: the piece vocabulary (word-initial
    * pieces plain, continuations `##`-prefixed), the maximum RAW span a
    * piece may cover (continuation `##ab` has raw span 2), and the
    * unknown-word token. Equality is by the fitted data — the expression
    * embeds the model, and Catalyst compares expressions structurally. */
  final case class WordPieceModel(vocab: Vector[String], maxPieceLen: Int,
      unkToken: String = "[UNK]") extends Serializable {
    require(vocab.nonEmpty, "wordpiece model needs at least one piece")
    require(maxPieceLen > 0, "maxPieceLen must be positive")
    @transient lazy val lookup: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String](vocab.size * 2)
      vocab.foreach(s.add)
      s
    }
  }

  /** Oracle-geometry vocabulary over the synthetic corpus (TESTDATA.md's
    * documents are space-joined lowercase words): single-char floor for
    * word-initial positions, `##`-continuation floor for every char
    * EXCEPT `y` (so `key`/`query` hit the `[UNK]` rule), and multi-char
    * pieces sized so maximal munch does non-trivial work — whole-word
    * pieces (`table`, `stream`), prefix+suffix splits (`val`+`##ue`,
    * `fil`+`##ter`, `c`+`##ustom`+`##er`), and shadowed shorter pieces
    * the longest-match rule must skip (`ta` under `table`). Small enough
    * to embed as a literal SQL map. */
  val FixedVocab: Vector[String] = {
    val initials = Vector(
      "th", "the", "jo", "join", "ha", "hash", "sc", "scan", "qu", "quer",
      "pa", "part", "val", "ta", "table", "win", "wind", "str", "stream",
      "so", "sort", "li", "line", "ag", "agg", "ro", "ba", "batch", "me",
      "merge", "da", "data", "bi", "big", "gr", "sl", "fa", "fast", "sm",
      "or", "ord", "ve", "vec", "co", "col", "fi", "fil", "du", "dup",
      "sp", "spark")
    val conts = Vector(
      "##ue", "##er", "##an", "##in", "##le", "##ow", "##all", "##umn",
      "##ter", "##der", "##tor", "##eam", "##oup", "##ark", "##ast",
      "##ash", "##atch", "##ta", "##ustom", "##art", "##ig", "##ort")
    val charFloor = (('a' to 'z') ++ ('0' to '9')).toVector
    val initialFloor = charFloor.map(_.toString)
    val contFloor = charFloor.filter(_ != 'y').map(c => ContPrefix + c)
    initials ++ conts ++ initialFloor ++ contFloor
  }

  /** The fixed model the registered query and its oracle share. */
  val FixedModel: WordPieceModel = WordPieceModel(FixedVocab, maxPieceLen = 6)

  // -------------------------------------------------------------- kernel

  /** Raw code points a piece covers (the `##` marker covers none).
    * Positions and spans count CODE POINTS, never surrogate halves — a
    * lone half has no UTF-8 encoding, and the DuckDB oracle's `substr`
    * counts code points ([[Unigram.cpBounds]] has the full argument). */
  private def rawLen(piece: String): Int = {
    val raw = if (piece.startsWith(ContPrefix))
      piece.substring(ContPrefix.length) else piece
    raw.codePointCount(0, raw.length)
  }

  /** Maximal-munch segmentation of ONE word — the single JVM kernel
    * shared by the expression's interpreted eval, its generated code,
    * and the spec twins. At each position the LONGEST vocabulary match
    * wins (raw spans k = min(maxPieceLen, remaining) code points down to
    * 1, continuation positions probe `##`+span); no match at any
    * position collapses the whole word to `[UNK]`. */
  def segmentWord(w: String, model: WordPieceModel): Array[String] = {
    if (w.isEmpty) return Array.empty
    val b = Unigram.cpBounds(w)
    val n = b.length - 1
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < n) {
      var k = math.min(model.maxPieceLen, n - pos)
      var found = -1
      var foundTok: String = null
      while (k >= 1 && found < 0) {
        val cand =
          if (pos == 0) w.substring(0, b(k))
          else ContPrefix + w.substring(b(pos), b(pos + k))
        if (model.lookup.contains(cand)) { found = k; foundTok = cand }
        k -= 1
      }
      if (found < 0) return Array(model.unkToken)
      out += foundTok
      pos += found
    }
    out.toArray
  }

  /** Whole-text segmentation: words = split(trim-spaces, \s+) with
    * empties dropped (exactly [[graft.functions.TextFunctions.tokens]]'s
    * tiles), each word segmented by [[segmentWord]], flattened in
    * order. */
  def segmentText(text: String, model: WordPieceModel): Array[String] = {
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
  def segmentUtf8(text: UTF8String, model: WordPieceModel): ArrayData =
    new GenericArrayData(
      segmentText(text.toString, model).map(UTF8String.fromString(_)))

  // ---------------------------------------------------------- expression

  /** Native tokenize expression: array<string> of WordPiece tokens.
    * Keeps whole-stage codegen alive — the generated code is one call
    * into the shared kernel via a referenced model object. */
  case class WordPieceSegment(child: Expression, model: WordPieceModel)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"wordpiece_segment expects a string input, got ${child.dataType.simpleString}")
    override def nullSafeEval(t: Any): Any =
      WordPiece.segmentUtf8(t.asInstanceOf[UTF8String], model)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val modelRef = ctx.addReferenceObj("wordPieceModel", model,
        classOf[WordPieceModel].getName)
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.analytics.WordPiece.segmentUtf8($t, $modelRef);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** WordPiece tokens of `text` (array<string>); stripping `##` and
    * concatenating reproduces each word EXCEPT words collapsed to
    * `[UNK]` — the conditional round-trip `WordPieceSpec` pins. */
  def tokenize(text: Column, model: WordPieceModel = FixedModel): Column =
    Bridge.column(WordPieceSegment(Bridge.expression(text), model))

  /** WordPiece token count (LONG — the type the budget operators sum;
    * usable as `tokenCounter` for [[Corpus.selectToTokenBudget]] and
    * [[Corpus.packSequences]]). */
  def tokenCount(text: Column, model: WordPieceModel = FixedModel): Column =
    size(tokenize(text, model)).cast("long")

  // ------------------------------------------------------------ training

  /** Fit a WordPiece vocabulary: seed with the word-initial and `##`
    * continuation single-character alphabet of the counted words, then
    * repeatedly merge the adjacent piece pair with the highest
    * likelihood score count(ab) / (count(a) · count(b)) until `vocabSize`
    * pieces exist, the best pair's count falls below `minPairCount`, or
    * no merge ≤ `maxPieceLen` raw chars remains. One distributed pass
    * (the word count); everything after runs on the driver over
    * ≤ `wordCap` rows.
    *
    * Deterministic end to end: exact long counts, BigInt
    * cross-multiplied score comparison (count(ab)·c(a')·c(b') vs
    * count(a'b')·c(a)·c(b) — no float rounding), lexicographic pair
    * tie-break, stable orderings. */
  def train(docs: DataFrame, vocabSize: Int = 256, maxPieceLen: Int = 8,
      minPairCount: Long = 2, wordCap: Int = 20000,
      textCol: String = "text"): WordPieceModel = {
    require(vocabSize > 0 && maxPieceLen > 0)
    val words = docs
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(wordCap)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // current segmentation of each counted word (starts at code-point level)
    val segs: Array[Array[String]] = words.map { case (w, _) =>
      val b = Unigram.cpBounds(w)
      Array.tabulate(b.length - 1) { i =>
        val c = w.substring(b(i), b(i + 1))
        if (i == 0) c else ContPrefix + c
      }
    }
    // seed vocabulary: the character alphabet actually present, sorted
    val vocab = scala.collection.mutable.LinkedHashSet.empty[String]
    segs.iterator.flatten.toVector.sorted.distinct.foreach(vocab.add)

    var continue = vocab.size < vocabSize
    while (continue) {
      val pieceCount = scala.collection.mutable.HashMap.empty[String, Long]
      val pairCount = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < segs.length) {
        val seg = segs(wi); val c = words(wi)._2
        var i = 0
        while (i < seg.length) {
          pieceCount.update(seg(i), pieceCount.getOrElse(seg(i), 0L) + c)
          if (i + 1 < seg.length) {
            val p = (seg(i), seg(i + 1))
            pairCount.update(p, pairCount.getOrElse(p, 0L) + c)
          }
          i += 1
        }
        wi += 1
      }
      // best admissible pair by likelihood score — ONE linear scan with a
      // TOTAL comparison (score, then lexicographic pair), so the winner
      // is hash-iteration-order independent without sorting the pair
      // table every round (that sort made large vocabs O(merges · pairs
      // log pairs) on the driver)
      var best: (String, String) = null
      var bestN = 0L
      pairCount.foreach { case (p @ (a, b), nAb) =>
        if (rawLen(a) + rawLen(b) <= maxPieceLen && nAb >= minPairCount) {
          val better = best == null || {
            // score(p) > score(best) ⇔ nAb·c(bestA)·c(bestB) > nBest·c(a)·c(b)
            val l = BigInt(nAb) * BigInt(pieceCount(best._1)) * BigInt(pieceCount(best._2))
            val r = BigInt(bestN) * BigInt(pieceCount(a)) * BigInt(pieceCount(b))
            val cmp = l.compare(r)
            cmp > 0 || (cmp == 0 && Ordering[(String, String)].lt(p, best))
          }
          if (better) { best = p; bestN = nAb }
        }
      }
      if (best == null) continue = false
      else {
        val merged = best._1 + best._2.stripPrefix(ContPrefix)
        vocab.add(merged)
        // contract every adjacent (a,b) occurrence, left to right
        wi = 0
        while (wi < segs.length) {
          val seg = segs(wi)
          var has = false
          var i = 0
          while (i + 1 < seg.length && !has) {
            has = seg(i) == best._1 && seg(i + 1) == best._2; i += 1
          }
          if (has) {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            i = 0
            while (i < seg.length) {
              if (i + 1 < seg.length && seg(i) == best._1 && seg(i + 1) == best._2) {
                out += merged; i += 2
              } else { out += seg(i); i += 1 }
            }
            segs(wi) = out.toArray
          }
          wi += 1
        }
        continue = vocab.size < vocabSize
      }
    }
    WordPieceModel(vocab.toVector, maxPieceLen)
  }

  /** Persist a model as (piece, max_piece_len, unk_token) parquet; piece
    * order is the vocabulary's (seed alphabet then merge order). */
  def save(spark: SparkSession, model: WordPieceModel, path: String): Unit = {
    import spark.implicits._
    model.vocab.zipWithIndex.map { case (p, i) =>
      (i, p, model.maxPieceLen, model.unkToken)
    }.toDF("ord", "piece", "max_piece_len", "unk_token")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): WordPieceModel = {
    val rows = spark.read.parquet(path).orderBy(col("ord")).collect()
    require(rows.nonEmpty, s"wordpiece model at $path is empty")
    WordPieceModel(
      rows.map(_.getAs[String]("piece")).toVector,
      rows.head.getAs[Int]("max_piece_len"),
      rows.head.getAs[String]("unk_token"))
  }

  // --------------------------------------------------------- oracle SQL

  /** DuckDB literal membership map of [[FixedVocab]] (piece → 1) —
    * shared source of truth with the Spark side. */
  private[analytics] def vocabMapSql: String = {
    val keys = FixedVocab.map(p => s"'$p'").mkString(",")
    val vals = FixedVocab.map(_ => "1").mkString(",")
    s"map([$keys],[$vals])"
  }
}
