package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.analytics.{Bpe, Pii, Similarity, Unigram, WordPiece}
import graft.functions.TextFunctions

/** SQL surface of the engine's scalar/array functions: every entry in
  * [[GraftFunctions.registry]] becomes a `graft_*` SQL function, so the
  * text-analysis, tokenizer, fingerprint, and similarity primitives are
  * callable from pure SQL (Thrift server, notebooks, `spark.sql`) — not
  * just the Scala Column API.
  *
  * Two registration paths, same builder list:
  *  - config-driven, for new sessions:
  *    `--conf spark.sql.extensions=graft.GraftExtensions`
  *  - imperative, for a session that already exists:
  *    `GraftFunctions.register(spark)`
  *
  * Builders wrap the EXISTING Column-level implementations through the
  * expression bridge, so the SQL path and the Scala path share one
  * definition — codegen-friendly expression trees, no UDFs, identical
  * semantics (the spec pins SQL == Column API on the corpus).
  *
  * The model-parameterized tokenizers register with their fixed
  * demo-geometry models ([[Bpe.FixedMerges]], [[Unigram.FixedModel]],
  * [[WordPiece.FixedModel]]); corpus-trained models carry state a SQL
  * literal cannot express — load those through the Scala API. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.registry.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        GraftFunctions.info(name), builder))
    }
}

object GraftFunctions {
  type Builder = Seq[Expression] => Expression

  private def c(e: Expression): Column = Bridge.column(e)
  // builders hand their result STRAIGHT to the analyzer — convert the
  // column tree eagerly (Bridge.resolvedExpression), never wrap lazily
  private def x(col: Column): Expression = Bridge.resolvedExpression(col)

  private def arity(name: String, args: Seq[Expression], ns: Int*): Unit =
    if (!ns.contains(args.length))
      throw new IllegalArgumentException(
        s"$name expects ${ns.mkString(" or ")} argument(s), got ${args.length}")

  private def litInt(name: String, arg: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) =>
      // refuse silent wrap-around (e.g. 4294967299 -> 3) at analysis,
      // matching the "bad geometry fails at analysis" contract
      if (!v.isValidInt) throw new IllegalArgumentException(
        s"$name: $arg must fit in Int, got $v")
      else v.toInt
    case _ => throw new IllegalArgumentException(
      s"$name: $arg must be an integer literal")
  }

  private def litStr(name: String, arg: String, e: Expression): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case _ => throw new IllegalArgumentException(
      s"$name: $arg must be a string literal")
  }

  private def f1(name: String)(f: Column => Column): (String, Builder) =
    name -> { args: Seq[Expression] =>
      arity(name, args, 1); x(f(c(args.head)))
    }

  /** SQL name → expression builder. One list drives both registration
    * paths; names are prefixed `graft_` to stay clear of builtins. */
  val registry: Seq[(String, Builder)] = Seq(
    // text analysis
    f1("graft_tokens")(TextFunctions.tokens),
    f1("graft_token_count")(t => TextFunctions.tokenCount(t).cast("long")),
    f1("graft_quality_score")(TextFunctions.qualityScore),
    f1("graft_punct_ratio")(TextFunctions.punctRatio),
    f1("graft_stopword_ratio")(TextFunctions.stopwordRatio),
    f1("graft_mean_word_len")(TextFunctions.meanWordLen),
    f1("graft_lang_id")(TextFunctions.langId),
    f1("graft_fingerprint")(TextFunctions.fingerprint),
    f1("graft_hash60")(TextFunctions.hash60),
    f1("graft_pii_redact")(Pii.redactText),
    // tokenizers (fixed demo geometry; see class scaladoc)
    f1("graft_bpe_pieces")(TextFunctions.bpePieces),
    f1("graft_bpe_token_count")(t => TextFunctions.bpeTokenCount(t).cast("long")),
    f1("graft_bpe_tokenize")(t => Bpe.tokenize(t)),
    f1("graft_unigram_tokenize")(t => Unigram.tokenize(t)),
    f1("graft_wordpiece_tokenize")(t => WordPiece.tokenize(t)),
    // fingerprint / shingle families with literal geometry
    "graft_shingles" -> { args: Seq[Expression] =>
      arity("graft_shingles", args, 1, 2)
      val n = if (args.length == 2) litInt("graft_shingles", "n", args(1)) else 3
      x(TextFunctions.shingles(c(args.head), n))
    },
    "graft_winnow_fp" -> { args: Seq[Expression] =>
      arity("graft_winnow_fp", args, 3)
      x(TextFunctions.winnowFingerprints(c(args.head),
        litInt("graft_winnow_fp", "k", args(1)),
        litInt("graft_winnow_fp", "w", args(2))))
    },
    "graft_lang_score" -> { args: Seq[Expression] =>
      arity("graft_lang_score", args, 2)
      x(TextFunctions.langScore(c(args.head),
        litStr("graft_lang_score", "lang", args(1))))
    },
    // similarity
    "graft_cosine" -> { args: Seq[Expression] =>
      arity("graft_cosine", args, 2)
      x(Similarity.cosine(c(args.head), c(args(1))))
    })

  private val byName: Map[String, Builder] = registry.toMap

  def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  /** Imperative registration into an existing session (idempotent —
    * re-registering replaces the previous binding). */
  def register(spark: SparkSession): Unit =
    registry.foreach { case (name, builder) =>
      Bridge.registerFunction(spark, name, info(name), builder)
    }

  /** Builder lookup for tests. */
  def builder(name: String): Builder = byName(name)
}
