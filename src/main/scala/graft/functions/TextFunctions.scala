package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting, shingling.
  *
  * All functions are built from codegen'd Spark SQL expressions (no UDFs),
  * so they stay inside whole-stage codegen and push work to the scan at
  * 100 TB. Hashing is md5-based (available in every engine) so results are
  * portable and oracle-checkable. */
object TextFunctions {

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  def charCount(text: Column): Column = length(text)

  /** Punctuation chars / total chars; NULL for the empty string (nullif
    * keeps the zero-length divisor from throwing under ANSI mode — an
    * empty document must score NULL, not kill the stage; r6 fuzz
    * finding). */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") /
      nullif(length(text), lit(0))

  /** Mean word length in characters. */
  def meanWordLen(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, w) => acc + length(w).cast("long"))
      .cast("double") / size(tokens(text))

  /** Count of tokens found in `words`. */
  def wordHits(text: Column, words: Seq[String]): Column = {
    val arr = array(words.map(lit): _*)
    size(filter(tokens(text), t => array_contains(arr, t)))
  }

  /** Stopword tokens / total tokens (English stopword set). */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")
  def stopwordRatio(text: Column): Column =
    wordHits(text, EnglishStopwords).cast("double") / tokenCount(text)

  /** Heuristic document quality in [0,1]: rewards moderate length, low
    * punctuation density, presence of stopwords (prose-likeness), and
    * moderate mean word length. Deterministic double arithmetic (identical
    * op order to the component functions, so oracles stay bit-exact). The
    * token array is let-bound — the four component scores would otherwise
    * each re-run the regex split per row. */
  def qualityScore(text: Column): Column =
    bindOnce(tokens(text), { w =>
      val stopArr = array(EnglishStopwords.map(lit): _*)
      val lenScore = least(size(w).cast("double") / 100.0, lit(1.0))
      val punctScore = greatest(lit(1.0) - punctRatio(text) * 10.0, lit(0.0))
      val stopScore = least(
        size(filter(w, t => array_contains(stopArr, t))).cast("double") / size(w) * 5.0,
        lit(1.0))
      val mwl = aggregate(w, lit(0L), (acc, x) => acc + length(x).cast("long"))
        .cast("double") / size(w)
      val wordLenScore = greatest(lit(1.0) - abs(mwl - 5.0) / 5.0, lit(0.0))
      lenScore * 0.3 + punctScore * 0.3 + stopScore * 0.2 + wordLenScore * 0.2
    })

  /** Per-language stopword lexicons for n-gram-free language ID. */
  val LangLexicons: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "en" -> Seq("the", "a", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "fr" -> Seq("le", "les", "et", "des", "un", "une"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有")
  )

  /** Language-ID scores: hits per lexicon, normalized by token count. */
  def langScore(text: Column, lang: String): Column = {
    val lex = LangLexicons.toMap.apply(lang)
    wordHits(text, lex).cast("double") / tokenCount(text)
  }

  /** Predicted language: argmax of lexicon scores, ties broken by
    * alphabetical language code (deterministic). */
  def langId(text: Column): Column = {
    // fold over langs: keep (bestScore, bestLang); strict > keeps first
    // (alphabetically smallest) lang on ties.
    LangLexicons.foldLeft((lit(-1.0), lit("und"))) {
      case ((bestScore, bestLang), (lang, _)) =>
        val sc = langScore(text, lang)
        (when(sc > bestScore, sc).otherwise(bestScore),
          when(sc > bestScore, lit(lang)).otherwise(bestLang))
    }._2
  }

  /** Corpus-scale language ID: explode tokens once, broadcast-join the
    * lexicon, aggregate hit counts — set-oriented and codegen'd end to end
    * (the Column-based [[langId]] interprets higher-order filters per
    * lexicon, fine per-row but slower over whole corpora). Ties and the
    * zero-hit case resolve to the alphabetically first language, matching
    * [[langId]] exactly. Returns (idCol, predicted). */
  def langIdTable(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    val lexRows = LangLexicons.flatMap { case (lang, ws) => ws.map(w => (lang, w)) }
    val lex = spark.createDataFrame(lexRows).toDF("_lang", "_word")
    val base = df.select(col(idCol).as("_id"), tokens(col(textCol)).as("_toks"))
    val sizes = base.select(col("_id"), size(col("_toks")).as("_n"))
    val hits = base.select(col("_id"), explode(col("_toks")).as("_tok"))
      .join(broadcast(lex), col("_tok") === col("_word"))
      .groupBy(col("_id"), col("_lang")).agg(count(lit(1)).as("_hits"))
    val w = Window.partitionBy(col("_id"))
      .orderBy((col("_hits").cast("double") / col("_n")).desc, col("_lang"))
    val best = hits.join(sizes, "_id")
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(col("_id"), col("_lang").as("predicted"))
    sizes.select(col("_id")).join(best, Seq("_id"), "left")
      .select(col("_id").as(idCol),
        coalesce(col("predicted"), lit(LangLexicons.head._1)).as("predicted"))
  }

  /** Document fingerprint: md5 of case/whitespace-normalized text. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(lower(text))))

  /** BPE-style pre-tokenization pattern (RE2-compatible — no lookaround —
    * so the same pattern runs in Spark and DuckDB): a word is an optional
    * leading space + letters, or + digits, or + other non-space symbols;
    * remaining whitespace runs are their own tokens. This mirrors the
    * GPT-2 pre-tokenizer minus its apostrophe-contraction lookahead cases. */
  val BpePattern = " ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** BPE-ish token pieces of `text`. */
  def bpePieces(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** BPE-ish token count — the unit LLM-pipeline budgets are measured in. */
  def bpeTokenCount(text: Column): Column = size(bpePieces(text))

  /** Per-row let-binding: evaluate `value` exactly once and reference it
    * as a variable in `body`. Implemented as `aggregate` over an empty
    * array — the zero expression is evaluated once per row, and lambda
    * variables are plain references, immune to Catalyst's lambda inlining
    * (a subtree inlined into a `transform` lambda re-evaluates per
    * element, turning O(n) into O(n²) for nested array exprs). */
  def bindOnce(value: Column, body: Column => Column): Column =
    aggregate(array().cast("array<int>"), value, (acc, _) => acc, body)

  /** Winnowing fingerprints (rolling-hash document fingerprinting,
    * Schleimer et al. 2003): hash every `k`-char gram of the normalized
    * text, then keep the minimum hash of each sliding window of `w` grams;
    * the distinct selected hashes are the document's fingerprint set.
    * Guarantees any shared substring of length >= k+w-1 yields a shared
    * fingerprint. Entirely per-row array expressions — no explode/shuffle;
    * the gram-hash array is computed once per row (let-bound), so cost is
    * O(len·k) hashing + O(len·w) window mins.
    * Documents shorter than `k` chars fingerprint their whole text.
    *
    * Grams are sliced from a let-bound code-point array, NOT via
    * `substr(i, k)`: UTF8String.substring seeks from the START of the
    * string to find character i (variable-width encoding), so per-position
    * substr is O(len²) in document length — the r6 fuzz pass caught a
    * 2 MB single-line document taking tens of MINUTES on that path; the
    * char-array form is linear (~seconds), at a transient per-row cost of
    * one small string per code point, bounded by the 16 MiB record
    * limit. */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    bindOnce(concat_ws(" ", tokens(lower(text))), { norm =>
      bindOnce(split(norm, ""), { chars =>
        val nGrams = greatest(size(chars) - (k - 1), lit(1))
        bindOnce(transform(sequence(lit(1), nGrams),
          i => hash60(array_join(slice(chars, i, lit(k)), ""))), { hs =>
          when(size(hs) >= w,
            array_sort(array_distinct(transform(sequence(lit(1), size(hs) - (w - 1)),
              j => array_min(slice(hs, j, lit(w)))))))
            .otherwise(array(hash60(norm)))
        })
      })
    })

  /** Portable 60-bit hash: first 15 hex digits of md5, as a positive long.
    * Matches DuckDB `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Distinct word n-gram shingles (default 3). Documents shorter than n
    * words contribute their whole text as one shingle. The token array is
    * let-bound: referencing the split subtree from the transform lambda
    * would re-run the regex split once per shingle (see [[bindOnce]]). */
  def shingles(text: Column, n: Int = 3): Column =
    bindOnce(tokens(text), { w =>
      when(size(w) >= n,
        array_distinct(transform(sequence(lit(1), size(w) - (n - 1)),
          i => concat_ws(" ", slice(w, i, lit(n))))))
        .otherwise(array(concat_ws(" ", w)))
    })
}
