package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.sources.Tables

/** Correctness-gate queries for the corpus-assembly operators
  * (graft.analytics.Corpus): sequence packing, chunking, cleaning, quota
  * sampling. */
object CorpusQueries extends QueryModule {

  /** Fanned-out documents read (Tables.fanout), wired ONLY into the
    * queries where two independent full-bench runs showed a win — the
    * trained-tokenizer family (bpe_tokenize, chunk/pack/select in BPE
    * units), the hashed-gram models (classify_naive_bayes, dsir_weights)
    * and pii_redact. NOT used by perplexity_bucket (its plan re-scans
    * the table ~50x with tiny pushed subsets; a blanket fanout measured
    * 2.3 s -> 4.6 s there) nor the sub-second rows, where the extra
    * exchange + AQE stage costs more than the parallelism returns. */
  private def docsF(s: SparkSession, d: String): DataFrame =
    Tables.fanout(Tables.documents(s, d))

  /** Tokenization shared with the text oracles. */
  private val W = "string_split_regex(trim(text), '\\s+')"

  /** Gopher rule CTEs over a `corpus(id, text)` CTE — mirrors
    * Corpus.gopherQuality expression for expression. */
  private val gopherCtes =
    """g AS (
      |  SELECT id, string_split_regex(trim(text), '\s+') AS w,
      |    string_split(text, chr(10)) AS ls,
      |    length(text) - length(replace(text, '#', '')) AS nhash,
      |    (length(text) - length(replace(text, '...', ''))) / 3 +
      |      (length(text) - length(replace(text, '…', ''))) AS nell
      |  FROM corpus),
      |m AS (
      |  SELECT id, CAST(len(w) AS BIGINT) AS n_words,
      |    CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w) AS mean_len,
      |    CAST(nhash + nell AS DOUBLE) / len(w) AS sym_ratio,
      |    CAST(len(list_filter(ls, l -> starts_with(ltrim(l), '•')
      |      OR starts_with(ltrim(l), '- ') OR starts_with(ltrim(l), '* '))) AS DOUBLE)
      |      / len(ls) AS bullet_ratio,
      |    CAST(len(list_filter(ls, l -> ends_with(rtrim(l), '...')
      |      OR ends_with(rtrim(l), '…'))) AS DOUBLE) / len(ls) AS ell_ratio,
      |    CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
      |      / len(w) AS alpha_ratio,
      |    len(list_distinct(list_intersect(list_transform(w, x -> lower(x)),
      |      ['the','be','to','of','and','that','have','with']))) AS stop_hits
      |  FROM g)""".stripMargin

  private val gopherPassSql =
    """(n_words BETWEEN 50 AND 100000) AND mean_len >= 3.0 AND mean_len <= 10.0
      |    AND sym_ratio <= 0.1 AND bullet_ratio <= 0.9 AND ell_ratio <= 0.3
      |    AND alpha_ratio >= 0.8 AND stop_hits >= 2""".stripMargin

  private def packQ(s: SparkSession, d: String): DataFrame =
    Corpus.packSequences(Tables.documents(s, d), budget = 256, shardSize = 100)
      .groupBy(col("shard"), col("seq"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        min(col("id")).as("first_doc"))
      .orderBy(col("shard"), col("seq"))

  /** Unigram-LM tokenization under the FIXED oracle vocabulary: per-doc
    * token count plus the md5 of the full Viterbi token list — every
    * max-likelihood segmentation decision of every word pinned against
    * the oracle's recursive-CTE replay of the same recurrence. */
  private def unigramQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), Unigram.tokenize(col("text")).as("_t"))
      .select(col("doc_id"),
        size(col("_t")).cast("long").as("n_unigram"),
        md5(concat_ws(" ", col("_t"))).as("tok_md5"))
      .orderBy(col("doc_id"))

  /** First-fit-decreasing packing summary at the same geometry as
    * `pack_sequences` (budget 256, shard 100): every bin's membership is
    * pinned — the oracle replays the exact FFD loop (descending token
    * order, first open bin with room, id tie-break) per shard. */
  private def packFfdQ(s: SparkSession, d: String): DataFrame =
    Corpus.packFfd(Tables.documents(s, d), budget = 256, shardSize = 100)
      .groupBy(col("shard"), col("seq"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        min(col("id")).as("first_doc"))
      .orderBy(col("shard"), col("seq"))

  /** WordPiece tokenization under the FIXED oracle vocabulary: per-doc
    * token count, `[UNK]`-word count, and the md5 of the full
    * maximal-munch token list — every longest-match decision of every
    * word (including the whole-word-[UNK] collapses the vocabulary's
    * missing `##y` forces on `key`/`query`) pinned against the oracle's
    * recursive-CTE replay of the same greedy scan. */
  private def wordpieceQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), WordPiece.tokenize(col("text")).as("_t"))
      .select(col("doc_id"),
        size(col("_t")).cast("long").as("n_wordpiece"),
        size(filter(col("_t"), t => t === WordPiece.FixedModel.unkToken))
          .cast("long").as("n_unk"),
        md5(concat_ws(" ", col("_t"))).as("tok_md5"))
      .orderBy(col("doc_id"))

  /** Trained-BPE tokenization under the FIXED oracle merge table: per-doc
    * piece count, real token count, and the md5 of the full token list
    * (every token in every doc pinned, not just the count). */
  private def bpeQ(s: SparkSession, d: String): DataFrame = {
    // sentinel-stripped pieces (what tokenize operates on — Bpe's OWN
    // strip, so the two can never drift), and ONE tokenize fold feeding
    // both the count and the md5 — CollapseProject keeps the non-cheap
    // _t in its own projection, so the corpus is folded once, not twice
    val clean = Bpe.stripSep(col("text"))
    docsF(s, d)
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.bpePieces(clean)).as("n_pieces"),
        Bpe.tokenize(col("text")).as("_t"))
      .select(col("doc_id"), col("n_pieces"),
        size(col("_t")).cast("long").as("n_bpe_trained"),
        md5(concat_ws(Bpe.PieceSep, col("_t"))).as("tok_md5"))
      .orderBy(col("doc_id"))
  }

  /** [[packQ]] measured in trained-BPE tokens instead of whitespace
    * tokens — the budget unit a real pipeline packs by. */
  private def packBpeQ(s: SparkSession, d: String): DataFrame =
    Corpus.packSequences(docsF(s, d), budget = 256, shardSize = 100,
        tokenCounter = Bpe.tokenCount(_))
      .groupBy(col("shard"), col("seq"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        min(col("id")).as("first_doc"))
      .orderBy(col("shard"), col("seq"))

  /** Greedy trained-BPE chunking (budget 64 real tokens, piece
    * boundaries): every chunk's content md5-pinned. */
  private def chunkBpeQ(s: SparkSession, d: String): DataFrame =
    Bpe.chunkByTokens(docsF(s, d), chunkTokens = 64)
      .select(col("id"), col("chunk_id"), col("n_pieces"), col("n_tokens"),
        md5(col("chunk")).as("chunk_md5"))
      .orderBy(col("id"), col("chunk_id"))

  private def chunkQ(s: SparkSession, d: String): DataFrame =
    Corpus.chunkDocuments(Tables.documents(s, d), chunkSize = 120, stride = 90)
      .select(col("id"), col("chunk_id"), col("start"),
        length(col("chunk")).as("chunk_len"), md5(col("chunk")).as("chunk_md5"))
      .orderBy(col("id"), col("chunk_id"))

  /** Token-boundary chunking: 60-token windows every 40 tokens (20-token
    * overlap), hashed rather than carried as text. */
  private def chunkTokQ(s: SparkSession, d: String): DataFrame =
    Corpus.chunkByTokens(Tables.documents(s, d), chunkTokens = 60, strideTokens = 40)
      .select(col("id"), col("chunk_id").cast("long").as("chunk_id"),
        col("n_tokens").cast("int").as("n_tokens"),
        length(col("chunk")).as("chunk_len"), md5(col("chunk")).as("chunk_md5"))
      .orderBy(col("id"), col("chunk_id"))

  /** Corpus with planted URL/e-mail/whitespace noise on docs 0..49. */
  private def noisy(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select(col("doc_id").as("id"), col("text"))
    base.unionAll(
      base.where(col("id") < 50).select((col("id") + 100000).as("id"),
        concat(lit("See https://ex.com/a?x=1&y=2 or mail bob.smith+spam@ex-mail.io\t "),
          col("text"), lit("  the   end \t")).as("text")))
  }

  /** PII injection shared verbatim by Spark and the DuckDB oracle: the
    * corpus has no digits or '@' at all, so PII-shaped spans are planted
    * deterministically from doc_id (every range guarantees its digit
    * width — no lpad needed) on even ids; odd ids stay clean. */
  private val piiInjectSql = """CASE WHEN doc_id % 2 = 0 THEN
    text || ' Reach user' || CAST(doc_id AS STRING) || '@example.com, ip 10.' ||
    CAST(doc_id % 200 AS STRING) || '.' || CAST((doc_id * 7) % 250 AS STRING) || '.' ||
    CAST((doc_id * 13) % 250 AS STRING) || ', ssn ' ||
    CAST((doc_id * 31) % 900 + 100 AS STRING) || '-' ||
    CAST(doc_id % 90 + 10 AS STRING) || '-' ||
    CAST((doc_id * 17) % 9000 + 1000 AS STRING) ||
    ', card 4111-1111-1111-' || CAST(doc_id % 9000 + 1000 AS STRING) ||
    ', tel (' || CAST((doc_id * 3) % 800 + 200 AS STRING) || ') ' ||
    CAST(doc_id % 800 + 100 AS STRING) || '-' ||
    CAST((doc_id * 11) % 9000 + 1000 AS STRING)
    ELSE text END"""

  private def piiQ(s: SparkSession, d: String): DataFrame = {
    val injected = docsF(s, d)
      .select(col("doc_id"), expr(piiInjectSql).as("text"))
    Pii.redact(injected)
      .select(col("doc_id"),
        col("n_email").cast("long").as("n_email"),
        col("n_card").cast("long").as("n_card"),
        col("n_ssn").cast("long").as("n_ssn"),
        col("n_phone").cast("long").as("n_phone"),
        col("n_ip").cast("long").as("n_ip"),
        length(col("text")).cast("long").as("red_len"),
        md5(col("text")).as("red_md5"))
      .orderBy(col("doc_id"))
  }

  /** Shared by Spark and the oracle: the corpus has no newlines, so turn
    * every 12th space into one (regex groups of 12 words; RE2 and Java
    * regex scan-after-match identically), giving line structure with a
    * measured ~4% cross-document duplicate-line rate at sf0.01. */
  private val lineInjectRe = """((?:\S+ ){11}\S+) """

  private def lineDedupQ(s: SparkSession, d: String): DataFrame = {
    val withLines = Tables.documents(s, d).select(col("doc_id"),
      regexp_replace(col("text"), lineInjectRe, "$1\n").as("text"))
    Dedup.lineDedup(withLines)
      .select(col("id").as("doc_id"),
        col("n_lines").cast("long").as("n_lines"),
        col("n_kept").cast("long").as("n_kept"),
        md5(col("text")).as("dedup_md5"))
      .orderBy(col("doc_id"))
  }

  private def cleanQ(s: SparkSession, d: String): DataFrame =
    noisy(s, d).select(
        col("id"),
        size(regexp_extract_all(col("text"), lit(Corpus.UrlPattern), lit(0))).as("n_urls"),
        size(regexp_extract_all(col("text"), lit(Corpus.EmailPattern), lit(0))).as("n_emails"),
        Corpus.cleanText(col("text")).as("cleaned"))
      .select(col("id"), col("n_urls"), col("n_emails"),
        length(col("cleaned")).as("clean_len"), md5(col("cleaned")).as("clean_md5"))
      .orderBy(col("id"))

  private def tfidfQ(s: SparkSession, d: String): DataFrame = {
    val sub = Tables.documents(s, d).where(col("doc_id") < 100)
    Corpus.tfIdfKeywords(sub, k = 3, n = sub.count())
      .orderBy(col("id"), col("rank"))
  }

  /** Repetition: corpus with planted self-repeated docs (text ' ' text)
    * for ids 0..49 — those must show dup_ratio > 0.4. */
  private def repetitionQ(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select(col("doc_id").as("id"), col("text"))
    val corpus = base.unionAll(
      base.where(col("id") < 50).select((col("id") + 100000).as("id"),
        concat(col("text"), lit(" "), col("text")).as("text")))
    Corpus.repetitionStats(corpus, n = 3, idCol = "id")
      .select(col("id"), col("n_grams"),
        round(col("dup_ratio"), 6).as("dup_ratio"),
        round(col("top_gram_share"), 6).as("top_gram_share"))
      .orderBy(col("id"))
  }

  /** Decontamination: training corpus = documents + near-copies of docs
    * 0..99 (planted leakage); eval set = docs 0..19. Expect the eval docs
    * themselves and their near-copies flagged. */
  private def decontamQ(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select(col("doc_id").as("id"), col("text"))
    val corpus = base.unionAll(
      base.where(col("id") < 100).select((col("id") + 100000).as("id"),
        concat(col("text"), lit(" zzz9")).as("text")))
    val eval = base.where(col("id") < 20)
    Corpus.decontaminate(corpus, eval, threshold = 0.8, idCol = "id")
      .select(col("id"), round(col("containment"), 6).as("containment"))
      .orderBy(col("id"))
  }

  private def mixQ(s: SparkSession, d: String): DataFrame =
    Corpus.mixSources(Tables.documents(s, d),
        rates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.3), defaultRate = 0.1)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source"))

  private def budgetQ(s: SparkSession, d: String): DataFrame =
    Corpus.selectToTokenBudget(Tables.documents(s, d), budget = 8000)
      .select(col("id"), round(col("quality"), 6).as("quality"), col("n_tokens"))
      .orderBy(col("id"))

  /** [[budgetQ]] budgeted in TRAINED-BPE tokens (r13): the same
    * two-level bucket selection, its unit switched through the
    * tokenCounter seam — selection set and n_tokens both move. */
  private def budgetBpeQ(s: SparkSession, d: String): DataFrame =
    Corpus.selectToTokenBudget(docsF(s, d), budget = 8000,
        tokenCounter = Bpe.tokenCount(_))
      .select(col("id"), round(col("quality"), 6).as("quality"), col("n_tokens"))
      .orderBy(col("id"))

  private def quotaQ(s: SparkSession, d: String): DataFrame =
    Corpus.quotaSample(Tables.documents(s, d), perSourceCap = 20)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.functions.TextFunctions.tokenCount(col("text")).cast("long")).as("n_tokens"),
        min(col("quality")).as("min_quality"))
      .orderBy(col("source"))

  /** Deterministic split assignment, verified as per-split aggregates
    * (the GROUP BY proves every doc got exactly one split AND that the
    * proportions land where the cut points say). */
  private def splitQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("split", Corpus.hashSplit(Tables.documents(s, d)))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("split"))

  private def vocabQ(s: SparkSession, d: String): DataFrame =
    Corpus.vocabulary(Tables.documents(s, d))
      .orderBy(col("n").desc, col("word")).limit(100)

  private def rarityQ(s: SparkSession, d: String): DataFrame =
    Corpus.rarityScores(Tables.documents(s, d))
      .select(col("id").as("doc_id"), col("n_tokens"), col("rank_sum"),
        col("mean_rank"))
      .orderBy(col("doc_id"))

  /** Exact heavy hitters (MG candidates + exact verify); threshold 100
    * keeps the output stable and non-trivial at every SF. */
  private def heavyHittersQ(s: SparkSession, d: String): DataFrame =
    Corpus.heavyHitters(Tables.documents(s, d), minCount = 100L)
      .orderBy(col("word"))

  /** Gopher rule audit over a corpus with planted violations: bullet-led
    * copies (ids +100000), ellipsis-terminated copies (+200000),
    * symbol-stuffed copies (+300000), 10-token truncations (+400000) —
    * each family must trip exactly its rule. */
  private def gopherQ(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select(col("doc_id").as("id"), col("text"))
    val corpus = base
      .unionAll(base.where(col("id") < 30)
        .select((col("id") + 100000).as("id"),
          concat(lit("• "), col("text")).as("text")))
      .unionAll(base.where(col("id") >= 30 && col("id") < 60)
        .select((col("id") + 200000).as("id"),
          concat(col("text"), lit(" word...")).as("text")))
      .unionAll(base.where(col("id") >= 60 && col("id") < 90)
        .select((col("id") + 300000).as("id"),
          concat(col("text"), lit(" #" * 20)).as("text")))
      .unionAll(base.where(col("id") >= 90 && col("id") < 110)
        .select((col("id") + 400000).as("id"),
          array_join(slice(graft.functions.TextFunctions.tokens(col("text")), 1, 10),
            " ").as("text")))
    Corpus.gopherQuality(corpus, idCol = "id").orderBy(col("id"))
  }

  /** Per-source corpus profile: the triage dashboard a pipeline runs
    * before mixing decisions — doc/token volumes, token-count percentiles
    * (packing / curriculum inputs), and the Gopher pass rate. Integer
    * aggregates and interpolated percentiles of integers only — no
    * order-sensitive float accumulation, so both engines agree exactly.
    * Zero shuffles before the per-source rollup: the rule columns ride
    * the scan via gopherQuality's passthrough. */
  private def summaryQ(s: SparkSession, d: String): DataFrame =
    Corpus.gopherQuality(
        Tables.documents(s, d).withColumn("n_toks",
          graft.functions.TextFunctions.tokenCount(col("text")).cast("long")),
        keep = Seq("source", "n_toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        round(expr("percentile(n_toks, 0.5)"), 6).as("p50_tokens"),
        round(expr("percentile(n_toks, 0.9)"), 6).as("p90_tokens"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"))
      .withColumn("pass_rate",
        round(col("n_pass").cast("double") / col("n_docs"), 6))
      .orderBy(col("source"))

  /** Snapshot diff with planted churn: new snapshot drops ids < 50,
    * rewrites 50..99, adds copies at +500000 — exactly those rows (and
    * only those) must surface with their statuses. */
  private def diffQ(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val next = base.where(col("doc_id") >= 50)
      .select(col("doc_id"),
        when(col("doc_id") < 100, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      .unionAll(base.where(col("doc_id") < 50)
        .select((col("doc_id") + 500000).as("doc_id"), col("text")))
    Corpus.snapshotDiff(base, next)
      .where(col("status") =!= "same")
      .select(col("id"), col("status"))
      .orderBy(col("id"))
  }

  /** Temperature rebalancing at alpha = 0.5 (the IEEE-exact sqrt path),
    * verified as per-source counts: larger sources must shrink by
    * sqrt(n_min/n_i), the smallest keeps everything. */
  private def temperatureQ(s: SparkSession, d: String): DataFrame =
    Corpus.temperatureSample(Tables.documents(s, d), alpha = 0.5)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source"))

  /** CCNet perplexity filter: bigram LM trained on docs 0..299 (the
    * "clean reference sample"), every doc scored and tercile-bucketed. */
  private def perplexityQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Corpus.perplexityScore(docs, docs.where(col("doc_id") < 300))
      .orderBy(col("id"))
  }

  /** DSIR importance weights: target = docs 0..199 (the proxy domain),
    * raw = the whole corpus; top quartile flagged selected. NOTE the
    * selection contract is VALUE-based (log_weight strictly above the
    * exact p75 cutoff), not rank-based: on heavily tied corpora fewer
    * than a quarter of docs select (zero when all weights tie) — a
    * consumer needing a guaranteed quartile-sized sample must rank
    * instead. */
  private def dsirQ(s: SparkSession, d: String): DataFrame = {
    val docs = docsF(s, d)
    Corpus.importanceWeights(docs, docs.where(col("doc_id") < 200))
      .orderBy(col("id"))
  }

  /** Trained-classifier language ID (the fastText-style model-based
    * filter slot): multinomial NB over hashed uni+bigram features,
    * trained on the 80% split (doc_id % 5 != 0), scored over the whole
    * corpus with the train flag carried for accuracy accounting. */
  private def nbQ(s: SparkSession, d: String): DataFrame = {
    val docs = docsF(s, d)
    // shared-exchange form (r12): grams hash ONCE into a persisted
    // feature column feeding BOTH the train aggregation and the scoring
    // scan — value-identical to train-then-classify, measured faster at
    // sf0.1 (BASELINE.md)
    Corpus.naiveBayesTrainClassify(docs, "lang", col("doc_id") % 5 =!= 0,
        "text", buckets = 4096)
      .select(col("doc_id"), col("pred_label").as("pred_lang"),
        col("log_score"),
        (col("pred_label") === col("lang")).as("correct"),
        (col("doc_id") % 5 =!= 0).as("is_train"))
      .orderBy(col("doc_id"))
  }

  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "classify_naive_bayes" -> (nbQ _),
    "perplexity_bucket" -> (perplexityQ _),
    "dsir_weights" -> (dsirQ _),
    "split_assign" -> (splitQ _),
    "vocab_topk" -> (vocabQ _),
    "vocab_heavy_hitters" -> (heavyHittersQ _),
    "text_rarity" -> (rarityQ _),
    "pack_sequences" -> (packQ _),
    "pack_sequences_ffd" -> (packFfdQ _),
    "bpe_tokenize" -> (bpeQ _),
    "unigram_tokenize" -> (unigramQ _),
    "wordpiece_tokenize" -> (wordpieceQ _),
    "pack_sequences_bpe" -> (packBpeQ _),
    "chunk_by_tokens_bpe" -> (chunkBpeQ _),
    "chunk_documents" -> (chunkQ _),
    "chunk_by_tokens" -> (chunkTokQ _),
    "text_clean" -> (cleanQ _),
    "pii_redact" -> (piiQ _),
    "dedup_lines" -> (lineDedupQ _),
    "quota_sample" -> (quotaQ _),
    "tfidf_keywords" -> (tfidfQ _),
    "decontaminate" -> (decontamQ _),
    "text_repetition" -> (repetitionQ _),
    "select_token_budget" -> (budgetQ _),
    "select_token_budget_bpe" -> (budgetBpeQ _),
    "mix_sources" -> (mixQ _),
    "quality_gopher" -> (gopherQ _),
    "sample_temperature" -> (temperatureQ _),
    "corpus_summary" -> (summaryQ _),
    "corpus_diff" -> (diffQ _)
  )

  def oracles: Seq[(String, String)] = Seq(
    // mirrors Corpus.naiveBayesTrain/Classify expression for expression:
    // hashed uni+bigram buckets via the portable hash60 (md5 hex prefix),
    // per-class add-1 smoothing over 4096 buckets, per-class scores
    // rounded to 6 dp BEFORE the argmax, ties toward the smaller label
    "classify_naive_bayes" ->
      """WITH dt AS (SELECT doc_id AS id, lang,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                x -> x <> '') AS ws FROM documents),
        |sc AS (SELECT * FROM dt WHERE len(ws) > 0),
        |toks AS (SELECT id, generate_subscripts(ws, 1) AS i, unnest(ws) AS tok FROM sc),
        |bis AS (SELECT a.id, a.tok || chr(1) || b.tok AS g
        |        FROM toks a JOIN toks b ON a.id = b.id AND b.i = a.i + 1),
        |feats AS (
        |  SELECT id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 4096 AS b FROM toks
        |  UNION ALL
        |  SELECT id, CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) % 4096 FROM bis),
        |cls AS (SELECT lang AS l, CAST(count(*) AS DOUBLE) AS nd
        |        FROM sc WHERE id % 5 <> 0 GROUP BY 1),
        |tot AS (SELECT sum(nd) AS n FROM cls),
        |cnt AS (SELECT sc.lang AS l, f.b, CAST(count(*) AS DOUBLE) AS c
        |        FROM feats f JOIN sc ON sc.id = f.id
        |        WHERE f.id % 5 <> 0 GROUP BY 1, 2),
        |ct AS (SELECT l, sum(c) AS t FROM cnt GROUP BY 1),
        |scored AS (
        |  SELECT f.id, cls.l,
        |    round(ln(cls.nd / tot.n) +
        |      sum(ln((coalesce(cnt.c, 0.0) + 1.0) / (ct.t + 4096.0))), 6) AS s
        |  FROM feats f
        |  CROSS JOIN cls
        |  JOIN ct ON ct.l = cls.l
        |  LEFT JOIN cnt ON cnt.l = cls.l AND cnt.b = f.b
        |  CROSS JOIN tot
        |  GROUP BY f.id, cls.l, cls.nd, ct.t, tot.n),
        |best AS (SELECT id, l, s,
        |    row_number() OVER (PARTITION BY id ORDER BY s DESC, l) AS rn FROM scored)
        |SELECT b.id AS doc_id, b.l AS pred_lang, b.s AS log_score,
        |  (b.l = d.lang) AS correct, (b.id % 5 <> 0) AS is_train
        |FROM best b JOIN documents d ON d.doc_id = b.id
        |WHERE rn = 1 ORDER BY b.id""".stripMargin,
    // mirrors Corpus.importanceWeights: hashed uni+bigram buckets via the
    // portable hash60 (md5 hex prefix), add-1 smoothing over 4096 buckets
    "dsir_weights" ->
      """WITH dt AS (SELECT doc_id AS id,
        |              list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                          x -> x <> '') AS ws FROM documents),
        |toks AS (SELECT id, generate_subscripts(ws, 1) AS i, unnest(ws) AS tok FROM dt),
        |bis AS (SELECT a.id, a.tok || chr(1) || b.tok AS g
        |        FROM toks a JOIN toks b ON a.id = b.id AND b.i = a.i + 1),
        |feats AS (
        |  SELECT id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 4096 AS b FROM toks
        |  UNION ALL
        |  SELECT id, CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) % 4096 FROM bis),
        |tc AS (SELECT b, CAST(count(*) AS DOUBLE) AS c FROM feats WHERE id < 200 GROUP BY 1),
        |rc AS (SELECT b, CAST(count(*) AS DOUBLE) AS c FROM feats GROUP BY 1),
        |m AS (SELECT (SELECT sum(c) FROM tc) AS nt, (SELECT sum(c) FROM rc) AS nr),
        |scored AS (
        |  SELECT f.id,
        |    ln((coalesce(tc.c, 0.0) + 1.0) / (m.nt + 4096.0)) -
        |    ln((coalesce(rc.c, 0.0) + 1.0) / (m.nr + 4096.0)) AS s
        |  FROM feats f LEFT JOIN tc ON tc.b = f.b LEFT JOIN rc ON rc.b = f.b
        |  CROSS JOIN m),
        |lw AS (SELECT id, CAST(count(*) AS INT) AS n_features,
        |              round(sum(s), 6) AS log_weight
        |       FROM scored GROUP BY 1),
        |cut AS (SELECT round(quantile_cont(log_weight, 0.75), 6) AS c75 FROM lw)
        |SELECT id, n_features, log_weight,
        |  log_weight > cut.c75 AS selected
        |FROM lw, cut ORDER BY id""".stripMargin,
    // mirrors Corpus.perplexityScore expression for expression: top-2000
    // vocab (count DESC, word), UNK = chr(2)||'unk', p = 0.9·p_bi +
    // (1−0.9)·add-1-smoothed p_uni, log_ppl = sum(−ln p)/n_bigrams
    "perplexity_bucket" ->
      """WITH tr AS (SELECT doc_id AS id, text FROM documents WHERE doc_id < 300),
        |trt AS (SELECT id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                               x -> x <> '') AS ws FROM tr),
        |trtok AS (SELECT id, generate_subscripts(ws, 1) AS i, unnest(ws) AS tok FROM trt),
        |vocab AS (SELECT tok AS w FROM trtok GROUP BY 1
        |          ORDER BY count(*) DESC, tok LIMIT 2000),
        |tru AS (SELECT t.id, t.i,
        |          CASE WHEN v.w IS NOT NULL THEN t.tok ELSE chr(2) || 'unk' END AS w
        |        FROM trtok t LEFT JOIN vocab v ON v.w = t.tok),
        |uni AS (SELECT w, CAST(count(*) AS DOUBLE) AS cu FROM tru GROUP BY 1),
        |bi AS (SELECT a.w AS v, b.w AS w2, CAST(count(*) AS DOUBLE) AS cb
        |       FROM tru a JOIN tru b ON a.id = b.id AND b.i = a.i + 1 GROUP BY 1, 2),
        |pfx AS (SELECT v, sum(cb) AS cp FROM bi GROUP BY 1),
        |m AS (SELECT (SELECT sum(cu) FROM uni) AS n,
        |             (SELECT CAST(count(*) AS DOUBLE) FROM uni) AS vs),
        |dt AS (SELECT doc_id AS id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                                        x -> x <> '') AS ws FROM documents),
        |dtok AS (SELECT id, generate_subscripts(ws, 1) AS i, unnest(ws) AS tok FROM dt),
        |du AS (SELECT t.id, t.i,
        |         CASE WHEN v.w IS NOT NULL THEN t.tok ELSE chr(2) || 'unk' END AS w
        |       FROM dtok t LEFT JOIN vocab v ON v.w = t.tok),
        |pairs AS (SELECT a.id, a.w AS v, b.w AS w2
        |          FROM du a JOIN du b ON a.id = b.id AND b.i = a.i + 1),
        |scored AS (
        |  SELECT p.id,
        |    0.9 * (CASE WHEN pfx.cp IS NOT NULL
        |                THEN coalesce(bi.cb, 0.0) / pfx.cp ELSE 0.0 END) +
        |    (1.0 - 0.9) * ((coalesce(uni.cu, 0.0) + 1.0) / (m.n + 1.0 * (m.vs + 1.0))) AS p
        |  FROM pairs p
        |  LEFT JOIN bi ON bi.v = p.v AND bi.w2 = p.w2
        |  LEFT JOIN pfx ON pfx.v = p.v
        |  LEFT JOIN uni ON uni.w = p.w2
        |  CROSS JOIN m),
        |lp AS (
        |  SELECT id, CAST(count(*) + 1 AS INT) AS n_tokens,
        |         round(sum(-ln(p)) / count(*), 6) AS log_ppl
        |  FROM scored GROUP BY 1),
        |cuts AS (SELECT round(quantile_cont(log_ppl, CAST(1 AS DOUBLE)/3), 6) AS c1,
        |                round(quantile_cont(log_ppl, CAST(2 AS DOUBLE)/3), 6) AS c2 FROM lp)
        |SELECT id, n_tokens, log_ppl,
        |  CASE WHEN log_ppl <= cuts.c1 THEN 'head'
        |       WHEN log_ppl <= cuts.c2 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM lp, cuts ORDER BY id""".stripMargin,
    "text_rarity" ->
      """WITH toks AS (
        |  SELECT doc_id AS id,
        |         unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
        |  FROM documents),
        |t AS (SELECT id, word FROM toks WHERE word <> ''),
        |vocab AS (SELECT word, count(*) AS n FROM t GROUP BY 1),
        |ranked AS (
        |  SELECT word, dense_rank() OVER (ORDER BY n DESC, word) AS rank
        |  FROM vocab)
        |SELECT t.id AS doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(sum(r.rank) AS BIGINT) AS rank_sum,
        |       round(CAST(sum(r.rank) AS DOUBLE) / count(*), 6) AS mean_rank
        |FROM t JOIN ranked r ON r.word = t.word
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "split_assign" ->
      """WITH assigned AS (
        |  SELECT doc_id, n_chars,
        |    CASE WHEN b < 205 THEN 'train' WHEN b < 230 THEN 'valid'
        |         ELSE 'test' END AS split
        |  FROM (SELECT doc_id, n_chars,
        |          CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2)) AS INT) AS b
        |        FROM documents))
        |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       min(doc_id) AS first_doc
        |FROM assigned GROUP BY 1 ORDER BY 1""".stripMargin,
    "vocab_topk" ->
      """SELECT word, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
        |      FROM documents)
        |WHERE word <> ''
        |GROUP BY 1 ORDER BY n DESC, word LIMIT 100""".stripMargin,
    "vocab_heavy_hitters" ->
      """SELECT word, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
        |      FROM documents)
        |WHERE word <> ''
        |GROUP BY 1 HAVING count(*) >= 100 ORDER BY word""".stripMargin,
    "pack_sequences" ->
      s"""WITH d AS (
        |  SELECT doc_id AS id, CAST(len($W) AS BIGINT) AS n_tokens,
        |         doc_id // 100 AS shard
        |  FROM documents),
        |c AS (
        |  SELECT id, shard, n_tokens,
        |    coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
        |  FROM d)
        |SELECT shard, CAST(start // 256 AS BIGINT) AS seq, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens, min(id) AS first_doc
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // first-fit-decreasing replayed as ONE recursive CTE per shard: docs
    // in (tokens DESC, id) order; `fit` = smallest open-bin index with
    // room (NULL opens bin len(rem), 0-based); bins update in place
    "pack_sequences_ffd" ->
      s"""WITH RECURSIVE
        |d AS (
        |  SELECT doc_id AS id, CAST(len($W) AS BIGINT) AS n_tokens,
        |         doc_id // 100 AS shard
        |  FROM documents),
        |s AS (
        |  SELECT shard, list({'id': id, 'n': n_tokens}
        |           ORDER BY n_tokens DESC, id) AS ds
        |  FROM d GROUP BY shard),
        |rec AS (
        |  SELECT shard, ds, 1 AS i, CAST([] AS BIGINT[]) AS rem,
        |         CAST([] AS STRUCT(id BIGINT, seq BIGINT, n BIGINT)[]) AS asg
        |  FROM s
        |  UNION ALL
        |  SELECT shard, ds, i + 1,
        |    CASE WHEN fit IS NULL THEN list_append(rem, 256 - ds[i].n)
        |         ELSE list_transform(range(1, len(rem) + 1),
        |                j -> CASE WHEN j = fit THEN rem[j] - ds[i].n ELSE rem[j] END)
        |    END,
        |    list_append(asg, {'id': ds[i].id,
        |                      'seq': coalesce(fit, len(rem) + 1) - 1,
        |                      'n': ds[i].n})
        |  FROM (
        |    SELECT shard, ds, i, rem, asg,
        |      list_min(list_filter(range(1, len(rem) + 1),
        |        j -> rem[j] >= ds[i].n)) AS fit
        |    FROM rec WHERE i <= len(ds))),
        |a AS (
        |  SELECT shard, unnest(asg, recursive := true)
        |  FROM rec WHERE i > len(ds))
        |SELECT shard, CAST(seq AS BIGINT) AS seq, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS n_tokens, min(id) AS first_doc
        |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the trained-BPE fold replayed as literal nested replaces generated
    // from the SAME FixedMerges list the Spark side applies (one source
    // of truth, Bpe.foldSql) — every token of every doc pinned via the
    // chr(2)-joined md5
    "bpe_tokenize" ->
      s"""WITH p AS (
        |  SELECT doc_id,
        |    regexp_extract_all(replace(replace(text, chr(1), ''), chr(2), ''),
        |      '${graft.functions.TextFunctions.BpePattern}') AS pieces
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, pieces,
        |    flatten(list_transform(pieces, q -> ${Bpe.pieceTokensSql("q")})) AS toks
        |  FROM p)
        |SELECT doc_id, CAST(len(pieces) AS INT) AS n_pieces,
        |  CAST(coalesce(len(toks), 0) AS BIGINT) AS n_bpe_trained,
        |  md5(array_to_string(toks, chr(2))) AS tok_md5
        |FROM t ORDER BY doc_id""".stripMargin,
    // the unigram Viterbi replayed as TWO recursive CTEs — the forward
    // DP (dp/bp lists carried per word, candidates k=1..min(pos,maxLen)
    // scored dp[pos-k] + lp(piece), smallest k on ties) and the
    // backtrace — against the SAME FixedVocab literal map (one source of
    // truth, Unigram.vocabMapSql) and the same derived UNK penalty
    "unigram_tokenize" ->
      s"""WITH RECURSIVE
        |words AS (
        |  SELECT id, wpos, w FROM (
        |    SELECT id, generate_subscripts(ws, 1) AS wpos, unnest(ws) AS w
        |    FROM (SELECT doc_id AS id, $W AS ws FROM documents))
        |  WHERE len(w) > 0),
        |vit AS (
        |  SELECT id, wpos, w, 0 AS i, [CAST(0.0 AS DOUBLE)] AS dp, [0] AS bp
        |  FROM words
        |  UNION ALL
        |  SELECT id, wpos, w, i + 1,
        |    list_append(dp, list_max(list_transform(cands, c -> c.s))),
        |    list_append(bp, list_min(list_transform(
        |      list_filter(cands, c -> c.s = list_max(list_transform(cands, x -> x.s))),
        |      c -> c.k)))
        |  FROM (
        |    SELECT id, wpos, w, i, dp, bp,
        |      list_filter(
        |        list_transform(range(1, least(i + 1, ${Unigram.FixedModel.maxPieceLen}) + 1), k -> {
        |          's': dp[i + 2 - k] + coalesce(
        |                 map_extract(${Unigram.vocabMapSql}, substr(w, i + 2 - k, CAST(k AS INT)))[1],
        |                 CASE WHEN k = 1 THEN CAST(${Unigram.FixedModel.unkScore} AS DOUBLE) END),
        |          'k': k})::STRUCT(s DOUBLE, k BIGINT)[],
        |        c -> c.s IS NOT NULL) AS cands
        |    FROM vit WHERE i < len(w))),
        |bt AS (
        |  SELECT id, wpos, w, len(w) AS pos, bp, CAST([] AS VARCHAR[]) AS toks
        |  FROM vit WHERE i = len(w)
        |  UNION ALL
        |  SELECT id, wpos, w, pos - CAST(bp[pos + 1] AS INT), bp,
        |    list_prepend(substr(w, pos - CAST(bp[pos + 1] AS INT) + 1,
        |      CAST(bp[pos + 1] AS INT)), toks)
        |  FROM bt WHERE pos > 0),
        |toks AS (
        |  SELECT id, wpos, generate_subscripts(toks, 1) AS tpos, unnest(toks) AS tok
        |  FROM bt WHERE pos = 0),
        |agg AS (
        |  SELECT id, CAST(count(*) AS BIGINT) AS n,
        |         md5(string_agg(tok, ' ' ORDER BY wpos, tpos)) AS m
        |  FROM toks GROUP BY 1)
        |-- every doc row survives (zero-word docs tokenize to []; a NULL
        |-- text stays NULL through size() but md5's concat_ws skips it)
        |SELECT d.doc_id,
        |  CASE WHEN d.text IS NULL THEN NULL
        |       ELSE coalesce(a.n, 0) END AS n_unigram,
        |  coalesce(a.m, md5('')) AS tok_md5
        |FROM documents d LEFT JOIN agg a ON a.id = d.doc_id ORDER BY 1""".stripMargin,
    // the WordPiece maximal munch replayed as ONE recursive CTE: at each
    // position the surviving candidate spans are k = 1..min(remaining,
    // maxPieceLen) whose piece (##-prefixed when non-initial) is in the
    // SAME FixedVocab literal map (one source of truth,
    // WordPiece.vocabMapSql); list_max picks the longest = the greedy
    // choice; an empty candidate list collapses the WHOLE word to [UNK]
    "wordpiece_tokenize" ->
      s"""WITH RECURSIVE
        |words AS (
        |  SELECT id, wpos, w FROM (
        |    SELECT id, generate_subscripts(ws, 1) AS wpos, unnest(ws) AS w
        |    FROM (SELECT doc_id AS id, $W AS ws FROM documents))
        |  WHERE len(w) > 0),
        |seg AS (
        |  SELECT id, wpos, w, CAST(0 AS BIGINT) AS pos, CAST([] AS VARCHAR[]) AS toks
        |  FROM words
        |  UNION ALL
        |  SELECT id, wpos, w,
        |    CASE WHEN best IS NULL THEN len(w) ELSE pos + best END AS pos,
        |    CASE WHEN best IS NULL THEN ['${WordPiece.FixedModel.unkToken}']
        |         WHEN pos = 0 THEN list_append(toks, substr(w, 1, CAST(best AS INT)))
        |         ELSE list_append(toks,
        |           '${WordPiece.ContPrefix}' || substr(w, CAST(pos + 1 AS INT), CAST(best AS INT)))
        |    END AS toks
        |  FROM (
        |    SELECT id, wpos, w, pos, toks,
        |      list_max(list_filter(
        |        range(1, least(len(w) - pos, ${WordPiece.FixedModel.maxPieceLen}) + 1),
        |        k -> len(map_extract(${WordPiece.vocabMapSql},
        |          CASE WHEN pos = 0 THEN substr(w, 1, CAST(k AS INT))
        |               ELSE '${WordPiece.ContPrefix}' || substr(w, CAST(pos + 1 AS INT), CAST(k AS INT))
        |          END)) > 0)) AS best
        |    FROM seg WHERE pos < len(w))),
        |toks AS (
        |  SELECT id, wpos, generate_subscripts(toks, 1) AS tpos, unnest(toks) AS tok
        |  FROM seg WHERE pos = len(w)),
        |agg AS (
        |  SELECT id, CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(*) FILTER (WHERE tok = '${WordPiece.FixedModel.unkToken}') AS BIGINT) AS u,
        |       md5(string_agg(tok, ' ' ORDER BY wpos, tpos)) AS m
        |  FROM toks GROUP BY 1)
        |-- every doc row survives (zero-word docs tokenize to []; a NULL
        |-- text stays NULL through size() but md5's concat_ws skips it)
        |SELECT d.doc_id,
        |  CASE WHEN d.text IS NULL THEN NULL ELSE coalesce(a.n, 0) END AS n_wordpiece,
        |  CASE WHEN d.text IS NULL THEN NULL ELSE coalesce(a.u, 0) END AS n_unk,
        |  coalesce(a.m, md5('')) AS tok_md5
        |FROM documents d LEFT JOIN agg a ON a.id = d.doc_id ORDER BY 1""".stripMargin,
    "pack_sequences_bpe" ->
      s"""WITH d AS (
        |  SELECT doc_id AS id, ${Bpe.tokenCountSql("text")} AS n_tokens,
        |         doc_id // 100 AS shard
        |  FROM documents),
        |c AS (
        |  SELECT id, shard, n_tokens,
        |    coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
        |  FROM d)
        |SELECT shard, CAST(start // 256 AS BIGINT) AS seq, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens, min(id) AS first_doc
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // greedy trained-BPE chunking replayed as a RECURSIVE CTE: the
    // per-doc sequential fold (chunk breaks where the running trained-
    // token total would pass the budget) steps piece-by-piece across all
    // docs in lockstep; per-piece weights re-apply the same FixedMerges
    // fold as bpe_tokenize. Piece 1 always opens chunk 0 (an oversized
    // first piece occupies it whole), matching the Spark fold's
    // non-empty-chunk close condition.
    "chunk_by_tokens_bpe" ->
      s"""WITH RECURSIVE d AS (
        |  SELECT doc_id AS id,
        |    regexp_extract_all(replace(replace(text, chr(1), ''), chr(2), ''),
        |      '${graft.functions.TextFunctions.BpePattern}') AS pieces
        |  FROM documents),
        |w AS (
        |  SELECT id, i, pieces[CAST(i AS INT)] AS piece,
        |    CAST(len(${Bpe.pieceTokensSql("pieces[CAST(i AS INT)]")}) AS BIGINT) AS w
        |  FROM (SELECT id, pieces, unnest(range(1, len(pieces) + 1)) AS i FROM d)),
        |r AS (
        |  SELECT id, i, piece, w, CAST(0 AS BIGINT) AS chunk_id, w AS cum
        |  FROM w WHERE i = 1
        |  UNION ALL
        |  SELECT w.id, w.i, w.piece, w.w,
        |    CASE WHEN r.cum + w.w > 64 THEN r.chunk_id + 1 ELSE r.chunk_id END,
        |    CASE WHEN r.cum + w.w > 64 THEN w.w ELSE r.cum + w.w END
        |  FROM r JOIN w ON w.id = r.id AND w.i = r.i + 1),
        |chunks AS (
        |  SELECT id, CAST(chunk_id AS INT) AS chunk_id,
        |    CAST(count(*) AS INT) AS n_pieces, CAST(sum(w) AS BIGINT) AS n_tokens,
        |    md5(string_agg(piece, '' ORDER BY i)) AS chunk_md5
        |  FROM r GROUP BY 1, 2
        |  UNION ALL
        |  SELECT id, 0, 0, 0, md5('') FROM d WHERE len(pieces) = 0)
        |SELECT id, chunk_id, n_pieces, n_tokens, chunk_md5
        |FROM chunks ORDER BY id, chunk_id""".stripMargin,
    "chunk_documents" ->
      """WITH starts AS (
        |  SELECT doc_id AS id, text,
        |    unnest(range(0, greatest(length(text), 1), 90)) AS start
        |  FROM documents)
        |SELECT id, CAST(start // 90 AS BIGINT) AS chunk_id, CAST(start AS BIGINT) AS start,
        |  CAST(length(substr(text, CAST(start AS INT) + 1, 120)) AS INT) AS chunk_len,
        |  md5(substr(text, CAST(start AS INT) + 1, 120)) AS chunk_md5
        |FROM starts ORDER BY id, chunk_id""".stripMargin,
    "chunk_by_tokens" ->
      s"""WITH p AS (
        |  SELECT doc_id AS id,
        |    regexp_extract_all(text, '${graft.functions.TextFunctions.BpePattern}') AS pieces
        |  FROM documents),
        |s AS (
        |  SELECT id, pieces,
        |    unnest(range(0, greatest(len(pieces) - 1, 0) + 1, 40)) AS start
        |  FROM p)
        |SELECT id, CAST(start // 40 AS BIGINT) AS chunk_id,
        |  CAST(least(len(pieces) - start, 60) AS INT) AS n_tokens,
        |  CAST(length(array_to_string(pieces[CAST(start + 1 AS INT):CAST(start + 60 AS INT)], '')) AS INT) AS chunk_len,
        |  md5(array_to_string(pieces[CAST(start + 1 AS INT):CAST(start + 60 AS INT)], '')) AS chunk_md5
        |FROM s ORDER BY id, chunk_id""".stripMargin,
    "pii_redact" ->
      s"""WITH s0 AS (
        |  SELECT doc_id, $piiInjectSql AS t FROM documents),
        |s1 AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '${Pii.categories(0)._3}')) AS BIGINT) AS n_email,
        |  regexp_replace(t, '${Pii.categories(0)._3}', '<EMAIL>', 'g') AS t FROM s0),
        |s2 AS (SELECT doc_id, n_email,
        |  CAST(len(regexp_extract_all(t, '${Pii.categories(1)._3}')) AS BIGINT) AS n_card,
        |  regexp_replace(t, '${Pii.categories(1)._3}', '<CARD>', 'g') AS t FROM s1),
        |s3 AS (SELECT doc_id, n_email, n_card,
        |  CAST(len(regexp_extract_all(t, '${Pii.categories(2)._3}')) AS BIGINT) AS n_ssn,
        |  regexp_replace(t, '${Pii.categories(2)._3}', '<SSN>', 'g') AS t FROM s2),
        |s4 AS (SELECT doc_id, n_email, n_card, n_ssn,
        |  CAST(len(regexp_extract_all(t, '${Pii.categories(3)._3}')) AS BIGINT) AS n_phone,
        |  regexp_replace(t, '${Pii.categories(3)._3}', '<PHONE>', 'g') AS t FROM s3),
        |s5 AS (SELECT doc_id, n_email, n_card, n_ssn, n_phone,
        |  CAST(len(regexp_extract_all(t, '${Pii.categories(4)._3}')) AS BIGINT) AS n_ip,
        |  regexp_replace(t, '${Pii.categories(4)._3}', '<IP>', 'g') AS t FROM s4)
        |SELECT doc_id, n_email, n_card, n_ssn, n_phone, n_ip,
        |       CAST(len(t) AS BIGINT) AS red_len, md5(t) AS red_md5
        |FROM s5 ORDER BY doc_id""".stripMargin,
    "dedup_lines" ->
      s"""WITH d AS (
        |  SELECT doc_id,
        |         regexp_replace(text, '$lineInjectRe',
        |                        '\\1' || chr(10), 'g') AS t
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id,
        |         generate_subscripts(string_split(t, chr(10)), 1) AS line_no,
        |         unnest(string_split(t, chr(10))) AS line
        |  FROM d),
        |ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY md5(line) ORDER BY doc_id, line_no) AS rn
        |  FROM lines)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  md5(coalesce(string_agg(CASE WHEN rn = 1 THEN line END,
        |                          chr(10) ORDER BY line_no), '')) AS dedup_md5
        |FROM ranked GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_clean" ->
      """WITH corpus AS (
        |  SELECT doc_id AS id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000,
        |    'See https://ex.com/a?x=1&y=2 or mail bob.smith+spam@ex-mail.io' || chr(9) || ' '
        |      || text || '  the   end ' || chr(9)
        |  FROM documents WHERE doc_id < 50),
        |cleaned AS (
        |  SELECT id,
        |    CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS INT) AS n_urls,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS INT) AS n_emails,
        |    trim(regexp_replace(
        |      regexp_replace(regexp_replace(text, 'https?://[^\s]+', ' ', 'g'),
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', ' ', 'g'),
        |      '\s+', ' ', 'g')) AS cleaned
        |  FROM corpus)
        |SELECT id, n_urls, n_emails,
        |  CAST(length(cleaned) AS INT) AS clean_len, md5(cleaned) AS clean_md5
        |FROM cleaned ORDER BY id""".stripMargin,
    "tfidf_keywords" ->
      s"""WITH sub AS (SELECT doc_id AS id, text FROM documents WHERE doc_id < 100),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM sub),
        |toks AS (SELECT id, unnest($W) AS tok FROM sub),
        |tf AS (SELECT id, tok, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT tf.id, tf.tok, round(tf.tf * ln((SELECT n FROM n) / df.df), 6) AS score
        |  FROM tf JOIN df ON tf.tok = df.tok),
        |ranked AS (
        |  SELECT id, tok, score,
        |    CAST(row_number() OVER (PARTITION BY id ORDER BY score DESC, tok) AS INT) AS rank
        |  FROM scored)
        |SELECT id, rank, tok, score FROM ranked WHERE rank <= 3
        |ORDER BY id, rank""".stripMargin,
    "text_repetition" ->
      s"""WITH corpus AS (
        |  SELECT doc_id AS id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' ' || text FROM documents WHERE doc_id < 50),
        |grams AS (
        |  SELECT id, unnest(CASE WHEN len(w) >= 3
        |    THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
        |    ELSE [array_to_string(w, ' ')] END) AS gram
        |  FROM (SELECT id, $W AS w FROM corpus)),
        |counts AS (
        |  SELECT id, gram, CAST(count(*) AS BIGINT) AS c FROM grams GROUP BY 1, 2)
        |SELECT id, CAST(sum(c) AS BIGINT) AS n_grams,
        |  round(1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(c) AS BIGINT), 6) AS dup_ratio,
        |  round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS BIGINT), 6) AS top_gram_share
        |FROM counts GROUP BY 1 ORDER BY 1""".stripMargin,
    "decontaminate" ->
      s"""WITH corpus AS (
        |  SELECT doc_id AS id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' zzz9' FROM documents WHERE doc_id < 100),
        |ev AS (SELECT doc_id AS id, text FROM documents WHERE doc_id < 20),
        |cs AS (
        |  SELECT DISTINCT id, unnest(CASE WHEN len(w) >= 3
        |    THEN list_distinct(list_transform(range(1, len(w) - 1),
        |         i -> array_to_string(w[i:i+2], ' ')))
        |    ELSE [array_to_string(w, ' ')] END) AS shingle
        |  FROM (SELECT id, $W AS w FROM corpus)),
        |sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS sz FROM cs GROUP BY 1),
        |es AS (
        |  SELECT DISTINCT id, unnest(CASE WHEN len(w) >= 3
        |    THEN list_distinct(list_transform(range(1, len(w) - 1),
        |         i -> array_to_string(w[i:i+2], ' ')))
        |    ELSE [array_to_string(w, ' ')] END) AS shingle
        |  FROM (SELECT id, $W AS w FROM ev)),
        |common AS (
        |  SELECT cs.id, es.id AS eid, CAST(count(*) AS BIGINT) AS c
        |  FROM cs JOIN es ON cs.shingle = es.shingle GROUP BY 1, 2),
        |cont AS (
        |  SELECT common.id, max(CAST(c AS DOUBLE) / sz) AS containment
        |  FROM common JOIN sizes ON sizes.id = common.id GROUP BY 1)
        |SELECT id, round(containment, 6) AS containment
        |FROM cont WHERE containment >= 0.8 ORDER BY id""".stripMargin,
    "mix_sources" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000
        |  < CAST(round((CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
        |          WHEN 'src2' THEN 0.3 ELSE 0.1 END) * 1000000.0) AS BIGINT)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "select_token_budget" ->
      s"""WITH scored AS (
        |  SELECT doc_id AS id,
        |    least(CAST(len($W) AS DOUBLE) / 100.0, 1.0) * 0.3
        |    + greatest(1.0 - (CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / length(text)) * 10.0, 0.0) * 0.3
        |    + least((CAST(len(list_filter($W, t -> list_contains(
        |        ['the','a','an','and','of','to','in','is','it','that'], t))) AS DOUBLE) / len($W)) * 5.0, 1.0) * 0.2
        |    + greatest(1.0 - abs(CAST(list_sum(list_transform($W, w -> length(w))) AS DOUBLE) / len($W) - 5.0) / 5.0, 0.0) * 0.2
        |    AS quality,
        |    CAST(len($W) AS BIGINT) AS n_tokens
        |  FROM documents),
        |b AS (SELECT *, CAST(floor(quality * 1000) AS BIGINT) AS qb FROM scored),
        |buckets AS (SELECT qb, CAST(sum(n_tokens) AS BIGINT) AS bt FROM b GROUP BY 1),
        |prefixes AS (
        |  SELECT qb, CAST(coalesce(sum(bt) OVER (ORDER BY qb DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prefix
        |  FROM buckets),
        |cum AS (
        |  SELECT b.id, b.quality, b.n_tokens, p.prefix,
        |    CAST(sum(b.n_tokens) OVER (PARTITION BY b.qb ORDER BY b.quality DESC, b.id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
        |  FROM b JOIN prefixes p ON b.qb = p.qb)
        |SELECT id, round(quality, 6) AS quality, n_tokens
        |FROM cum WHERE prefix + c <= 8000 ORDER BY id""".stripMargin,
    // the BPE-budgeted twin: identical selection machinery, n_tokens
    // replayed as the trained-BPE fold (nested literal replaces from the
    // SAME FixedMerges table the Spark side folds over)
    "select_token_budget_bpe" ->
      s"""WITH scored AS (
        |  SELECT doc_id AS id,
        |    least(CAST(len($W) AS DOUBLE) / 100.0, 1.0) * 0.3
        |    + greatest(1.0 - (CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / length(text)) * 10.0, 0.0) * 0.3
        |    + least((CAST(len(list_filter($W, t -> list_contains(
        |        ['the','a','an','and','of','to','in','is','it','that'], t))) AS DOUBLE) / len($W)) * 5.0, 1.0) * 0.2
        |    + greatest(1.0 - abs(CAST(list_sum(list_transform($W, w -> length(w))) AS DOUBLE) / len($W) - 5.0) / 5.0, 0.0) * 0.2
        |    AS quality,
        |    ${Bpe.tokenCountSql("text")} AS n_tokens
        |  FROM documents),
        |b AS (SELECT *, CAST(floor(quality * 1000) AS BIGINT) AS qb FROM scored),
        |buckets AS (SELECT qb, CAST(sum(n_tokens) AS BIGINT) AS bt FROM b GROUP BY 1),
        |prefixes AS (
        |  SELECT qb, CAST(coalesce(sum(bt) OVER (ORDER BY qb DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prefix
        |  FROM buckets),
        |cum AS (
        |  SELECT b.id, b.quality, b.n_tokens, p.prefix,
        |    CAST(sum(b.n_tokens) OVER (PARTITION BY b.qb ORDER BY b.quality DESC, b.id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
        |  FROM b JOIN prefixes p ON b.qb = p.qb)
        |SELECT id, round(quality, 6) AS quality, n_tokens
        |FROM cum WHERE prefix + c <= 8000 ORDER BY id""".stripMargin,
    "quota_sample" ->
      s"""WITH scored AS (
        |  SELECT doc_id, source, CAST(len($W) AS BIGINT) AS n_tokens,
        |    least(CAST(len($W) AS DOUBLE) / 100.0, 1.0) * 0.3
        |    + greatest(1.0 - (CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / length(text)) * 10.0, 0.0) * 0.3
        |    + least((CAST(len(list_filter($W, t -> list_contains(
        |        ['the','a','an','and','of','to','in','is','it','that'], t))) AS DOUBLE) / len($W)) * 5.0, 1.0) * 0.2
        |    + greatest(1.0 - abs(CAST(list_sum(list_transform($W, w -> length(w))) AS DOUBLE) / len($W) - 5.0) / 5.0, 0.0) * 0.2
        |    AS quality
        |  FROM documents),
        |ranked AS (
        |  SELECT source, n_tokens, quality,
        |    row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rn
        |  FROM scored)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens, min(quality) AS min_quality
        |FROM ranked WHERE rn <= 20 GROUP BY 1 ORDER BY 1""".stripMargin,
    "quality_gopher" ->
      s"""WITH corpus AS (
        |  SELECT doc_id AS id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, '• ' || text FROM documents WHERE doc_id < 30
        |  UNION ALL
        |  SELECT doc_id + 200000, text || ' word...' FROM documents
        |  WHERE doc_id >= 30 AND doc_id < 60
        |  UNION ALL
        |  SELECT doc_id + 300000, text || repeat(' #', 20) FROM documents
        |  WHERE doc_id >= 60 AND doc_id < 90
        |  UNION ALL
        |  SELECT doc_id + 400000,
        |    array_to_string((string_split_regex(trim(text), '\\s+'))[1:10], ' ')
        |  FROM documents WHERE doc_id >= 90 AND doc_id < 110),
        |$gopherCtes
        |SELECT id, n_words,
        |  n_words BETWEEN 50 AND 100000 AS r_word_count,
        |  mean_len >= 3.0 AND mean_len <= 10.0 AS r_mean_len,
        |  sym_ratio <= 0.1 AS r_symbol,
        |  bullet_ratio <= 0.9 AS r_bullet,
        |  ell_ratio <= 0.3 AS r_ellipsis,
        |  alpha_ratio >= 0.8 AS r_alpha,
        |  stop_hits >= 2 AS r_stop,
        |  $gopherPassSql AS pass
        |FROM m ORDER BY id""".stripMargin,
    "corpus_summary" ->
      s"""WITH corpus AS (SELECT doc_id AS id, text FROM documents),
        |$gopherCtes,
        |p AS (SELECT id, $gopherPassSql AS pass FROM m),
        |t AS (SELECT doc_id AS id, source, CAST(len($W) AS BIGINT) AS n_toks
        |      FROM documents)
        |SELECT t.source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
        |  round(quantile_cont(n_toks, 0.5), 6) AS p50_tokens,
        |  round(quantile_cont(n_toks, 0.9), 6) AS p90_tokens,
        |  CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
        |  round(CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
        |    AS pass_rate
        |FROM t JOIN p ON p.id = t.id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "corpus_diff" ->
      """WITH a AS (SELECT doc_id AS id, md5(text) AS h_old FROM documents),
        |b0 AS (
        |  SELECT doc_id, CASE WHEN doc_id < 100 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id >= 50
        |  UNION ALL
        |  SELECT doc_id + 500000, text FROM documents WHERE doc_id < 50),
        |b AS (SELECT doc_id AS id, md5(text) AS h_new FROM b0)
        |SELECT coalesce(a.id, b.id) AS id,
        |  CASE WHEN a.id IS NULL THEN 'added'
        |       WHEN b.id IS NULL THEN 'removed'
        |       WHEN a.h_old <> b.h_new THEN 'changed'
        |       ELSE 'same' END AS status
        |FROM a FULL OUTER JOIN b ON a.id = b.id
        |WHERE a.id IS NULL OR b.id IS NULL OR a.h_old <> b.h_new
        |ORDER BY 1""".stripMargin,
    "sample_temperature" ->
      """WITH counts AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1),
        |r AS (
        |  SELECT source,
        |    sqrt(CAST((SELECT min(n) FROM counts) AS DOUBLE) / n) AS rate
        |  FROM counts)
        |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs
        |FROM documents d JOIN r ON r.source = d.source
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000
        |  < CAST(round(rate * 1000000.0) AS BIGINT)
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
