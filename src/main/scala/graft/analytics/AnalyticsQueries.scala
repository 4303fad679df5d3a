package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.sources.Tables
import graft.functions.TextFunctions

/** Correctness-gate queries for the LLM-data-pipeline operators: text
  * analysis, dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash), and
  * embedding similarity search. The synthetic corpus has no duplicates, so
  * dedup queries union in deterministic perturbed copies (id + 100000). */
object AnalyticsQueries extends QueryModule {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id").as("id"), col("text"))

  /** Fanned-out documents read (Tables.fanout) for the queries whose
    * narrow per-row CPU work dominates a serial single-row-group scan —
    * wired ONLY where two independent full-bench runs showed a win
    * (substring removal family, ngram/minhash pair generation,
    * components, the BPE/classifier families); the cheap rows pay the
    * extra exchange + AQE stage more than the parallelism returns
    * (measured: text_fingerprint 0.30 -> 0.6-1.2 s fanned), so they stay
    * on the plain read. */
  private def docsF(s: SparkSession, d: String): DataFrame =
    Tables.fanout(Tables.documents(s, d)).select(col("doc_id").as("id"), col("text"))

  /** [[exactCorpus]]/[[nearCorpus]] over the fanned read. */
  private def exactCorpusF(s: SparkSession, d: String): DataFrame =
    docsF(s, d).unionAll(
      docsF(s, d).where(col("id") < 100)
        .select((col("id") + 100000).as("id"), col("text")))
  private def nearCorpusF(s: SparkSession, d: String): DataFrame =
    docsF(s, d).unionAll(
      docsF(s, d).where(col("id") < 100)
        .select((col("id") + 100000).as("id"),
          concat(col("text"), lit(" zzz9")).as("text")))

  /** Corpus with exact copies of docs 0..99. */
  private def exactCorpus(s: SparkSession, d: String): DataFrame =
    docs(s, d).unionAll(
      docs(s, d).where(col("id") < 100)
        .select((col("id") + 100000).as("id"), col("text")))

  /** Corpus with near-copies (one appended token) of docs 0..99. */
  private def nearCorpus(s: SparkSession, d: String): DataFrame =
    docs(s, d).unionAll(
      docs(s, d).where(col("id") < 100)
        .select((col("id") + 100000).as("id"),
          concat(col("text"), lit(" zzz9")).as("text")))

  private def textStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"),
      TextFunctions.charCount(col("text")).as("n_chars_computed"),
      TextFunctions.wordHits(col("text"), TextFunctions.EnglishStopwords).as("stop_hits"),
      TextFunctions.meanWordLen(col("text")).as("mean_word_len")
    ).orderBy(col("doc_id"))

  private def textQuality(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextFunctions.qualityScore(col("text")).as("quality")
    ).where(col("quality") > 0.5).orderBy(col("doc_id"))

  private def langId(s: SparkSession, d: String): DataFrame = {
    val docsDf = Tables.documents(s, d)
    TextFunctions.langIdTable(docsDf, "doc_id", "text")
      .join(docsDf.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang"), col("predicted")).agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted"))
  }

  private def fingerprintQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextFunctions.fingerprint(col("text")).as("fp")
    ).orderBy(col("doc_id"))

  private def bpeTokensQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextFunctions.bpeTokenCount(col("text")).as("n_bpe")
    ).orderBy(col("doc_id"))

  private def winnowQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).where(col("doc_id") < 100)
      .select(col("doc_id"),
        explode(TextFunctions.winnowFingerprints(col("text"), 5, 4)).as("fp"))
      .orderBy(col("doc_id"), col("fp"))

  private def dedupExact(s: SparkSession, d: String): DataFrame =
    Dedup.exact(exactCorpus(s, d), "text", "id")
      .where(col("n_copies") > 1)
      .select(col("rep_id"), col("n_copies"))
      .orderBy(col("rep_id"))

  /** Lee-et-al duplicated-substring stats over a corpus with verbatim
    * copies of docs 0..99: every window of a copied doc (and its original)
    * is corpus-duplicated; organic 8-gram repeats in the base corpus also
    * surface. */
  private def substringDupQ(s: SparkSession, d: String): DataFrame =
    Dedup.substringDupStats(exactCorpus(s, d), k = 8, "text", "id")
      .orderBy(col("id"))

  /** Full Lee-et-al substring removal over the same corpus: token spans
    * covered by any corpus-duplicated 8-gram are excised. */
  private def substringRemoveQ(s: SparkSession, d: String): DataFrame =
    Dedup.substringDupRemove(exactCorpusF(s, d), k = 8, "text", "id")
      .orderBy(col("id"))

  /** Length-thresholded removal (the paper's >= minLen semantics via
    * chained-window stitching): the verbatim doc copies (long duplicated
    * spans) are fully excised exactly as in dedup_substring_remove, while
    * organic short 8-gram repeats now SURVIVE — only runs of consecutive
    * duplicated windows covering >= 20 tokens are cut. */
  private def substringSpansQ(s: SparkSession, d: String): DataFrame =
    Dedup.substringDupRemoveSpans(exactCorpusF(s, d), k = 8, minLen = 20,
      "text", "id")
      .orderBy(col("id"))

  /** Strict (single-source-verified) span removal: a run is excised only
    * when one (document, offset) partner carries its whole window chain —
    * the chimera-free audit mode. */
  private def substringStrictQ(s: SparkSession, d: String): DataFrame =
    Dedup.substringDupRemoveSpans(exactCorpusF(s, d), k = 8, minLen = 20,
      "text", "id", strict = true)
      .orderBy(col("id"))

  private def dedupNgram(s: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccardPairs(nearCorpusF(s, d), 0.5, "text", "id", maxDocFreq = 64)
      .orderBy(col("id_a"), col("id_b"))

  /** Incremental (batch-vs-corpus) dedup: existing = ids not ≡0 mod 10;
    * incoming = ids ≡0 mod 10 (genuinely new) ∪ exact copies of existing
    * docs (must be dropped). Exercises both bloom paths: negatives pass
    * join-free, positives are exact-verified. */
  private def bloomIncrementalQ(s: SparkSession, d: String): DataFrame = {
    val all = docs(s, d)
    val existing = all.where(col("id") % 10 =!= 0)
    val incoming = all.where(col("id") % 10 === 0).unionAll(
      all.where(col("id") % 10 === 1 && col("id") < 300)
        .select((col("id") + 200000).as("id"), col("text")))
    Dedup.incrementalNew(existing, incoming, "text", "id")
      .select(col("id").as("doc_id")).orderBy(col("doc_id"))
  }

  private def minhashSig(s: SparkSession, d: String): DataFrame =
    Dedup.minhashSignatures(docs(s, d).where(col("id") < 20), 8, "text", "id")
      .orderBy(col("id"), col("seed"))

  private def minhashLsh(s: SparkSession, d: String): DataFrame =
    Dedup.minhashLshPairs(nearCorpusF(s, d), 0.5, k = 16, bands = 4, "text", "id")
      .orderBy(col("id_a"), col("id_b"))

  /** Near-dup point-lookup SERVING against accumulated streaming dedup
    * state (the contamination-check face of [[DedupStream.findNearDups]]):
    * the near-dup corpus is ingested as two incremental batches into a
    * fresh state dir, the FIRST batch is folded into the sorted compacted
    * snapshot and the second left as the uncompacted tail — so the lookup
    * exercises both serving reads (bk-pushdown-pruned snapshot + tail
    * scan). The query set is docs 0..99 re-id'd (+500000, disjoint from
    * every indexed id, so no self-suppression hides a real match); each
    * should hit its identical original (score 1.0) and its perturbed
    * +100000 near-copy. Same MinHash(16)/4-band/0.5-Jaccard geometry as
    * `dedup_minhash_lsh`, so the oracle reuses that query's replay CTEs
    * verbatim. Serving bytes scale with |queries| × bands × page granule,
    * never corpus size — the scale contract BASELINE.md's r13 serving
    * probe measures. */
  private val ndServeIx = DedupStream.MinHashIndexer(threshold = 0.5, k = 16,
    bands = 4, textCol = "text", idCol = "id", n = 3)
  private val ndServeSimhashIx = DedupStream.SimHashIndexer(maxHamming = 3,
    bands = 4, textCol = "text", idCol = "id")
  /** Corpus-size-aware plane count per sf dir ([[Similarity.autoPlanes]]
    * of the embeddings count) — one cheap count job, memoized; a pure
    * function of N the DuckDB oracle recomputes from its own count(*)
    * (the oracle embeds the 30-plane sign matrix and prefixes it to p,
    * valid because lshPlaneSigns(p) is a prefix of lshPlaneSigns(30)).
    *
    * targetBucket = 256, tighter than the pair-generation default
    * (4096): the SERVING ingest resolves near-dups incrementally, so its
    * binding constraint is the probe self-join's candidate volume
    * (~N × bucket × tables, materialized through the resolver's pair
    * checkpoint) — measured at ×100 (200k vectors): 8 planes ⇒ 3.8·10⁸
    * candidates blew the 8g bench heap, 10 planes ⇒ ~7·10⁷ runs clean.
    * Near-identical lookups (the contamination checks this index
    * serves) collide at ANY plane count — identical vectors share every
    * signature — so the tighter buckets cost nothing where it matters. */
  private val embPlanesCache = new Tables.FingerprintMemo[Int]
  private def embPlanes(s: SparkSession, d: String): Int =
    // fingerprint-invalidated per dir: a corpus regenerated at the same
    // path mid-JVM re-derives its geometry instead of serving a stale
    // plane count the oracle's live count(*) recompute would contradict
    embPlanesCache.getOrElseUpdate(d, s"$d/embeddings.parquet")(
      Similarity.autoPlanes(Tables.embeddings(s, d).count(), targetBucket = 256L))

  /** The serving indexer at the geometry a growing corpus actually needs
    * — autoPlanes keeps expected bucket size ~constant, so ingest pair
    * generation stays subquadratic however large the indexed corpus
    * grows (the former fixed 4-plane oracle geometry was quadratic past
    * ~10⁴ vectors and needed an id clamp at ×100; the clamp is gone). */
  private def ndServeEmbIx(s: SparkSession, d: String): DedupStream.CosineLshIndexer =
    DedupStream.CosineLshIndexer(threshold = 0.4,
      planes = embPlanes(s, d), tables = 2, idCol = "id",
      vecCol = "embedding", dims = 64)
  private val ndServeExactIx = DedupStream.ExactIndexer(idCol = "id")

  /** One ingested state dir per (session, sfDir, family): the registered
    * serving queries time the LOOKUP (the operator under test — ingest is
    * the resolver benched by its own probes), and a bench warmup + timed
    * pass must serve from the same state, not re-ingest the corpus twice.
    * Each family ingests its corpus as two incremental batches with the
    * FIRST folded into the sorted compacted snapshot, so every lookup
    * exercises both serving reads (bk-pushdown-pruned snapshot + tail). */
  // weak-keyed by the session object: identity alone is ambiguous (a
  // GC'd session's identityHashCode can be reused by a new one, which
  // would silently hand the new session state ingested under the old),
  // and a strong key would pin a stopped session for the JVM lifetime.
  // WeakHashMap drops the entry when the session is collected; the
  // synchronized block keeps a concurrent first call from double-
  // ingesting into two orphaned temp dirs, and TempDirs' shutdown hook
  // bounds the dir accumulation to the JVM run
  private val ndServeState = new java.util.WeakHashMap[
    SparkSession, scala.collection.mutable.HashMap[(String, String), String]]()

  private def servedState(s: SparkSession, d: String, family: String,
      corpus: DataFrame, ix: DedupStream.BandIndexer): String =
    ndServeState.synchronized {
      val perSession = Option(ndServeState.get(s)).getOrElse {
        val m = scala.collection.mutable.HashMap.empty[(String, String), String]
        ndServeState.put(s, m); m
      }
      perSession.getOrElseUpdate((d, family), {
        val dir = graft.TempDirs.create(s"graft_nd_$family")
        DedupStream.processBatch(corpus.where(col("id") % 2 === 0), 0L, dir, ix, "id")
        DedupStream.compactState(s, dir)
        DedupStream.processBatch(corpus.where(col("id") % 2 === 1), 1L, dir, ix, "id")
        dir
      })
    }

  private def findNearDupsQ(s: SparkSession, d: String): DataFrame = {
    val stateDir = servedState(s, d, "minhash", nearCorpus(s, d), ndServeIx)
    val queryDocs = docs(s, d).where(col("id") < 100)
      .select((col("id") + 500000).as("id"), col("text"))
    DedupStream.findNearDups(s, stateDir, queryDocs, ndServeIx)
      .orderBy(col("query_id"), col("match_id"))
  }

  /** The same serving lookup over the SimHash family — the second
    * [[DedupStream.BandIndexer]] instance, proving the incremental
    * resolver + serving machinery is indexer-generic in practice. The
    * served corpus is BOUNDED to original ids (id < 200000 — a no-op at
    * every oracle SF, mirrored in the oracle SQL): simhash band keys
    * PIGEONHOLE-CLUSTER on a low-diversity corpus (near-identical token
    * distributions share 15-bit slices), so fixed-geometry ingest pair
    * generation grows superlinearly — at the x100 synthetic corpus the
    * ingest aggregate exhausted execution memory in the shared bench JVM
    * (the batch sibling guards the same blowup with `maxBucket`). Scale
    * corpora belong on the streaming face with caller-sized geometry. */
  private def findNearDupsSimhashQ(s: SparkSession, d: String): DataFrame = {
    val stateDir = servedState(s, d, "simhash",
      nearCorpus(s, d).where(col("id") < 200000), ndServeSimhashIx)
    val queryDocs = docs(s, d).where(col("id") < 100)
      .select((col("id") + 500000).as("id"), col("text"))
    DedupStream.findNearDups(s, stateDir, queryDocs, ndServeSimhashIx)
      .orderBy(col("query_id"), col("match_id"))
  }

  /** And over the exact-fingerprint family: "is this EXACT document
    * already in the corpus" — the cheapest contamination check
    * (fingerprint equality, [[Dedup.exact]]'s key). */
  private def findExactDupsQ(s: SparkSession, d: String): DataFrame = {
    val stateDir = servedState(s, d, "exact", exactCorpus(s, d), ndServeExactIx)
    val queryDocs = docs(s, d).where(col("id") < 100)
      .select((col("id") + 500000).as("id"), col("text"))
    DedupStream.findNearDups(s, stateDir, queryDocs, ndServeExactIx)
      .orderBy(col("query_id"), col("match_id"))
  }

  /** And over the embedding sign-LSH family (third instance): the
    * contamination lookup for VECTOR near-duplicates — query embeddings
    * probed against incrementally-indexed corpus embeddings, exact-cosine
    * verified. The WHOLE corpus is ingested, unclamped, at
    * [[Similarity.autoPlanes]] geometry: expected bucket size stays
    * ~constant in N, so the ingest's candidate-pair join is subquadratic
    * by construction (the r13 `vec_id < 500000` bound existed only to
    * keep the former fixed 4-plane geometry alive at ×100 — gone).
    * Query ids are offset by 10⁹ so they can never collide with corpus
    * ids at any conceivable shard size. */
  private def findNearDupsEmbQ(s: SparkSession, d: String): DataFrame = {
    val corpus = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"), col("embedding"))
    val ix = ndServeEmbIx(s, d)
    val stateDir = servedState(s, d, "emb", corpus, ix)
    val queryVecs = corpus.where(col("id") < 50)
      .select((col("id") + 1000000000L).as("id"), col("embedding"))
    DedupStream.findNearDups(s, stateDir, queryVecs, ix)
      .withColumn("score", round(col("score"), 6))
      .orderBy(col("query_id"), col("match_id"))
  }

  /** Component resolution over the MinHash-LSH pair graph — the step that
    * turns near-dup PAIRS into dedup DECISIONS (one representative per
    * component). */
  private def dedupComponents(s: SparkSession, d: String): DataFrame =
    Dedup.connectedComponents(
        Dedup.minhashLshPairs(nearCorpusF(s, d), 0.5, k = 16, bands = 4, "text", "id"))
      .select(col("id"), col("component"))
      .orderBy(col("id"))

  /** Keep-best near-dup resolution: same pair graph as dedup_components,
    * but the cluster winner is the LONGEST text (ties: lowest id) — the
    * near-copies carry an extra token, so this policy keeps the copy where
    * min-id would keep the original. */
  private def resolvePriorityQ(s: SparkSession, d: String): DataFrame = {
    val corpus = nearCorpus(s, d)
    val pairs = Dedup.minhashLshPairs(corpus, 0.5, k = 16, bands = 4, "text", "id")
    Dedup.resolveNearDupsBy(corpus, pairs, length(col("text")), "id")
      .select(col("id")).orderBy(col("id"))
  }

  private def winnowPairsQ(s: SparkSession, d: String): DataFrame =
    Dedup.winnowOverlapPairs(nearCorpus(s, d).where(col("id") % 5 === 0),
        minShared = 5, k = 5, w = 4, "text", "id", maxDocFreq = 64)
      .orderBy(col("id_a"), col("id_b"))

  private def simhashQ(s: SparkSession, d: String): DataFrame =
    Dedup.simhash(docs(s, d).where(col("id") < 50), "text", "id")
      .orderBy(col("id"))

  private def simhashPairsQ(s: SparkSession, d: String): DataFrame =
    Dedup.simhashNearDupPairs(nearCorpus(s, d), maxHamming = 3, bands = 4, "text", "id",
        maxBucket = 64)
      .orderBy(col("id_a"), col("id_b"))

  private def annTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.bruteForceTopK(emb.where(col("vec_id") < 10), emb, 5)
      .withColumn("sim", round(col("sim"), 6))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Exact all-pairs cosine — the RECALL BASELINE the LSH families are
    * judged against, O(N²) by construction. Benched on a bounded slice
    * (vec_id < 20000 — the full sf0.1 corpus, a no-op at every oracle
    * SF, mirrored in the oracle SQL) so the documented quadratic
    * baseline can't dominate a scale bench; the scalable near-dup paths
    * are ann_lsh_banded_auto / ann_lsh_neardup / dedup_semantic_auto. */
  private def embNearDup(s: SparkSession, d: String): DataFrame =
    Similarity.nearDupPairs(Tables.embeddings(s, d).where(col("vec_id") < 20000), 0.4)
      .withColumn("sim", round(col("sim"), 6))
      .orderBy(col("id_a"), col("id_b"))

  /** PQ-compressed ANN: deterministic codebook (iters=0 → the 16
    * lowest-id vectors' slices), 4×16-dim subspaces, ADC top-5 for the
    * first 10 queries. The oracle recomputes quantizer + codes + ADC in
    * SQL, so the whole compressed-search path is value-checked. */
  private def annPqTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val cb = Similarity.pqCodebook(emb, m = 4, kcent = 16, iters = 0)
    val enc = Similarity.pqEncode(emb, cb, m = 4)
    Similarity.pqTopK(emb.where(col("vec_id") < 10), enc, cb, m = 4, kcent = 16, k = 5)
      .withColumn("adist", round(col("adist"), 6))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF + PQ composed: 8 coarse lists probed 3-deep, then ADC over the
    * 4×16 PQ codes — both quantizers deterministic (iters=0) so the whole
    * compressed, pruned search is SQL-checkable. */
  private def annIvfPqTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.ivfPqTopK(emb.where(col("vec_id") < 10), emb,
        k = 5, nlist = 8, nprobe = 3, m = 4, kcent = 16)
      .withColumn("adist", round(col("adist"), 6))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Fixed-nlist PARITY form (per-list work grows N²/16 — the geometry
    * exists for the oracle); benched on the sf0.1-sized bound like every
    * pinned parity row, the auto sibling grades the scale path. */
  private def dedupSemantic(s: SparkSession, d: String): DataFrame =
    Similarity.semanticDedup(Tables.embeddings(s, d).where(col("vec_id") < 20000),
        nlist = 16, threshold = 0.4)
      .withColumn("max_prior_sim", round(col("max_prior_sim"), 6))
      .orderBy(col("id"))

  private def annIvfTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.ivfTopK(emb.where(col("vec_id") < 10), emb, k = 5, nlist = 8, nprobe = 3)
      .withColumn("sim", round(col("sim"), 6))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The IVF library DEFAULT — what a caller who passes no geometry
    * gets: autoIvf (nlist ≈ 4·√N FAISS sizing, nprobe = nlist/16,
    * probed candidate set SUBLINEAR in N). The oracle recomputes both
    * from count(*) with the same clamp arithmetic; the fixed-geometry
    * sibling above stays for small-corpus parity.
    *
    * Bounded to the sf0.1 corpus size (oracle-mirrored, a no-op at every
    * oracle SF): the dominant cost of this AD-HOC form is the coarse
    * assignment of all N vectors to √N centroids — that IS index build,
    * re-paid inline on every call, O(N·√N) by construction (measured
    * exponent 0.94, 80 s at ×100 in SCALING_r14). A deployment pays it
    * once via [[SimilarityIndex.saveIvf]] and serves from the persisted
    * index — `ann_index_ivf_topk` below is that row (exp 0.07) and stays
    * UNBOUNDED so the scale bench grades the lifecycle a real corpus
    * runs, exactly the emb_near_dup/ann_lsh_banded precedent. */
  private def annIvfTopKAuto(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d).where(col("vec_id") < 20000)
    Similarity.ivfTopK(emb.where(col("vec_id") < 10), emb, k = 5)
      .withColumn("sim", round(col("sim"), 6))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The production ANN SERVING shape (FAISS train/add/search lifecycle):
    * top-k against the PERSISTED auto-geometry IVF index — the only
    * corpus-scale work per query batch is the pruned scan of the probed
    * lists, so serving stays sublinear where the ad-hoc sibling pays the
    * O(N·√N) coarse assignment inline on every call. Index built once
    * per sf dir (memoized; TempDirs-cleaned); results identical to the
    * inline form by [[SimilarityIndex]]'s spec-pinned contract, so the
    * oracle SQL is the same dynamic-geometry replay. */
  private val ivfIndexDirs = new Tables.FingerprintMemo[String]
  private def ivfIndexDir(s: SparkSession, d: String): String =
    // fingerprint-invalidated: a regenerated corpus rebuilds its index
    ivfIndexDirs.getOrElseUpdate(d, s"$d/embeddings.parquet") {
      val dir = graft.TempDirs.create("graft_ivf_index")
      SimilarityIndex.saveIvf(Tables.embeddings(s, d), dir)
      dir
    }
  private def annIndexIvfTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    SimilarityIndex.ivfTopK(s, emb.where(col("vec_id") < 10), ivfIndexDir(s, d), k = 5)
      .withColumn("sim", round(col("sim"), 6))
      .orderBy(col("query_id"), col("rank"))
  }

  /** LSH-bucketed near-dup, fixed-geometry PARITY form. Oracle-checked:
    * the hyperplane coefficients are deterministic ±1 literals
    * (Similarity.lshPlaneSigns), so the oracle SQL embeds the same planes
    * and computes the identical bucket signatures. Bounded to the sf0.1
    * corpus size (oracle-mirrored no-op at every oracle SF): 4 fixed
    * planes = 16 buckets is quadratic past ~10⁴ vectors by construction —
    * ann_lsh_banded_auto grades the geometry a scaled corpus gets. */
  private def annLshNearDup(s: SparkSession, d: String): DataFrame =
    Similarity.lshNearDupPairs(Tables.embeddings(s, d).where(col("vec_id") < 20000),
        0.4, planes = 4)
      .withColumn("sim", round(col("sim"), 6))
      .orderBy(col("id_a"), col("id_b"))

  /** The r10 banded OR-construction (the auto default's engine): two
    * independent plane tables, candidates = pairs colliding in EITHER —
    * the oracle embeds both tables' sign literals and unions the two
    * bucket joins. */
  private def annLshBanded(s: SparkSession, d: String): DataFrame =
    Similarity.lshNearDupPairsBanded(Tables.embeddings(s, d).where(col("vec_id") < 20000),
        0.4, planes = 4, tables = 2)
      .withColumn("sim", round(col("sim"), 6))
      .orderBy(col("id_a"), col("id_b"))

  /** The library DEFAULT geometry — what a caller who passes no planes
    * gets: planes = autoPlanes(N, 256) (expected bucket ~256 however large N
    * grows), tables = 4. This is the row that grades the plan a 100×
    * user actually runs; the fixed-geometry sibling above stays for
    * small-corpus parity. The oracle recomputes planes from count(*)
    * and prefixes an embedded 30-plane sign matrix. */
  private def annLshBandedAuto(s: SparkSession, d: String): DataFrame =
    Similarity.lshNearDupPairs(Tables.embeddings(s, d), 0.4)
      .withColumn("sim", round(col("sim"), 6))
      .orderBy(col("id_a"), col("id_b"))

  /** SemDeDup at the library-default auto nlist (N/1024 lists — fixed
    * expected list length, so within-list pair work stays linear in N);
    * the fixed-nlist sibling stays for parity. The oracle recomputes
    * nlist from count(*). */
  private def dedupSemanticAuto(s: SparkSession, d: String): DataFrame =
    Similarity.semanticDedup(Tables.embeddings(s, d), nlist = 0, threshold = 0.4)
      .withColumn("max_prior_sim", round(col("max_prior_sim"), 6))
      .orderBy(col("id"))

  /** End-to-end training-data pipeline — the composed 100 TB use case:
    * quality gate → language select → exact dedup (min id per fingerprint)
    * → near-dedup (drop the larger id of every Jaccard >= 0.8 pair) →
    * per-document token accounting. Planted exact (+100000) and near
    * (+200000) copies of docs 0..49 exercise both dedup stages. */
  private def pipelineQ(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs(s, d)
    val corpus = base
      .unionAll(base.where(col("id") < 50)
        .select((col("id") + 100000).as("id"), col("text")))
      .unionAll(base.where(col("id") < 50)
        .select((col("id") + 200000).as("id"),
          concat(col("text"), lit(" zzz9")).as("text")))
    // the quality-filtered corpus feeds language ID (twice), dedup, and the
    // final projection — persist so the quality scoring runs once
    val qual = graft.QueryCaches.track(
      corpus.where(TextFunctions.qualityScore(col("text")) > 0.5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val en = TextFunctions.langIdTable(qual, "id", "text")
      .where(col("predicted") === "en").select("id")
    val candidates = qual.join(en, "id")
    val w = Window.partitionBy(TextFunctions.fingerprint(col("text"))).orderBy(col("id"))
    // feeds near-dup pair generation, the anti-join, and the final
    // projection — persist to evaluate the window dedup once
    val exactDeduped = graft.QueryCaches.track(
      candidates.withColumn("_rn", row_number().over(w))
        .where(col("_rn") === 1).drop("_rn")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // maxDocFreq caps the inverted-index fan-out: a boilerplate shingle
    // shared by f docs emits f^2/2 join rows — at corpus scale one hot
    // shingle dominates the shuffle (r7: 11x bench blowup). The oracle
    // applies the identical cap, so results stay exactly comparable.
    val drops = Dedup.ngramJaccardPairs(exactDeduped, 0.8, "text", "id", maxDocFreq = 64)
      .select(col("id_b").as("id")).distinct()
    exactDeduped.join(drops, Seq("id"), "left_anti")
      .select(col("id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        TextFunctions.bpeTokenCount(col("text")).as("n_bpe"))
      .orderBy(col("id"))
  }

  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "text_stats" -> (textStats _),
    "text_quality" -> (textQuality _),
    "text_lang_id" -> (langId _),
    "text_fingerprint" -> (fingerprintQ _),
    "text_bpe_tokens" -> (bpeTokensQ _),
    "text_winnow_fp" -> (winnowQ _),
    "pipeline_training_data" -> (pipelineQ _),
    "dedup_exact" -> (dedupExact _),
    "dedup_bloom_incremental" -> (bloomIncrementalQ _),
    "dedup_substring" -> (substringDupQ _),
    "dedup_substring_remove" -> (substringRemoveQ _),
    "dedup_substring_spans" -> (substringSpansQ _),
    "dedup_substring_strict" -> (substringStrictQ _),
    "dedup_ngram_jaccard" -> (dedupNgram _),
    "dedup_minhash_signatures" -> (minhashSig _),
    "dedup_minhash_lsh" -> (minhashLsh _),
    "find_near_dups" -> (findNearDupsQ _),
    "find_near_dups_simhash" -> (findNearDupsSimhashQ _),
    "find_near_dups_emb" -> (findNearDupsEmbQ _),
    "find_exact_dups" -> (findExactDupsQ _),
    "dedup_components" -> (dedupComponents _),
    "dedup_resolve_priority" -> (resolvePriorityQ _),
    "dedup_winnow_pairs" -> (winnowPairsQ _),
    "dedup_simhash" -> (simhashQ _),
    "dedup_simhash_pairs" -> (simhashPairsQ _),
    "dedup_semantic" -> (dedupSemantic _),
    "dedup_semantic_auto" -> (dedupSemanticAuto _),
    "ann_cosine_topk" -> (annTopK _),
    "ann_ivf_topk" -> (annIvfTopK _),
    "ann_ivf_topk_auto" -> (annIvfTopKAuto _),
    "ann_index_ivf_topk" -> (annIndexIvfTopK _),
    "ann_pq_topk" -> (annPqTopK _),
    "ann_ivfpq_topk" -> (annIvfPqTopK _),
    "ann_lsh_neardup" -> (annLshNearDup _),
    "ann_lsh_banded" -> (annLshBanded _),
    "ann_lsh_banded_auto" -> (annLshBandedAuto _),
    "emb_near_dup" -> (embNearDup _),
    "emb_quantize_sq8" -> (sq8Q _),
    "ann_sq8_topk" -> (annSq8TopK _),
    "sample_diversity" -> (sampleDiversityQ _)
  )

  /** Cluster-balanced diversity sample: 8 deterministic coarse centroids
    * (vec_id < 8, the oracle-embeddable untrained-quantizer form — the
    * library default auto-sizes and trains), quota 20 per cluster, picked
    * in portable id-hash order. */
  private def sampleDiversityQ(s: SparkSession, d: String): DataFrame =
    Similarity.clusterBalancedSample(Tables.embeddings(s, d), quota = 20, nlist = 8)
      .orderBy(col("vec_id"))

  /** Asymmetric SQ8 search: full-precision queries against the
    * reconstructed 8-bit corpus. */
  private def annSq8TopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.fanout(Tables.embeddings(s, d))
    Similarity.sq8TopK(emb.where(col("vec_id") < 10), emb, 5)
      .withColumn("sim", round(col("sim"), 6))
      .orderBy(col("query_id"), col("rank"))
  }

  /** SQ8 storage codec: per-vector code hash (bit-exact across engines —
    * the floor(+0.5) chain is IEEE-correctly-rounded end to end) plus max
    * reconstruction error. */
  private def sq8Q(s: SparkSession, d: String): DataFrame =
    Similarity.sq8(Tables.fanout(Tables.embeddings(s, d)))
      .select(col("id").as("vec_id"), col("n_dims"),
        md5(array_join(transform(col("codes"), c => c.cast("string")), ","))
          .as("codes_md5"),
        col("err_max"))
      .orderBy(col("vec_id"))

  // ---- DuckDB oracle SQL ----

  /** Tokenization shared by all text oracles (mirrors TextFunctions.tokens). */
  private val W = "string_split_regex(trim(text), '\\s+')"
  private def hash60(x: String) = s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT)"

  private val exactCorpusSql =
    """corpus AS (
      |  SELECT doc_id AS id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 100)""".stripMargin
  private val nearCorpusSql =
    """corpus AS (
      |  SELECT doc_id AS id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, text || ' zzz9' FROM documents WHERE doc_id < 100)""".stripMargin

  /** Shingle CTE over `corpus` (mirrors TextFunctions.shingles n=3 +
    * Dedup.shingleIndex distinct). */
  private val shingleSql =
    s"""shingles AS (
      |  SELECT DISTINCT id, unnest(CASE WHEN len(w) >= 3
      |    THEN list_distinct(list_transform(range(1, len(w) - 1),
      |         i -> array_to_string(w[i:i+2], ' ')))
      |    ELSE [array_to_string(w, ' ')] END) AS shingle
      |  FROM (SELECT id, $W AS w FROM corpus)),
      |sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS sz FROM shingles GROUP BY 1)""".stripMargin

  /** MinHash(16)-LSH(4-band) candidates, 0.5-Jaccard verification, and the
    * transitive closure of the resulting pair graph — the shared backbone
    * of the components and priority-resolution oracles. Ends with the
    * recursive `reach(src, dst)` CTE. */
  private lazy val minhashReachSql =
    s"""sig AS (
      |  SELECT id, seed,
      |         min(((2*seed+1) * (${hash60("shingle")} % 2147483647)
      |              + seed * 2654435761) % 2147483647) AS minhash
      |  FROM shingles CROSS JOIN range(16) t(seed) GROUP BY 1, 2),
      |bandkeys AS (
      |  SELECT id, CAST(seed // 4 AS INT) AS band,
      |         string_agg(lpad(CAST(seed AS VARCHAR), 2, '0') || '=' || CAST(minhash AS VARCHAR),
      |                    ',' ORDER BY seed) AS band_key
      |  FROM sig GROUP BY 1, 2),
      |cands AS (
      |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
      |  FROM bandkeys a JOIN bandkeys b
      |    ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id),
      |common AS (
      |  SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS c
      |  FROM cands c JOIN shingles a ON a.id = c.id_a
      |               JOIN shingles b ON b.id = c.id_b AND b.shingle = a.shingle
      |  GROUP BY 1, 2),
      |verified AS (
      |  SELECT common.id_a, common.id_b
      |  FROM common JOIN sizes sa ON sa.id = common.id_a
      |              JOIN sizes sb ON sb.id = common.id_b
      |  WHERE CAST(common.c AS DOUBLE) / (sa.sz + sb.sz - common.c) >= 0.5),
      |edges AS (
      |  SELECT id_a AS a, id_b AS b FROM verified
      |  UNION SELECT id_b, id_a FROM verified),
      |reach(src, dst) AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)""".stripMargin

  /** Mirrors ngramJaccardPairs' maxDocFreq=64 hot-shingle drop: the join
    * index excludes shingles shared by >64 docs; `sizes` stays computed
    * from the FULL shingle sets (the Spark side prunes only join keys). */
  private val prunedShinglesSql =
    """pruned AS (
      |  SELECT s.id, s.shingle FROM shingles s
      |  JOIN (SELECT shingle FROM shingles GROUP BY 1 HAVING count(*) <= 64) ok
      |    ON ok.shingle = s.shingle)""".stripMargin

  private def jaccardPairsSql(candSrc: String): String =
    s"""common AS (
      |  SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS c
      |  FROM $candSrc
      |  GROUP BY 1, 2)
      |SELECT common.id_a, common.id_b,
      |       CAST(common.c AS DOUBLE) / (sa.sz + sb.sz - common.c) AS jaccard
      |FROM common JOIN sizes sa ON sa.id = common.id_a
      |            JOIN sizes sb ON sb.id = common.id_b
      |WHERE CAST(common.c AS DOUBLE) / (sa.sz + sb.sz - common.c) >= 0.5
      |ORDER BY 1, 2""".stripMargin

  /** CTEs recomputing [[Similarity.autoPlanes]] from the live corpus
    * count — `pp.p` is the dynamic plane count, computed INTEGRALLY on
    * both sides (bit-length of ceil(N/target) − 1 via `length(bin(…))`;
    * a float ceil(log2(…)) can overshoot at exact power-of-two ratios —
    * see autoPlanes). `q ≤ 1` yields bin(0) = '0' of length 1, absorbed
    * by the greatest(8, …) clamp exactly like the Scala side's floor. */
  private val autoPlanesSql =
    """nn AS (SELECT count(*) AS c FROM embeddings),
      |pp AS (SELECT least(30, greatest(8,
      |         CAST(length(bin(greatest(CAST(ceil(c / 256.0) AS BIGINT) - 1, 1))) AS INT))) AS p FROM nn)""".stripMargin

  /** The serving-ingest variant: targetBucket 256 (see [[embPlanes]]). */
  private val servePlanesSql =
    """nn AS (SELECT count(*) AS c FROM embeddings),
      |pp AS (SELECT least(30, greatest(8,
      |         CAST(length(bin(greatest(CAST(ceil(c / 256.0) AS BIGINT) - 1, 1))) AS INT))) AS p FROM nn)""".stripMargin

  /** The FULL 30-plane ±1 sign matrix for `table` as a DuckDB list
    * literal. [[Similarity.lshPlaneSigns]](p) is a PREFIX of
    * lshPlaneSigns(30) (the derivation hashes "p:d" independent of the
    * total plane count), so slicing the first `pp.p` rows reproduces the
    * auto-geometry signature at any corpus size. */
  private def planes30Lit(table: Int): String =
    "[" + Similarity.lshPlaneSigns(planes = 30, dims = 64, table).map(plane =>
      "[" + plane.map(s => s"$s.0").mkString(",") + "]").mkString(",") + "]"

  /** Dynamic-geometry sign-LSH bucket of `v` against plane table
    * `table`, using the first `pp.p` planes. list_dot_product matches
    * Spark's index-ascending aggregate fold (the same identity every
    * cosine-verification oracle already relies on). */
  private def bucketAuto(table: Int): String =
    s"""array_to_string(list_transform(
      |      list_slice(${planes30Lit(table)}, 1, pp.p),
      |      pl -> CASE WHEN list_dot_product(v, pl) >= 0
      |                 THEN '1' ELSE '0' END), '')""".stripMargin

  def oracles: Seq[(String, String)] = Seq(
    "text_stats" ->
      s"""SELECT doc_id,
        |  CAST(len($W) AS INT) AS n_tokens,
        |  CAST(length(text) AS INT) AS n_chars_computed,
        |  CAST(len(list_filter($W, t -> list_contains(
        |    ['the','a','an','and','of','to','in','is','it','that'], t))) AS INT) AS stop_hits,
        |  CAST(list_sum(list_transform($W, w -> length(w))) AS DOUBLE) / len($W) AS mean_word_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      s"""WITH scored AS (
        |  SELECT doc_id,
        |    least(CAST(len($W) AS DOUBLE) / 100.0, 1.0) * 0.3
        |    + greatest(1.0 - (CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / length(text)) * 10.0, 0.0) * 0.3
        |    + least((CAST(len(list_filter($W, t -> list_contains(
        |        ['the','a','an','and','of','to','in','is','it','that'], t))) AS DOUBLE) / len($W)) * 5.0, 1.0) * 0.2
        |    + greatest(1.0 - abs(CAST(list_sum(list_transform($W, w -> length(w))) AS DOUBLE) / len($W) - 5.0) / 5.0, 0.0) * 0.2
        |    AS quality
        |  FROM documents)
        |SELECT doc_id, quality FROM scored WHERE quality > 0.5 ORDER BY doc_id""".stripMargin,
    "text_lang_id" ->
      s"""WITH scored AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter($W, t -> list_contains(['der','die','und','das','ist','nicht'], t))) AS DOUBLE) / len($W) AS s_de,
        |    CAST(len(list_filter($W, t -> list_contains(['the','a','and','of','to','is'], t))) AS DOUBLE) / len($W) AS s_en,
        |    CAST(len(list_filter($W, t -> list_contains(['el','la','de','que','y','los'], t))) AS DOUBLE) / len($W) AS s_es,
        |    CAST(len(list_filter($W, t -> list_contains(['le','les','et','des','un','une'], t))) AS DOUBLE) / len($W) AS s_fr,
        |    CAST(len(list_filter($W, t -> list_contains(['的','是','了','在','和','有'], t))) AS DOUBLE) / len($W) AS s_zh
        |  FROM documents),
        |predicted AS (
        |  SELECT doc_id, lang,
        |    (SELECT l FROM (VALUES ('de', s_de), ('en', s_en), ('es', s_es),
        |      ('fr', s_fr), ('zh', s_zh)) t(l, sc)
        |     ORDER BY sc DESC, l LIMIT 1) AS predicted
        |  FROM scored)
        |SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n
        |FROM predicted GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "text_fingerprint" ->
      s"""SELECT doc_id,
        |  md5(array_to_string(string_split_regex(trim(lower(text)), '\\s+'), ' ')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    ' ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+')) AS INT) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_winnow_fp" ->
      s"""WITH n AS (
        |  SELECT doc_id,
        |    array_to_string(string_split_regex(trim(lower(text)), '\\s+'), ' ') AS norm
        |  FROM documents WHERE doc_id < 100),
        |g AS (SELECT doc_id, norm, length(norm) - 4 AS ng FROM n),
        |h AS (
        |  SELECT doc_id, ng,
        |    list_transform(range(1, ng + 1),
        |      i -> ${hash60("substr(norm, CAST(i AS INT), 5)")}) AS hs,
        |    norm
        |  FROM g),
        |fp AS (
        |  SELECT doc_id,
        |    CASE WHEN ng >= 4 THEN
        |      list_sort(list_distinct(list_transform(range(1, ng - 2),
        |        j -> list_min(hs[j:j+3]))))
        |    ELSE [${hash60("norm")}] END AS fps
        |  FROM h)
        |SELECT doc_id, unnest(fps) AS fp FROM fp ORDER BY doc_id, fp""".stripMargin,
    "pipeline_training_data" ->
      s"""WITH corpus AS (
        |  SELECT doc_id AS id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 50
        |  UNION ALL
        |  SELECT doc_id + 200000, text || ' zzz9' FROM documents WHERE doc_id < 50),
        |qual AS (
        |  SELECT id, text FROM corpus
        |  WHERE least(CAST(len($W) AS DOUBLE) / 100.0, 1.0) * 0.3
        |    + greatest(1.0 - (CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / length(text)) * 10.0, 0.0) * 0.3
        |    + least((CAST(len(list_filter($W, t -> list_contains(
        |        ['the','a','an','and','of','to','in','is','it','that'], t))) AS DOUBLE) / len($W)) * 5.0, 1.0) * 0.2
        |    + greatest(1.0 - abs(CAST(list_sum(list_transform($W, w -> length(w))) AS DOUBLE) / len($W) - 5.0) / 5.0, 0.0) * 0.2
        |    > 0.5),
        |scored AS (
        |  SELECT id, text,
        |    CAST(len(list_filter($W, t -> list_contains(['der','die','und','das','ist','nicht'], t))) AS DOUBLE) / len($W) AS s_de,
        |    CAST(len(list_filter($W, t -> list_contains(['the','a','and','of','to','is'], t))) AS DOUBLE) / len($W) AS s_en,
        |    CAST(len(list_filter($W, t -> list_contains(['el','la','de','que','y','los'], t))) AS DOUBLE) / len($W) AS s_es,
        |    CAST(len(list_filter($W, t -> list_contains(['le','les','et','des','un','une'], t))) AS DOUBLE) / len($W) AS s_fr,
        |    CAST(len(list_filter($W, t -> list_contains(['的','是','了','在','和','有'], t))) AS DOUBLE) / len($W) AS s_zh
        |  FROM qual),
        |en AS (
        |  SELECT id, text FROM scored
        |  WHERE (SELECT l FROM (VALUES ('de', s_de), ('en', s_en), ('es', s_es),
        |           ('fr', s_fr), ('zh', s_zh)) t(l, sc)
        |         ORDER BY sc DESC, l LIMIT 1) = 'en'),
        |exact AS (
        |  SELECT id, text FROM (
        |    SELECT id, text, row_number() OVER (
        |      PARTITION BY md5(array_to_string(string_split_regex(trim(lower(text)), '\\s+'), ' '))
        |      ORDER BY id) AS rn
        |    FROM en) WHERE rn = 1),
        |shingles AS (
        |  SELECT DISTINCT id, unnest(CASE WHEN len(w) >= 3
        |    THEN list_distinct(list_transform(range(1, len(w) - 1),
        |         i -> array_to_string(w[i:i+2], ' ')))
        |    ELSE [array_to_string(w, ' ')] END) AS shingle
        |  FROM (SELECT id, $W AS w FROM exact)),
        |sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS sz FROM shingles GROUP BY 1),
        |pruned AS (
        |  SELECT s.id, s.shingle FROM shingles s
        |  JOIN (SELECT shingle FROM shingles GROUP BY 1 HAVING count(*) <= 64) ok
        |    ON ok.shingle = s.shingle),
        |common AS (
        |  SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS c
        |  FROM pruned a JOIN pruned b ON a.shingle = b.shingle AND a.id < b.id
        |  GROUP BY 1, 2),
        |drops AS (
        |  SELECT DISTINCT common.id_b AS id
        |  FROM common JOIN sizes sa ON sa.id = common.id_a
        |              JOIN sizes sb ON sb.id = common.id_b
        |  WHERE CAST(common.c AS DOUBLE) / (sa.sz + sb.sz - common.c) >= 0.8)
        |SELECT id, CAST(len($W) AS INT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text,
        |    ' ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+')) AS INT) AS n_bpe
        |FROM exact WHERE id NOT IN (SELECT id FROM drops)
        |ORDER BY id""".stripMargin,
    "dedup_exact" ->
      s"""WITH $exactCorpusSql
        |SELECT min(id) AS rep_id, CAST(count(*) AS BIGINT) AS n_copies
        |FROM corpus
        |GROUP BY md5(array_to_string(string_split_regex(trim(lower(text)), '\\s+'), ' '))
        |HAVING count(*) > 1 ORDER BY 1""".stripMargin,
    "dedup_bloom_incremental" ->
      """WITH existing AS (
        |  SELECT doc_id AS id, text FROM documents WHERE doc_id % 10 <> 0),
        |incoming AS (
        |  SELECT doc_id AS id, text FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 200000, text FROM documents
        |  WHERE doc_id % 10 = 1 AND doc_id < 300),
        |infp AS (SELECT id, md5(array_to_string(
        |  string_split_regex(trim(lower(text)), '\s+'), ' ')) AS f FROM incoming),
        |exfp AS (SELECT DISTINCT md5(array_to_string(
        |  string_split_regex(trim(lower(text)), '\s+'), ' ')) AS f FROM existing)
        |SELECT infp.id AS doc_id FROM infp
        |WHERE infp.f NOT IN (SELECT f FROM exfp) ORDER BY 1""".stripMargin,
    "dedup_substring" ->
      s"""WITH $exactCorpusSql,
        |toks AS (SELECT id, string_split_regex(trim(text), '\\s+') AS w FROM corpus),
        |wins AS (
        |  SELECT id, md5(array_to_string(list_slice(w, gs, gs + 7), ' ')) AS h
        |  FROM (SELECT id, w, unnest(range(1, greatest(len(w) - 7, 0) + 1)) AS gs
        |        FROM toks)),
        |duph AS (SELECT h FROM wins GROUP BY h HAVING count(*) > 1),
        |per AS (SELECT id, CAST(count(*) AS BIGINT) AS n_dup_windows FROM wins
        |        WHERE h IN (SELECT h FROM duph) GROUP BY id)
        |SELECT t.id, CAST(greatest(len(w) - 7, 0) AS BIGINT) AS n_windows,
        |       coalesce(per.n_dup_windows, 0) AS n_dup_windows,
        |       CAST(coalesce(per.n_dup_windows, 0) AS DOUBLE)
        |         / nullif(greatest(len(w) - 7, 0), 0) AS dup_ratio
        |FROM toks t LEFT JOIN per ON per.id = t.id
        |ORDER BY t.id""".stripMargin,
    "dedup_substring_remove" ->
      s"""WITH $exactCorpusSql,
        |toks AS (SELECT id, string_split_regex(trim(text), '\\s+') AS w FROM corpus),
        |wins AS (
        |  SELECT id, gs AS i, md5(array_to_string(list_slice(w, gs, gs + 7), ' ')) AS h
        |  FROM (SELECT id, w, unnest(range(1, greatest(len(w) - 7, 0) + 1)) AS gs
        |        FROM toks)),
        |duph AS (SELECT h FROM wins GROUP BY h HAVING count(*) > 1),
        |cov AS (SELECT DISTINCT id, p FROM (
        |  SELECT id, unnest(range(i, i + 8)) AS p FROM wins
        |  WHERE h IN (SELECT h FROM duph))),
        |covagg AS (SELECT id, CAST(count(*) AS BIGINT) AS n_removed FROM cov GROUP BY id),
        |tokpos AS (SELECT id, p, w[CAST(p AS INT)] AS tok
        |           FROM (SELECT id, w, unnest(range(1, len(w) + 1)) AS p FROM toks)),
        |keptagg AS (SELECT tokpos.id, string_agg(tok, ' ' ORDER BY p) AS text_clean
        |            FROM tokpos ANTI JOIN cov ON cov.id = tokpos.id AND cov.p = tokpos.p
        |            GROUP BY tokpos.id)
        |SELECT t.id, CAST(len(w) AS BIGINT) AS n_tokens,
        |       coalesce(covagg.n_removed, 0) AS n_removed,
        |       coalesce(keptagg.text_clean, '') AS text_clean
        |FROM toks t LEFT JOIN covagg ON covagg.id = t.id
        |            LEFT JOIN keptagg ON keptagg.id = t.id
        |ORDER BY t.id""".stripMargin,
    "dedup_substring_spans" ->
      s"""WITH $exactCorpusSql,
        |toks AS (SELECT id, string_split_regex(trim(text), '\\s+') AS w FROM corpus),
        |wins AS (
        |  SELECT id, gs AS i, md5(array_to_string(list_slice(w, gs, gs + 7), ' ')) AS h
        |  FROM (SELECT id, w, unnest(range(1, greatest(len(w) - 7, 0) + 1)) AS gs
        |        FROM toks)),
        |duph AS (SELECT h FROM wins GROUP BY h HAVING count(*) > 1),
        |dstart AS (SELECT id, i FROM wins WHERE h IN (SELECT h FROM duph)),
        |runs AS (
        |  SELECT id, min(i) AS s, max(i) AS e FROM (
        |    SELECT id, i, i - row_number() OVER (PARTITION BY id ORDER BY i) AS island
        |    FROM dstart)
        |  GROUP BY id, island HAVING max(i) - min(i) + 8 >= 20),
        |cov AS (SELECT DISTINCT id, p FROM (
        |  SELECT id, unnest(range(s, e + 8)) AS p FROM runs)),
        |covagg AS (SELECT id, CAST(count(*) AS BIGINT) AS n_removed FROM cov GROUP BY id),
        |tokpos AS (SELECT id, p, w[CAST(p AS INT)] AS tok
        |           FROM (SELECT id, w, unnest(range(1, len(w) + 1)) AS p FROM toks)),
        |keptagg AS (SELECT tokpos.id, string_agg(tok, ' ' ORDER BY p) AS text_clean
        |            FROM tokpos ANTI JOIN cov ON cov.id = tokpos.id AND cov.p = tokpos.p
        |            GROUP BY tokpos.id)
        |SELECT t.id, CAST(len(w) AS BIGINT) AS n_tokens,
        |       coalesce(covagg.n_removed, 0) AS n_removed,
        |       coalesce(keptagg.text_clean, '') AS text_clean
        |FROM toks t LEFT JOIN covagg ON covagg.id = t.id
        |            LEFT JOIN keptagg ON keptagg.id = t.id
        |ORDER BY t.id""".stripMargin,
    "dedup_substring_strict" ->
      s"""WITH $exactCorpusSql,
        |toks AS (SELECT id, string_split_regex(trim(text), '\\s+') AS w FROM corpus),
        |wins AS (
        |  SELECT id, gs AS i, md5(array_to_string(list_slice(w, gs, gs + 7), ' ')) AS h
        |  FROM (SELECT id, w, unnest(range(1, greatest(len(w) - 7, 0) + 1)) AS gs
        |        FROM toks)),
        |duph AS (SELECT h FROM wins GROUP BY h HAVING count(*) > 1),
        |dstart AS (SELECT id, i FROM wins WHERE h IN (SELECT h FROM duph)),
        |runs AS (
        |  SELECT id, min(i) AS s, max(i) AS e FROM (
        |    SELECT id, i, i - row_number() OVER (PARTITION BY id ORDER BY i) AS island
        |    FROM dstart)
        |  GROUP BY id, island HAVING max(i) - min(i) + 8 >= 20),
        |rstart AS (SELECT id, s, e, unnest(range(s, e + 1)) AS i FROM runs),
        |rsh AS (SELECT r.id, r.s, r.e, r.i, w.h
        |        FROM rstart r JOIN wins w ON w.id = r.id AND w.i = r.i),
        |ver AS (
        |  SELECT DISTINCT id, s, e FROM (
        |    SELECT a.id, a.s, a.e, b.id AS pid, b.i - a.i AS off,
        |           CAST(count(*) AS BIGINT) AS n
        |    FROM rsh a JOIN wins b ON b.h = a.h
        |      AND NOT (b.id = a.id AND b.i = a.i)
        |    GROUP BY 1, 2, 3, 4, 5)
        |  WHERE n = e - s + 1),
        |cov AS (SELECT DISTINCT id, p FROM (
        |  SELECT id, unnest(range(s, e + 8)) AS p FROM ver)),
        |covagg AS (SELECT id, CAST(count(*) AS BIGINT) AS n_removed FROM cov GROUP BY id),
        |tokpos AS (SELECT id, p, w[CAST(p AS INT)] AS tok
        |           FROM (SELECT id, w, unnest(range(1, len(w) + 1)) AS p FROM toks)),
        |keptagg AS (SELECT tokpos.id, string_agg(tok, ' ' ORDER BY p) AS text_clean
        |            FROM tokpos ANTI JOIN cov ON cov.id = tokpos.id AND cov.p = tokpos.p
        |            GROUP BY tokpos.id)
        |SELECT t.id, CAST(len(w) AS BIGINT) AS n_tokens,
        |       coalesce(covagg.n_removed, 0) AS n_removed,
        |       coalesce(keptagg.text_clean, '') AS text_clean
        |FROM toks t LEFT JOIN covagg ON covagg.id = t.id
        |            LEFT JOIN keptagg ON keptagg.id = t.id
        |ORDER BY t.id""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH $nearCorpusSql,
        |$shingleSql,
        |$prunedShinglesSql,
        |${jaccardPairsSql(
          "pruned a JOIN pruned b ON a.shingle = b.shingle AND a.id < b.id")}""".stripMargin,
    "dedup_minhash_signatures" ->
      s"""WITH corpus AS (SELECT doc_id AS id, text FROM documents WHERE doc_id < 20),
        |$shingleSql
        |SELECT id, CAST(seed AS INT) AS seed,
        |       min(((2*seed+1) * (${hash60("shingle")} % 2147483647)
        |            + seed * 2654435761) % 2147483647) AS minhash
        |FROM shingles CROSS JOIN range(8) t(seed)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH $nearCorpusSql,
        |$shingleSql,
        |sig AS (
        |  SELECT id, seed,
        |         min(((2*seed+1) * (${hash60("shingle")} % 2147483647)
        |              + seed * 2654435761) % 2147483647) AS minhash
        |  FROM shingles CROSS JOIN range(16) t(seed) GROUP BY 1, 2),
        |bandkeys AS (
        |  SELECT id, CAST(seed // 4 AS INT) AS band,
        |         string_agg(lpad(CAST(seed AS VARCHAR), 2, '0') || '=' || CAST(minhash AS VARCHAR),
        |                    ',' ORDER BY seed) AS band_key
        |  FROM sig GROUP BY 1, 2),
        |cands AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM bandkeys a JOIN bandkeys b
        |    ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id),
        |${jaccardPairsSql(
          "cands c JOIN shingles a ON a.id = c.id_a JOIN shingles b ON b.id = c.id_b AND b.shingle = a.shingle")}""".stripMargin,
    // serving lookup = the same sig/band/verify replay, restricted to
    // (query ≥ 500000) × (indexed < 500000) pairs; the corpus CTE unions
    // the re-id'd query slice in so one shingle/sig pass covers both sides
    "find_near_dups" ->
      s"""WITH corpus AS (
        |  SELECT doc_id AS id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' zzz9' FROM documents WHERE doc_id < 100
        |  UNION ALL
        |  SELECT doc_id + 500000, text FROM documents WHERE doc_id < 100),
        |$shingleSql,
        |sig AS (
        |  SELECT id, seed,
        |         min(((2*seed+1) * (${hash60("shingle")} % 2147483647)
        |              + seed * 2654435761) % 2147483647) AS minhash
        |  FROM shingles CROSS JOIN range(16) t(seed) GROUP BY 1, 2),
        |bandkeys AS (
        |  SELECT id, CAST(seed // 4 AS INT) AS band,
        |         string_agg(lpad(CAST(seed AS VARCHAR), 2, '0') || '=' || CAST(minhash AS VARCHAR),
        |                    ',' ORDER BY seed) AS band_key
        |  FROM sig GROUP BY 1, 2),
        |cands AS (
        |  SELECT DISTINCT q.id AS query_id, m.id AS match_id
        |  FROM bandkeys q JOIN bandkeys m
        |    ON q.band = m.band AND q.band_key = m.band_key
        |   AND q.id >= 500000 AND m.id < 500000),
        |common AS (
        |  SELECT c.query_id, c.match_id, CAST(count(*) AS BIGINT) AS c
        |  FROM cands c JOIN shingles a ON a.id = c.query_id
        |               JOIN shingles b ON b.id = c.match_id AND b.shingle = a.shingle
        |  GROUP BY 1, 2)
        |SELECT common.query_id, common.match_id,
        |       CAST(common.c AS DOUBLE) / (sa.sz + sb.sz - common.c) AS score
        |FROM common JOIN sizes sa ON sa.id = common.query_id
        |            JOIN sizes sb ON sb.id = common.match_id
        |WHERE CAST(common.c AS DOUBLE) / (sa.sz + sb.sz - common.c) >= 0.5
        |ORDER BY 1, 2""".stripMargin,
    // the exact-fingerprint serving face: md5-of-normalized-tokens
    // equality between queries and the indexed corpus
    "find_exact_dups" ->
      s"""WITH corpus AS (
        |  SELECT doc_id AS id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 100
        |  UNION ALL
        |  SELECT doc_id + 500000, text FROM documents WHERE doc_id < 100),
        |fp AS (
        |  SELECT id, md5(array_to_string(string_split_regex(trim(lower(text)), '\\s+'), ' ')) AS fp
        |  FROM corpus)
        |SELECT q.id AS query_id, m.id AS match_id, CAST(1.0 AS DOUBLE) AS score
        |FROM fp q JOIN fp m ON q.fp = m.fp AND q.id >= 500000 AND m.id < 500000
        |ORDER BY 1, 2""".stripMargin,
    // the SimHash serving face: same 60-bit signature replay as
    // dedup_simhash_pairs (no hot-band drop — the serving indexer has
    // none), restricted to (query ≥ 500000) × (indexed < 500000) pairs,
    // hamming expressed on the score axis (60 − h)/60
    "find_near_dups_simhash" ->
      s"""WITH corpus AS (
        |  SELECT doc_id AS id, text FROM documents WHERE doc_id < 200000
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' zzz9' FROM documents WHERE doc_id < 100
        |  UNION ALL
        |  SELECT doc_id + 500000, text FROM documents WHERE doc_id < 100),
        |toks AS (
        |  SELECT DISTINCT id, unnest(list_distinct($W)) AS tok FROM corpus),
        |hashed AS (SELECT id, ${hash60("tok")} AS h FROM toks),
        |bitsums AS (
        |  SELECT id, b, sum(CASE WHEN (h >> CAST(b AS INT)) % 2 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM hashed CROSS JOIN range(60) t(b) GROUP BY 1, 2),
        |sig AS (
        |  SELECT id, CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
        |                           ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
        |  FROM bitsums GROUP BY 1),
        |bands AS (
        |  SELECT id, simhash, CAST(b AS INT) AS band,
        |         (simhash >> CAST(b * 15 AS INT)) & 32767 AS bkey
        |  FROM sig CROSS JOIN range(4) t(b)),
        |cands AS (
        |  SELECT DISTINCT q.id AS query_id, m.id AS match_id,
        |         q.simhash AS hq, m.simhash AS hm
        |  FROM bands q JOIN bands m ON q.band = m.band AND q.bkey = m.bkey
        |   AND q.id >= 500000 AND m.id < 500000)
        |SELECT query_id, match_id,
        |       CAST(60 - bit_count(xor(hq, hm)) AS DOUBLE) / 60 AS score
        |FROM cands WHERE bit_count(xor(hq, hm)) <= 3 ORDER BY 1, 2""".stripMargin,
    // the embedding sign-LSH serving face at the AUTO plane geometry
    // with the serving-ingest bucket target (256 — see embPlanes): the
    // plane count is recomputed from count(*) with the same
    // clamp(ceil(log2(N/256)), 8, 30) arithmetic and applied as a PREFIX
    // of the embedded 30-plane sign matrix — lshPlaneSigns(p) is a
    // prefix of lshPlaneSigns(30), so the dynamic bucket equals Spark's
    // at every N. Candidates collide in EITHER table, exact cosine
    // ≥ 0.4 verification
    "find_near_dups_emb" ->
      s"""WITH $servePlanesSql,
        |e AS (
        |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000000, CAST(embedding AS DOUBLE[]) FROM embeddings
        |  WHERE vec_id < 50),
        |bkt AS (SELECT id, v, ${bucketAuto(0)} AS b0, ${bucketAuto(1)} AS b1
        |        FROM e, pp),
        |cands AS (
        |  SELECT DISTINCT q.id AS query_id, m.id AS match_id, q.v AS qv, m.v AS mv
        |  FROM bkt q JOIN bkt m ON (q.b0 = m.b0 OR q.b1 = m.b1)
        |   AND q.id >= 1000000000 AND m.id < 1000000000),
        |scored AS (
        |  SELECT query_id, match_id,
        |    list_dot_product(qv, mv)
        |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(mv, mv))) AS score
        |  FROM cands)
        |SELECT query_id, match_id, round(score, 6) AS score
        |FROM scored WHERE score >= 0.4 ORDER BY 1, 2""".stripMargin,
    // components = transitive closure (recursive CTE; the graph is small
    // at oracle SF) over the SAME verified LSH pair set
    "dedup_components" ->
      s"""WITH RECURSIVE $nearCorpusSql,
        |$shingleSql,
        |$minhashReachSql
        |SELECT src AS id, CAST(least(src, min(dst)) AS BIGINT) AS component
        |FROM reach GROUP BY src ORDER BY id""".stripMargin,
    "dedup_resolve_priority" ->
      s"""WITH RECURSIVE $nearCorpusSql,
        |$shingleSql,
        |$minhashReachSql,
        |comp AS (SELECT src AS id, least(src, min(dst)) AS component
        |         FROM reach GROUP BY src),
        |allc AS (SELECT c.id, coalesce(comp.component, c.id) AS component,
        |                len(c.text) AS l
        |         FROM corpus c LEFT JOIN comp ON comp.id = c.id),
        |ranked AS (SELECT id, row_number() OVER
        |             (PARTITION BY component ORDER BY l DESC, id) AS rn
        |           FROM allc)
        |SELECT id FROM ranked WHERE rn = 1 ORDER BY id""".stripMargin,
    "dedup_winnow_pairs" ->
      s"""WITH $nearCorpusSql,
        |sub AS (SELECT id, text FROM corpus WHERE id % 5 = 0),
        |n AS (
        |  SELECT id,
        |    array_to_string(string_split_regex(trim(lower(text)), '\\s+'), ' ') AS norm
        |  FROM sub),
        |g AS (SELECT id, norm, length(norm) - 4 AS ng FROM n),
        |h AS (
        |  SELECT id, ng,
        |    list_transform(range(1, ng + 1),
        |      i -> ${hash60("substr(norm, CAST(i AS INT), 5)")}) AS hs,
        |    norm
        |  FROM g),
        |fp AS (
        |  SELECT id, unnest(CASE WHEN ng >= 4 THEN
        |      list_sort(list_distinct(list_transform(range(1, ng - 2),
        |        j -> list_min(hs[j:j+3]))))
        |    ELSE [${hash60("norm")}] END) AS fp
        |  FROM h),
        |kept AS (
        |  SELECT * FROM fp
        |  WHERE fp NOT IN (SELECT fp FROM fp GROUP BY fp HAVING count(*) > 64))
        |SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS n_shared
        |FROM kept a JOIN kept b ON a.fp = b.fp AND a.id < b.id
        |GROUP BY 1, 2 HAVING count(*) >= 5 ORDER BY 1, 2""".stripMargin,
    "dedup_simhash" ->
      s"""WITH toks AS (
        |  SELECT DISTINCT doc_id AS id, unnest(list_distinct($W)) AS tok
        |  FROM documents WHERE doc_id < 50),
        |hashed AS (SELECT id, ${hash60("tok")} AS h FROM toks),
        |bitsums AS (
        |  SELECT id, b, sum(CASE WHEN (h >> CAST(b AS INT)) % 2 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM hashed CROSS JOIN range(60) t(b) GROUP BY 1, 2)
        |SELECT id, CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
        |                         ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
        |FROM bitsums GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_simhash_pairs" ->
      s"""WITH $nearCorpusSql,
        |toks AS (
        |  SELECT DISTINCT id, unnest(list_distinct($W)) AS tok FROM corpus),
        |hashed AS (SELECT id, ${hash60("tok")} AS h FROM toks),
        |bitsums AS (
        |  SELECT id, b, sum(CASE WHEN (h >> CAST(b AS INT)) % 2 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM hashed CROSS JOIN range(60) t(b) GROUP BY 1, 2),
        |sig AS (
        |  SELECT id, CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
        |                           ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
        |  FROM bitsums GROUP BY 1),
        |bands AS (
        |  SELECT id, simhash, CAST(b AS INT) AS band,
        |         (simhash >> CAST(b * 15 AS INT)) & 32767 AS bkey
        |  FROM sig CROSS JOIN range(4) t(b)),
        |hot AS (SELECT band, bkey FROM bands GROUP BY 1, 2 HAVING count(*) > 64),
        |bands_kept AS (
        |  SELECT bands.* FROM bands LEFT JOIN hot USING (band, bkey)
        |  WHERE hot.band IS NULL),
        |cands AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.simhash AS ha, b.simhash AS hb
        |  FROM bands_kept a JOIN bands_kept b
        |    ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id)
        |SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
        |FROM cands WHERE bit_count(xor(ha, hb)) <= 3 ORDER BY 1, 2""".stripMargin,
    "ann_cosine_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v)
        |      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS sim
        |  FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "dedup_semantic" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |       WHERE vec_id < 20000),
        |cent AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < 16),
        |assigned AS (
        |  SELECT vec_id AS id, v, cid AS list_id FROM (
        |    SELECT e.vec_id, e.v, c.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_dot_product(e.v, c.cv)
        |          / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
        |        DESC, c.cid) AS rn
        |    FROM e CROSS JOIN cent c) WHERE rn = 1),
        |prior AS (
        |  SELECT b.id AS id,
        |    max(list_dot_product(a.v, b.v)
        |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))) AS mps
        |  FROM assigned a JOIN assigned b ON a.list_id = b.list_id AND a.id < b.id
        |  GROUP BY 1)
        |SELECT assigned.id AS id, list_id, round(coalesce(mps, -1.0), 6) AS max_prior_sim,
        |  coalesce(mps, -1.0) < 0.4 AS kept
        |FROM assigned LEFT JOIN prior ON prior.id = assigned.id
        |ORDER BY assigned.id""".stripMargin,
    // the library-default AUTO nlist: recomputed from count(*) with the
    // same clamp(N/1024, 16, 2^18) arithmetic as autoSemanticNlist; the
    // body is the pinned oracle with the centroid bound made dynamic
    "dedup_semantic_auto" ->
      """WITH nn AS (SELECT count(*) AS c FROM embeddings),
        |nl AS (SELECT greatest(16, least(262144, c // 1024)) AS n FROM nn),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cent AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e
        |         WHERE vec_id < (SELECT n FROM nl)),
        |assigned AS (
        |  SELECT vec_id AS id, v, cid AS list_id FROM (
        |    SELECT e.vec_id, e.v, c.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_dot_product(e.v, c.cv)
        |          / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
        |        DESC, c.cid) AS rn
        |    FROM e CROSS JOIN cent c) WHERE rn = 1),
        |prior AS (
        |  SELECT b.id AS id,
        |    max(list_dot_product(a.v, b.v)
        |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))) AS mps
        |  FROM assigned a JOIN assigned b ON a.list_id = b.list_id AND a.id < b.id
        |  GROUP BY 1)
        |SELECT assigned.id AS id, list_id, round(coalesce(mps, -1.0), 6) AS max_prior_sim,
        |  coalesce(mps, -1.0) < 0.4 AS kept
        |FROM assigned LEFT JOIN prior ON prior.id = assigned.id
        |ORDER BY assigned.id""".stripMargin,
    // mirrors Similarity.clusterBalancedSample: assignment exactly as
    // ann_ivf_topk's (cosine DESC, centroid-id tie-break), then a
    // per-cluster row_number in portable md5 id-hash order
    "sample_diversity" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cent AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < 8),
        |assigned AS (
        |  SELECT vec_id, cid AS list_id, round(csim, 6) AS csim FROM (
        |    SELECT e.vec_id, c.cid,
        |      list_dot_product(e.v, c.cv)
        |        / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS csim,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_dot_product(e.v, c.cv)
        |          / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
        |        DESC, c.cid) AS rn
        |    FROM e CROSS JOIN cent c) WHERE rn = 1),
        |ranked AS (
        |  SELECT vec_id, list_id, csim,
        |    CAST(row_number() OVER (PARTITION BY list_id ORDER BY
        |      CAST(('0x' || substr(md5(CAST(vec_id AS STRING)), 1, 15)) AS BIGINT),
        |      vec_id) AS INT) AS rank
        |  FROM assigned)
        |SELECT vec_id, list_id, rank, csim, rank <= 20 AS selected
        |FROM ranked ORDER BY vec_id""".stripMargin,
    "ann_ivf_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |assigned AS (
        |  SELECT vec_id AS neighbor_id, v, cid AS list_id FROM (
        |    SELECT e.vec_id, e.v, c.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_dot_product(e.v, c.cv)
        |          / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
        |        DESC, c.cid) AS rn
        |    FROM e CROSS JOIN cent c) WHERE rn = 1),
        |probes AS (
        |  SELECT query_id, qv, cid AS list_id FROM (
        |    SELECT q.vec_id AS query_id, q.v AS qv, c.cid,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_dot_product(q.v, c.cv)
        |          / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.cv, c.cv)))
        |        DESC, c.cid) AS rn
        |    FROM e q CROSS JOIN cent c WHERE q.vec_id < 10) WHERE rn <= 3),
        |scored AS (
        |  SELECT p.query_id, a.neighbor_id,
        |    list_dot_product(p.qv, a.v)
        |      / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(a.v, a.v))) AS sim
        |  FROM probes p JOIN assigned a ON p.list_id = a.list_id
        |  WHERE p.query_id <> a.neighbor_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // the library-default IVF geometry: nlist/nprobe recomputed from
    // count(*) with autoIvf's clamp arithmetic (nlist = floor(4·√N)
    // clamped [16, 2^18] — floor matches Scala's .toInt truncation —
    // nprobe = max(2, nlist/16)); body identical to the pinned oracle
    // with the two literals made dynamic
    // vec_id < 20000 mirrors the Scala-side parity bound (no-op at oracle
    // SFs) in BOTH the corpus and the count the geometry derives from
    "ann_ivf_topk_auto" ->
      """WITH nn AS (SELECT count(*) AS c FROM embeddings WHERE vec_id < 20000),
        |geo AS (SELECT least(262144, greatest(16, CAST(floor(4 * sqrt(c)) AS INT))) AS nl FROM nn),
        |geo2 AS (SELECT nl, greatest(2, nl // 16) AS np FROM geo),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |      WHERE vec_id < 20000),
        |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < (SELECT nl FROM geo2)),
        |assigned AS (
        |  SELECT vec_id AS neighbor_id, v, cid AS list_id FROM (
        |    SELECT e.vec_id, e.v, c.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_dot_product(e.v, c.cv)
        |          / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
        |        DESC, c.cid) AS rn
        |    FROM e CROSS JOIN cent c) WHERE rn = 1),
        |probes AS (
        |  SELECT query_id, qv, cid AS list_id FROM (
        |    SELECT q.vec_id AS query_id, q.v AS qv, c.cid,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_dot_product(q.v, c.cv)
        |          / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.cv, c.cv)))
        |        DESC, c.cid) AS rn
        |    FROM e q CROSS JOIN cent c WHERE q.vec_id < 10)
        |  WHERE rn <= (SELECT np FROM geo2)),
        |scored AS (
        |  SELECT p.query_id, a.neighbor_id,
        |    list_dot_product(p.qv, a.v)
        |      / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(a.v, a.v))) AS sim
        |  FROM probes p JOIN assigned a ON p.list_id = a.list_id
        |  WHERE p.query_id <> a.neighbor_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // the persisted-index serving row: results identical to the inline
    // auto form by SimilarityIndex's spec-pinned contract, so the oracle
    // is the same dynamic-geometry replay
    "ann_index_ivf_topk" ->
      """WITH nn AS (SELECT count(*) AS c FROM embeddings),
        |geo AS (SELECT least(262144, greatest(16, CAST(floor(4 * sqrt(c)) AS INT))) AS nl FROM nn),
        |geo2 AS (SELECT nl, greatest(2, nl // 16) AS np FROM geo),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < (SELECT nl FROM geo2)),
        |assigned AS (
        |  SELECT vec_id AS neighbor_id, v, cid AS list_id FROM (
        |    SELECT e.vec_id, e.v, c.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_dot_product(e.v, c.cv)
        |          / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
        |        DESC, c.cid) AS rn
        |    FROM e CROSS JOIN cent c) WHERE rn = 1),
        |probes AS (
        |  SELECT query_id, qv, cid AS list_id FROM (
        |    SELECT q.vec_id AS query_id, q.v AS qv, c.cid,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_dot_product(q.v, c.cv)
        |          / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.cv, c.cv)))
        |        DESC, c.cid) AS rn
        |    FROM e q CROSS JOIN cent c WHERE q.vec_id < 10)
        |  WHERE rn <= (SELECT np FROM geo2)),
        |scored AS (
        |  SELECT p.query_id, a.neighbor_id,
        |    list_dot_product(p.qv, a.v)
        |      / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(a.v, a.v))) AS sim
        |  FROM probes p JOIN assigned a ON p.list_id = a.list_id
        |  WHERE p.query_id <> a.neighbor_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "ann_pq_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sl AS (
        |  SELECT vec_id, CAST(s.sub AS INT) AS sub,
        |         v[CAST(s.sub * 16 + 1 AS INT):CAST(s.sub * 16 + 16 AS INT)] AS sv
        |  FROM e CROSS JOIN (SELECT unnest(range(4)) AS sub) s),
        |cb AS (SELECT sub, CAST(vec_id AS INT) AS cid, sv AS cv FROM sl WHERE vec_id < 16),
        |dist AS (
        |  SELECT a.vec_id, a.sub, b.cid,
        |    list_sum(list_transform(range(1, 17),
        |      i -> (a.sv[CAST(i AS INT)] - b.cv[CAST(i AS INT)])
        |         * (a.sv[CAST(i AS INT)] - b.cv[CAST(i AS INT)]))) AS d
        |  FROM sl a JOIN cb b USING (sub)),
        |enc AS (
        |  SELECT vec_id AS neighbor_id, list(cid ORDER BY sub) AS codes FROM (
        |    SELECT vec_id, sub, cid,
        |           row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cid) AS rn
        |    FROM dist) WHERE rn = 1 GROUP BY vec_id),
        |qtab AS (
        |  SELECT vec_id AS query_id, list(d ORDER BY sub, cid) AS tab
        |  FROM dist WHERE vec_id < 10 GROUP BY vec_id),
        |scored AS (
        |  SELECT q.query_id, n.neighbor_id,
        |    list_sum(list_transform(range(4),
        |      s -> q.tab[CAST(s * 16 + n.codes[CAST(s + 1 AS INT)] + 1 AS INT)])) AS adist
        |  FROM enc n CROSS JOIN qtab q
        |  WHERE q.query_id <> n.neighbor_id)
        |SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id, round(adist, 6) AS adist
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY adist, neighbor_id) AS rn FROM scored)
        |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,
    "ann_ivfpq_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cent AS (SELECT vec_id AS ccid, v AS centv FROM e WHERE vec_id < 8),
        |assigned AS (
        |  SELECT vec_id AS id, ccid AS list_id FROM (
        |    SELECT e.vec_id, c.ccid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_dot_product(e.v, c.centv)
        |          / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.centv, c.centv)))
        |        DESC, c.ccid) AS rn
        |    FROM e CROSS JOIN cent c) WHERE rn = 1),
        |probes AS (
        |  SELECT query_id, ccid AS list_id FROM (
        |    SELECT q.vec_id AS query_id, c.ccid,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_dot_product(q.v, c.centv)
        |          / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.centv, c.centv)))
        |        DESC, c.ccid) AS rn
        |    FROM e q CROSS JOIN cent c WHERE q.vec_id < 10) WHERE rn <= 3),
        |sl AS (
        |  SELECT vec_id, CAST(s.sub AS INT) AS sub,
        |         v[CAST(s.sub * 16 + 1 AS INT):CAST(s.sub * 16 + 16 AS INT)] AS sv
        |  FROM e CROSS JOIN (SELECT unnest(range(4)) AS sub) s),
        |cb AS (SELECT sub, CAST(vec_id AS INT) AS cid, sv AS cv FROM sl WHERE vec_id < 16),
        |dist AS (
        |  SELECT a.vec_id, a.sub, b.cid,
        |    list_sum(list_transform(range(1, 17),
        |      i -> (a.sv[CAST(i AS INT)] - b.cv[CAST(i AS INT)])
        |         * (a.sv[CAST(i AS INT)] - b.cv[CAST(i AS INT)]))) AS d
        |  FROM sl a JOIN cb b USING (sub)),
        |enc AS (
        |  SELECT vec_id AS neighbor_id, list(cid ORDER BY sub) AS codes FROM (
        |    SELECT vec_id, sub, cid,
        |           row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cid) AS rn
        |    FROM dist) WHERE rn = 1 GROUP BY vec_id),
        |qtab AS (
        |  SELECT vec_id AS query_id, list(d ORDER BY sub, cid) AS tab
        |  FROM dist WHERE vec_id < 10 GROUP BY vec_id),
        |scored AS (
        |  SELECT q.query_id, n.neighbor_id,
        |    list_sum(list_transform(range(4),
        |      s -> q.tab[CAST(s * 16 + n.codes[CAST(s + 1 AS INT)] + 1 AS INT)])) AS adist
        |  FROM enc n
        |  JOIN assigned a ON a.id = n.neighbor_id
        |  JOIN probes p ON p.list_id = a.list_id
        |  JOIN qtab q ON q.query_id = p.query_id
        |  WHERE q.query_id <> n.neighbor_id)
        |SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id, round(adist, 6) AS adist
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY adist, neighbor_id) AS rn FROM scored)
        |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,
    "ann_lsh_neardup" -> {
      // same ±1 hyperplanes as Similarity.lshSignature (planes=4, dims=64),
      // same left-to-right double summation order
      val bucketExpr = Similarity.lshPlaneSigns(planes = 4, dims = 64).map { plane =>
        val dot = plane.zipWithIndex.map { case (sign, dd) =>
          s"(v[${dd + 1}] * $sign)"
        }.mkString(" + ")
        s"(CASE WHEN ($dot) >= 0 THEN '1' ELSE '0' END)"
      }.mkString(" || ")
      s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |       WHERE vec_id < 20000),
        |bkt AS (SELECT id, v, $bucketExpr AS bucket FROM e),
        |sims AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    list_dot_product(a.v, b.v)
        |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS sim
        |  FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.id < b.id)
        |SELECT id_a, id_b, round(sim, 6) AS sim
        |FROM sims WHERE sim >= 0.4 ORDER BY 1, 2""".stripMargin
    },
    "ann_lsh_banded" -> {
      // both plane tables' ±1 signs embedded (table 0 = the base "p:d"
      // derivation, table 1 = "t1:p:d"); a pair is a candidate when it
      // collides in EITHER table — UNION dedups before the exact verify,
      // mirroring the banded path's (id_a, id_b) aggregate
      def bucketExpr(table: Int) =
        Similarity.lshPlaneSigns(planes = 4, dims = 64, table).map { plane =>
          val dot = plane.zipWithIndex.map { case (sign, dd) =>
            s"(v[${dd + 1}] * $sign)"
          }.mkString(" + ")
          s"(CASE WHEN ($dot) >= 0 THEN '1' ELSE '0' END)"
        }.mkString(" || ")
      s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |       WHERE vec_id < 20000),
        |bkt AS (SELECT id, v, ${bucketExpr(0)} AS b0, ${bucketExpr(1)} AS b1 FROM e),
        |cand AS (
        |  SELECT a.id AS id_a, b.id AS id_b, a.v AS va, b.v AS vb
        |  FROM bkt a JOIN bkt b ON a.b0 = b.b0 AND a.id < b.id
        |  UNION
        |  SELECT a.id, b.id, a.v, b.v
        |  FROM bkt a JOIN bkt b ON a.b1 = b.b1 AND a.id < b.id),
        |sims AS (
        |  SELECT id_a, id_b,
        |    list_dot_product(va, vb)
        |      / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb))) AS sim
        |  FROM cand)
        |SELECT id_a, id_b, round(sim, 6) AS sim
        |FROM sims WHERE sim >= 0.4 ORDER BY 1, 2""".stripMargin
    },
    "emb_near_dup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |           WHERE vec_id < 20000),
        |sims AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_dot_product(a.v, b.v)
        |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS sim
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(sim, 6) AS sim
        |FROM sims WHERE sim >= 0.4 ORDER BY 1, 2""".stripMargin,
    // the library-default AUTO geometry: planes recomputed from count(*)
    // (prefix of the embedded 30-plane matrices), 4 independent tables,
    // pair candidates = collide in ANY table, max() dedup like the
    // Spark side's (id_a, id_b) aggregate
    "ann_lsh_banded_auto" -> {
      val tableJoins = (0 until 4).map(t =>
        s"""  SELECT a.id AS id_a, b.id AS id_b, a.v AS va, b.v AS vb
           |  FROM bkt a JOIN bkt b ON a.b$t = b.b$t AND a.id < b.id""".stripMargin)
        .mkString("\n  UNION\n")
      val buckets = (0 until 4).map(t => s"${bucketAuto(t)} AS b$t").mkString(",\n")
      s"""WITH $autoPlanesSql,
        |e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |bkt AS (SELECT id, v,
        |$buckets
        |FROM e, pp),
        |cand AS (
        |$tableJoins),
        |sims AS (
        |  SELECT id_a, id_b,
        |    list_dot_product(va, vb)
        |      / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb))) AS sim
        |  FROM cand)
        |SELECT id_a, id_b, round(max(sim), 6) AS sim
        |FROM sims WHERE sim >= 0.4 AND NOT isnan(sim)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    "emb_quantize_sq8" ->
      // mirrors Similarity.sq8's non-finite semantics: stats train on
      // FINITE components only, non-finite components code to NULL
      // (dropped from the md5 agg and err_max, kept in n_dims)
      """WITH vals AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
        |         CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |stats AS (SELECT d, min(v) AS mn, max(v) AS mx FROM vals
        |          WHERE isfinite(v) GROUP BY 1),
        |coded AS (
        |  SELECT vec_id, vals.d, v, mn, mx,
        |    CASE WHEN NOT isfinite(v) OR mn IS NULL THEN NULL
        |         WHEN mx = mn THEN 0.0
        |         ELSE least(greatest(floor((v - mn) * 255.0 / (mx - mn) + 0.5),
        |                             0.0), 255.0)
        |    END AS code
        |  FROM vals LEFT JOIN stats ON stats.d = vals.d)
        |SELECT vec_id, CAST(count(*) AS INT) AS n_dims,
        |  md5(string_agg(CAST(CAST(code AS INT) AS VARCHAR), ',' ORDER BY d)) AS codes_md5,
        |  max(CASE WHEN code IS NULL THEN NULL
        |           ELSE abs(v - (mn + code * (mx - mn) / 255.0)) END) AS err_max
        |FROM coded GROUP BY 1 ORDER BY 1""".stripMargin,
    "ann_sq8_topk" ->
      """WITH vals AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
        |         CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |stats AS (SELECT d, min(v) AS mn, max(v) AS mx FROM vals
        |          WHERE isfinite(v) GROUP BY 1),
        |rec0 AS (
        |  SELECT vec_id, list(CASE WHEN NOT isfinite(v) OR mn IS NULL THEN NULL
        |    ELSE mn + (CASE WHEN mx = mn THEN 0.0
        |      ELSE least(greatest(floor((v - mn) * 255.0 / (mx - mn) + 0.5),
        |                          0.0), 255.0)
        |    END) * (mx - mn) / 255.0 END ORDER BY vals.d) AS rv
        |  FROM vals LEFT JOIN stats ON stats.d = vals.d GROUP BY 1),
        |rec AS (SELECT * FROM rec0
        |        WHERE len(list_filter(rv, x -> x IS NULL)) = 0),
        |q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS qv
        |      FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.vec_id AS query_id, rec.vec_id AS neighbor_id,
        |    list_dot_product(q.qv, rec.rv)
        |      / (sqrt(list_dot_product(q.qv, q.qv))
        |         * sqrt(list_dot_product(rec.rv, rec.rv))) AS sim
        |  FROM q JOIN rec ON q.vec_id <> rec.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY sim DESC, neighbor_id) AS INT) AS rank
        |  FROM scored WHERE NOT isnan(sim))
        |SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  )
}
