package graft.analytics

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DataType, LongType, StructType}
import org.apache.spark.storage.StorageLevel

/** Streaming face of corpus near-dup resolution: banded candidate
  * generation + connected components + canonical-representative pruning,
  * run incrementally inside `foreachBatch` against accumulating state
  * tables — the shape a production ingestion pipeline wants ("resolve the
  * corpus as it arrives").
  *
  * Incremental by construction — per-batch work is bounded by the BATCH
  * and the components it touches, never by the accumulated corpus:
  *
  *  - documents are shingled/hashed ONCE, on arrival. Their band postings
  *    and verification sketches persist in state tables; later batches
  *    probe those tables instead of recomputing history (the pre-r11 form
  *    re-signatured the whole corpus every micro-batch).
  *  - the posting probe is BOUNDED, not history-proportional: the
  *    accumulated index is periodically folded into a bk-SORTED compacted
  *    snapshot (`indexc/`, see [[compactState]]), and each batch probes it
  *    with its own bounded band-key set pushed down as an eq-list filter
  *    (≤ |batch|·bands longs). Row-group/page stats on the sorted bk
  *    column skip everything outside the probed keys, so the probe reads
  *    O(|batch| · granule) bytes — independent of corpus size — instead
  *    of scanning every posting ever written. Only the small uncompacted
  *    tail (batches since the last compaction) is scanned whole.
  *  - component labels update incrementally: the prior (member →
  *    representative) label table IS a spanning contraction of every edge
  *    seen so far, so unioning it (as edges) with just the new batch's
  *    edges and re-running [[Dedup.connectedComponents]] yields exactly
  *    the components of the full edge history. The input is pair-graph
  *    sized (dup members + new edges), not corpus sized.
  *  - the resolved corpus is maintained as APPEND-ONLY DELTAS: each batch
  *    appends just the ids that NEWLY became dropped (bounded by the
  *    touched components) to `drops/`; [[resolvedCorpus]] reads docs ∖
  *    drops, and [[compactResolved]] materializes that view on demand
  *    (a maintenance op, like scavenge — never on the batch path).
  *    Representatives are min-id, so drops are MONOTONE (a component's
  *    min only decreases as components merge) — a delta log never needs
  *    a retraction.
  *
  * Per-batch cost: compute is O(|batch|) (index the new docs) plus the
  * touched-component maintenance; probe/verification reads are bounded by
  * the batch's band keys / pair participants via sorted-snapshot pushdown.
  * The label snapshot read remains pair-graph sized (dup'd docs, not
  * corpus), the accepted term. State-file growth is handled by the same
  * compaction: [[compactState]] folds the per-batch `index/`, `sketch/`
  * and `drops/` partitions into single sorted snapshots on a cadence
  * (`compactEvery`), so file listings stay proportional to the snapshot
  * count, not the batch count. `docs/` accrues one partition per batch
  * like any ingest log — [[compactResolved]] (or EventLogStore-style file
  * compaction) is the read-side answer there.
  *
  * State layout under `stateDir` (all plain parquet):
  *  - `docs/`    — every document, partitioned by arrival batch;
  *  - `index/`   — (id, bk) band postings, partitioned by arrival batch;
  *                 `bk` = xxhash64(band index, band key), so equality is
  *                 band-scoped; hash collisions only ADD candidates, which
  *                 exact verification then rejects;
  *  - `indexc/`  — compacted postings snapshot, range-partitioned +
  *                 sorted by `bk` under `_upto=N` (N = last folded batch),
  *                 committed via the same atomic `_committed_N` marker
  *                 protocol as labels;
  *  - `sketch/`  — (id, sk) verification sketches, partitioned by arrival
  *                 batch, range-partitioned + sorted by id inside each
  *                 partition so pair verification fetches participants via
  *                 row-group-pruned id pushdown instead of a corpus scan;
  *  - `sketchc/` — compacted sketch snapshot, sorted by id, `_upto=N`;
  *  - `labels/`  — current (id, component) for every doc in a non-trivial
  *                 component — one snapshot per batch under `_batch=N`,
  *                 made live by an atomic `_committed_N` marker AFTER the
  *                 write job commits, then superseded snapshots are pruned
  *                 (a crash mid-write leaves the previous committed
  *                 snapshot intact and live);
  *  - `drops/`   — (id) newly-dropped per batch, partitioned by the batch
  *                 that dropped them;
  *  - `dropsc/`  — compacted drops snapshot, sorted by id, `_upto=N`;
  *  - `resolved/` — [[compactResolved]]'s materialization (optional);
  *  - `_docs_schema.json` — the document schema, written on the first
  *    batch so [[resolvedCorpus]] can answer with the REAL schema even
  *    when every batch so far was empty.
  *
  * Restart safety: docs/index/sketch/drops writes are DYNAMIC partition
  * overwrites keyed on the micro-batch id, so a replayed batch rewrites
  * exactly its own partitions; labels commit via the marker protocol
  * above, and drops are written BEFORE the label commit so a replay that
  * reads the pre-batch labels recomputes the identical delta (and a
  * replay that reads the post-commit labels computes an EMPTY delta,
  * which dynamic overwrite turns into a no-op, preserving the committed
  * partition). Re-adding an already-absorbed edge to the label graph is
  * a no-op by CC idempotence, so a crash at ANY point between writes
  * replays cleanly. Compaction is likewise crash-safe: the snapshot
  * commits via its marker BEFORE the folded per-batch partitions are
  * deleted, and every reader takes `snapshot ∪ (per-batch partitions
  * AFTER the snapshot watermark)` — a crash between marker and deletion
  * leaves already-folded partitions on disk, which the watermark filter
  * excludes and the next compaction re-deletes. `StreamingSpec` asserts
  * streaming == one-shot batch [[Dedup.resolveNearDups]] across restarts,
  * including a later batch with a smaller id dethroning an earlier
  * batch's representative, with and without a compaction cadence. */
object DedupStream {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Banded near-dup indexer: everything the incremental resolver needs to
    * know about a similarity family. `index` emits one row per document —
    * (id: long, sk, band_keys: array<string>) — where two documents are
    * CANDIDATES iff they share any (band position, band key), and `score`
    * is the exact similarity over two `sk` sketches that candidates must
    * pass. Band keys gate recall; `score` gates precision — collisions in
    * the banding are harmless. */
  trait BandIndexer extends Serializable {
    def index(docs: DataFrame): DataFrame
    def score(a: Column, b: Column): Column
    def threshold: Double
  }

  /** MinHash-LSH instance: identical geometry (k hashes in `bands` bands)
    * and exact-Jaccard verification to the batch [[Dedup.minhashLshPairs]],
    * so the streaming resolution provably matches the one-shot batch run
    * over the same documents. */
  final case class MinHashIndexer(threshold: Double, k: Int = 16, bands: Int = 4,
      textCol: String = "text", idCol: String = "doc_id", n: Int = 3) extends BandIndexer {
    require(k % bands == 0, "k must divide into bands")
    def index(docs: DataFrame): DataFrame = {
      val rows = k / bands
      val sig = Dedup.minhashSigArrays(docs, k, textCol, idCol, n)
      val bandKeyArr = array((0 until bands).map { b =>
        concat_ws(",", (0 until rows).map(r => col("sig")(b * rows + r)): _*)
      }: _*)
      sig.select(col("id").cast("long").as("id"), col("sh").as("sk"),
        bandKeyArr.as("band_keys"))
    }
    def score(a: Column, b: Column): Column = {
      val common = size(array_intersect(a, b))
      common.cast("double") / (size(a) + size(b) - common)
    }
  }

  /** SimHash instance: 60-bit token-weighted signature, band keys =
    * `bands` equal bit-slices (pigeonhole: any pair at hamming ≤ bands−1
    * shares an unchanged slice, so recall to that radius is EXACT — same
    * guarantee as [[Dedup.simhashNearDupPairs]], whose geometry this
    * mirrors), sketch = the signature itself (8 bytes/doc — the cheapest
    * sketch of the three families). Hamming verification is expressed on
    * the score-is-similarity axis the resolver contract wants:
    * score = (60 − hamming)/60, threshold = (60 − maxHamming)/60 — both
    * sides divide the same small-int numerator by 60, so the ≥ compare is
    * exactly hamming ≤ maxHamming (no float-boundary slack). */
  final case class SimHashIndexer(maxHamming: Int, bands: Int = 4,
      textCol: String = "text", idCol: String = "doc_id") extends BandIndexer {
    require(60 % bands == 0, "bands must divide 60")
    require(maxHamming <= bands - 1,
      s"banding with $bands bands only guarantees recall to hamming ${bands - 1}")
    def index(docs: DataFrame): DataFrame = {
      val bandBits = 60 / bands
      val mask = (1L << bandBits) - 1
      val keys = array((0 until bands).map { b =>
        call_function("shiftright", col("simhash"), lit(b * bandBits))
          .bitwiseAND(lit(mask)).cast("string")
      }: _*)
      Dedup.simhash(docs, textCol, idCol)
        .select(col("id").cast("long").as("id"), col("simhash").as("sk"),
          keys.as("band_keys"))
    }
    def score(a: Column, b: Column): Column =
      (lit(60) - bit_count(a.bitwiseXOR(b)).cast("int")).cast("double") / lit(60.0)
    def threshold: Double = (60.0 - maxHamming) / 60.0
  }

  /** Exact-duplicate instance: band key AND sketch are both the
    * [[graft.functions.TextFunctions.fingerprint]] (md5 of
    * whitespace-normalized lowercased tokens — the SAME key
    * [[Dedup.exact]] groups by, so the streaming resolution provably
    * matches the batch exact dedup), verification is fingerprint
    * equality (score 1 or 0). The cheapest family end to end: one
    * narrow hash per document, candidates only on exact key collision,
    * 32-byte sketches. */
  final case class ExactIndexer(textCol: String = "text",
      idCol: String = "doc_id") extends BandIndexer {
    def index(docs: DataFrame): DataFrame = {
      val fp = graft.functions.TextFunctions.fingerprint(col(textCol))
      docs.select(col(idCol).cast("long").as("id"), fp.as("sk"),
        array(fp).as("band_keys"))
    }
    def score(a: Column, b: Column): Column =
      when(a === b, lit(1.0)).otherwise(lit(0.0))
    def threshold: Double = 1.0
  }

  /** Embedding sign-LSH instance: band keys = one random-hyperplane
    * signature per table ([[Similarity.lshSignature]]'s deterministic ±1
    * planes — table t is an independent plane set, so candidates collide
    * in ANY table, the OR-construction recall repair), sketch = the
    * full-precision vector, verification = exact cosine. `dims` > 0
    * fixes the plane geometry up front (the serving/streaming path —
    * zero per-call driver work); `dims` = 0 infers it from each incoming
    * frame's first non-null vector, at the cost of ONE bounded driver
    * job per index() call (an empty batch indexes empty with a
    * placeholder geometry — no rows, no postings). Mixed-dims corpora
    * are a caller error. NaN cosine (zero-norm vectors from failed
    * encoders) maps to −1 so Spark's NaN-is-largest ordering can never
    * verify a degenerate pair. */
  final case class CosineLshIndexer(threshold: Double, planes: Int = 8,
      tables: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding", dims: Int = 0) extends BandIndexer {
    def index(vectors: DataFrame): DataFrame = {
      val d = if (dims > 0) dims
        else vectors.where(col(vecCol).isNotNull)
          .select(size(col(vecCol)).as("d")).limit(1).collect()
          .headOption.map(_.getInt(0)).getOrElse(1)
      vectors
        .select(col(idCol).cast("long").as("id"),
          col(vecCol).cast("array<double>").as("sk"))
        .select(col("id"), col("sk"), array((0 until tables).map(t =>
          Similarity.lshSignature(col("sk"), d, planes, t)): _*).as("band_keys"))
    }
    def score(a: Column, b: Column): Column = {
      val c = Similarity.cosine(a, b)
      when(isnan(c), lit(-1.0)).otherwise(c)
    }
  }

  /** Above this many ids, point lookups switch from a driver-collected
    * parquet-pushdown read (chunked eq-lists with row-group pruning on
    * the sorted state files, [[ParquetPushdown.inSorted]]) to a
    * distributed semi-join — the same cap-gated trade as
    * [[Dedup.incrementalNew]]'s bloom gate. */
  val PushdownMaxIds: Long = 10000L

  /** Cap on the per-batch band-key pushdown list (≥ PushdownMaxIds: a
    * batch emits `bands` postings per doc, so its distinct-bk set runs
    * several times its doc count; 32k keys = 32 chunked scans, still a
    * bounded read). Micro-batches whose bk set exceeds this fall back to
    * scanning the posting snapshot — if batches that large are routine,
    * split the ingest into smaller triggers (maxFilesPerTrigger) or move
    * postings into a band-keyed RocksDB state store. */
  val PushdownMaxKeys: Long = 32000L

  private val indexDataSchema = StructType.fromDDL("id LONG, bk LONG")
  private val dropsDataSchema = StructType.fromDDL("id LONG")
  private val dropsSchema = StructType.fromDDL("id LONG, _batch LONG")

  /** Per-batch disk-read telemetry, keyed by stateDir — a LOCAL-MODE
    * probe aid: in `local[*]` the hadoop `file`-scheme statistics
    * aggregate every task's reads in this JVM, so the deltas around the
    * probe/verify actions are exactly their bytes read. On a real cluster
    * executor reads are invisible to the driver's counters, so this stays
    * a test/probe instrument, not an API. OFF by default: probes opt in
    * via [[ioStatsEnabled]], so the production batch path does no
    * JVM-global counter reads — and note the counters are still JVM-wide,
    * so a probe run must not share the JVM with other file-reading jobs
    * (the per-stateDir keying isolates concurrent STREAMS' results, not
    * their reads). */
  final case class BatchIoStats(batchId: Long, probeBytes: Long, verifyBytes: Long)
  @volatile private[graft] var ioStatsEnabled: Boolean = false
  private val ioStats =
    new java.util.concurrent.ConcurrentHashMap[String, BatchIoStats]()
  private[graft] def lastIoStats(stateDir: String): Option[BatchIoStats] =
    Option(ioStats.get(stateDir))

  /** Raw `file`-scheme bytes-read counter, for probes measuring a phase
    * that has no built-in instrumentation (e.g. the serving path). */
  private[graft] def fsBytesReadNow(): Long = fsBytesRead()

  private def fsBytesRead(): Long = {
    val s = org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics.get("file")
    if (s == null) 0L else {
      val v = s.getLong("bytesRead")
      if (v == null) 0L else v.longValue()
    }
  }

  /** Start the incremental resolver. `compactEvery` > 0 folds the
    * per-batch state partitions into sorted snapshots every that many
    * batches ([[compactState]]) — the cadence that keeps both the probe
    * scan and the state-file count bounded on a long-lived stream (set it,
    * e.g. 16, on any stream expected to outlive a few dozen batches). The
    * default is 0 — compaction left to explicit maintenance calls —
    * because the cadence activates the reader contract below, which
    * existing callers must OPT INTO, not trip over.
    *
    * Reader contract (when compaction runs, in-stream or explicit): like
    * every file-listing-based view, a [[resolvedCorpus]] DataFrame built
    * BEFORE a compaction may list per-batch partitions the fold then
    * deletes — executing it after the fold fails on missing files (or,
    * under ignoreMissingFiles, silently resurrects dropped ids). Treat
    * resolved views as snapshots: rebuild them after maintenance, or
    * consume the stable [[compactResolved]] materialization; the
    * in-stream cadence itself is single-writer-safe (the fold runs inside
    * the micro-batch, after the state writes). */
  def resolveNearDupsStream(docs: DataFrame, stateDir: String, checkpoint: String,
      indexer: BandIndexer, idCol: String = "doc_id",
      compactEvery: Int = 0): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, stateDir, indexer, idCol, compactEvery)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  private[graft] def processBatch(batch: DataFrame, batchId: Long, stateDir: String,
      indexer: BandIndexer, idCol: String, compactEvery: Int = 0): Unit = {
    val spark = batch.sparkSession
    // REPLAY GUARD: the label marker is the LAST write of a batch, so a
    // committed marker for this batchId means every state write below
    // already completed — the crash was between our commit and the
    // streaming checkpoint's. Without the guard, writeLabels would
    // overwrite the live committed snapshot IN PLACE (its predecessor is
    // already pruned), so a second crash mid-overwrite leaves a partial
    // snapshot under a marker that vouches for it. (The drops delta is
    // safe either way: against this batch's own committed labels it
    // recomputes as EMPTY, and a zero-row dynamic overwrite writes no
    // partitions — a no-op, per the header's crash-safety note.)
    if (latestCommitted(s"$stateDir/labels").exists(_ >= batchId)) {
      log.warn(s"DedupStream: skipping micro-batch $batchId — $stateDir already has a " +
        "committed label snapshot at or past it. Expected ONCE after a crash replay; if " +
        "every batch logs this, the stateDir is being reused with a FRESH checkpoint dir " +
        "(batch ids restarted at 0) and new data is silently not being ingested.")
      return
    }
    // reads use EXPLICIT schemas: a batch can legally write zero rows
    // (no documents, or no new near-dup pairs), and schema inference over
    // a parquet dir with no data files throws UNABLE_TO_INFER_SCHEMA
    def readAs(path: String, schema: StructType) = spark.read.schema(schema).parquet(path)
    def writePart(df: DataFrame, path: String): Unit =
      df.withColumn("_batch", lit(batchId))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch").parquet(path)
    def partSchema(df: DataFrame): StructType = df.withColumn("_batch", lit(batchId)).schema

    // 0. pin the document schema once, so the resolved view of an
    //    all-empty stream can still answer with the real shape
    val schemaMarker = Paths.get(s"$stateDir/_docs_schema.json")
    if (!Files.exists(schemaMarker)) {
      Files.createDirectories(Paths.get(stateDir))
      Files.write(schemaMarker,
        batch.schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }

    // 1. this batch's documents land in their own arrival partition
    writePart(batch, s"$stateDir/docs")

    // 2. index the NEW documents — the only shingling this batch pays
    val idx = indexer.index(batch).persist(StorageLevel.MEMORY_AND_DISK)
    val postingsNew = idx
      .select(col("id"), posexplode(col("band_keys")).as(Seq("band", "band_key")))
      .select(col("id"), xxhash64(col("band"), col("band_key")).as("bk"))
    writePart(postingsNew, s"$stateDir/index")
    val sketchNew = idx.select(col("id"), col("sk"))
    writePart(sketchNew.repartitionByRange(col("id")).sortWithinPartitions(col("id")),
      s"$stateDir/sketch")

    // 3. probe: new postings against the ACCUMULATED index (which now
    //    includes this batch, so same-batch pairs surface too). Every pair
    //    is discovered exactly when its later document arrives, so the
    //    union of per-batch edges equals the one-shot batch pair set.
    //    The accumulated index = the bk-sorted compacted snapshot, PRUNED
    //    to this batch's bounded bk set (eq-list pushdown → row-group/page
    //    skipping on the sorted bk column), ∪ the uncompacted per-batch
    //    tail. Pruning the snapshot to the probe keys is semantics-free:
    //    the join is an equality on bk, so rows outside the new batch's
    //    bk set can never match.
    val (idxUpto, idxSnap) = readSnapshot(spark, s"$stateDir/indexc", indexDataSchema)
    val tailPostings = readAs(s"$stateDir/index", partSchema(postingsNew))
      .where(col("_batch") > idxUpto).drop("_batch")
    val bkCapped = postingsNew.select(col("bk")).distinct()
      .limit(PushdownMaxKeys.toInt + 1).collect().map(_.getLong(0)).toSeq
    val idxSnapPruned =
      if (bkCapped.size <= PushdownMaxKeys)
        ParquetPushdown.inSorted(idxSnap, "bk", bkCapped)
      else idxSnap // cap-gated fallback: the equi-join itself still filters
    val allPostings = idxSnapPruned.unionAll(tailPostings)
    val ioProbe0 = if (ioStatsEnabled) fsBytesRead() else 0L
    val cands = postingsNew.as("a").join(allPostings.as("b"),
        col("a.bk") === col("b.bk") && col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .distinct()
      .localCheckpoint(true)
    val ioProbe1 = if (ioStatsEnabled) fsBytesRead() else 0L

    // 4. exact verification, fetching sketches for pair PARTICIPANTS only
    //    — from the id-sorted compacted sketch snapshot ∪ the tail, with
    //    the participant ids pushed down the same way
    val skSchema = partSchema(sketchNew)
    val partnerIds = cands.select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    val (skUpto, skSnap) = readSnapshot(spark, s"$stateDir/sketchc", sketchNew.schema)
    val skAll = skSnap.unionAll(
      readAs(s"$stateDir/sketch", skSchema).where(col("_batch") > skUpto).drop("_batch"))
    // one bounded collect answers both "how many" and "which": a
    // separate count() pays a second full job over the distinct-id set
    // on every micro-batch just to pick the branch
    val partnersCapped = partnerIds.limit(PushdownMaxIds.toInt + 1)
      .collect().map(_.getLong(0)).toSeq
    val skTbl =
      if (partnersCapped.size <= PushdownMaxIds)
        ParquetPushdown.inSorted(skAll, "id", partnersCapped)
      else skAll.join(partnerIds, "id")
    val newEdges = cands
      .join(skTbl.select(col("id").as("id_a"), col("sk").as("sk_a")), "id_a")
      .join(skTbl.select(col("id").as("id_b"), col("sk").as("sk_b")), "id_b")
      .where(indexer.score(col("sk_a"), col("sk_b")) >= indexer.threshold)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint(true)
    if (ioStatsEnabled) ioStats.put(stateDir,
      BatchIoStats(batchId, ioProbe1 - ioProbe0, fsBytesRead() - ioProbe1))
    idx.unpersist()

    // 5. incremental components: prior labels are a spanning contraction
    //    of all prior edges, so labels-as-edges ∪ new edges has exactly
    //    the components of the full history — pair-graph sized input
    val prior = latestLabels(spark, s"$stateDir/labels")
    val labelEdges = prior.where(col("id") =!= col("component"))
      .select(col("component").as("id_a"), col("id").as("id_b"))
    val comp = Dedup.connectedComponents(labelEdges.unionAll(newEdges))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // 6. drops delta: members of components TOUCHED by this batch's edges
    //    that became non-representatives and were not dropped before —
    //    bounded by the touched components, and written BEFORE the label
    //    commit (see the restart-safety note in the header)
    val endpoints = newEdges.select(col("id_a").as("id"))
      .unionAll(newEdges.select(col("id_b").as("id"))).distinct()
    val touched = comp.join(endpoints, "id").select(col("component")).distinct()
    val droppedTouched = comp.join(touched, "component")
      .where(col("id") =!= col("component")).select(col("id"))
    val priorDropped = prior.where(col("id") =!= col("component")).select(col("id"))
    writePart(droppedTouched.join(priorDropped, Seq("id"), "left_anti"),
      s"$stateDir/drops")
    writeSnapshot(s"$stateDir/labels", comp.repartitionByRange(col("id")), batchId, "_batch")
    // comp is BOTH a CacheManager persist (line above) and — on the
    // distributed path — a localCheckpoint root from connectedComponents:
    // unpersist() releases only the former; the checkpoint RDD blocks
    // must be dropped explicitly or they stack one per micro-batch until
    // a driver GC (the exact class the cands/newEdges drops below fix).
    // On the small-graph union-find path the plan is a LocalRelation and
    // dropLocalCheckpoint is a no-op.
    comp.unpersist()
    org.apache.spark.sql.graftbridge.Bridge.dropLocalCheckpoint(comp)
    // the per-batch candidate/edge checkpoints are fully consumed by the
    // writes above — release their blocks NOW. Left to the ContextCleaner
    // they survive until an arbitrary driver GC (measured: 167 MB of dead
    // ingest checkpoints held across ~70 subsequent queries at sf0.1), and
    // a long-running ingest stream would stack one pair per micro-batch.
    org.apache.spark.sql.graftbridge.Bridge.dropLocalCheckpoint(cands)
    org.apache.spark.sql.graftbridge.Bridge.dropLocalCheckpoint(newEdges)
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
      compactState(spark, stateDir)
  }

  /** Point-lookup SERVING path against the accumulated near-dup state:
    * which already-indexed documents are near-duplicates of each query
    * document? The query docs are indexed locally (nothing is written),
    * their band keys probe the compacted posting snapshot through the
    * same bounded eq-list pushdown the ingest batch uses — bytes scale
    * with |queries| × bands × page granule, never with corpus size — and
    * exact verification fetches only the candidate matches' sketches by
    * id pushdown. Returns (query_id, match_id, score); `resolvedOnly`
    * restricts matches to current component representatives (docs ∖
    * drops). This is the contamination-check / "is this document already
    * in the corpus" lookup, served from plain parquet state. Query ids
    * only label output rows — an id equal to an indexed id is treated as
    * a different document (no self-suppression beyond id inequality). */
  def findNearDups(spark: SparkSession, stateDir: String, queryDocs: DataFrame,
      indexer: BandIndexer, resolvedOnly: Boolean = false): DataFrame = {
    def tableOr(path: String, schema: StructType): DataFrame =
      if (hasParquetFiles(path)) spark.read.schema(schema).parquet(path)
      else spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)
    val idx = indexer.index(queryDocs).localCheckpoint(true)
    val postingsQ = idx
      .select(col("id"), posexplode(col("band_keys")).as(Seq("band", "band_key")))
      .select(col("id"), xxhash64(col("band"), col("band_key")).as("bk"))
    val (idxUpto, idxSnap) = readSnapshot(spark, s"$stateDir/indexc", indexDataSchema)
    val tailPostings = tableOr(s"$stateDir/index", indexDataSchema.add("_batch", LongType))
      .where(col("_batch") > idxUpto).drop("_batch")
    val bkCapped = postingsQ.select(col("bk")).distinct()
      .limit(PushdownMaxKeys.toInt + 1).collect().map(_.getLong(0)).toSeq
    val idxSnapPruned =
      if (bkCapped.size <= PushdownMaxKeys)
        ParquetPushdown.inSorted(idxSnap, "bk", bkCapped)
      else idxSnap
    val allPostings = idxSnapPruned.unionAll(tailPostings)
    val candQ = postingsQ.as("q").join(allPostings.as("m"),
        col("q.bk") === col("m.bk") && col("q.id") =!= col("m.id"))
      .select(col("q.id").as("query_id"), col("m.id").as("match_id"))
      .distinct()
      .localCheckpoint(true)
    val skData = StructType(idx.select(col("id"), col("sk")).schema)
    val (skUpto, skSnap) = readSnapshot(spark, s"$stateDir/sketchc", skData)
    val skAll = skSnap.unionAll(
      tableOr(s"$stateDir/sketch", skData.add("_batch", LongType))
        .where(col("_batch") > skUpto).drop("_batch"))
    val matchIds = candQ.select(col("match_id").as("id")).distinct()
    val matchesCapped = matchIds.limit(PushdownMaxIds.toInt + 1)
      .collect().map(_.getLong(0)).toSeq
    val skM =
      if (matchesCapped.size <= PushdownMaxIds)
        ParquetPushdown.inSorted(skAll, "id", matchesCapped)
      else skAll.join(matchIds, "id")
    val verified = candQ
      .join(idx.select(col("id").as("query_id"), col("sk").as("sk_q")), "query_id")
      .join(skM.select(col("id").as("match_id"), col("sk").as("sk_m")), "match_id")
      .withColumn("score", indexer.score(col("sk_q"), col("sk_m")))
      .where(col("score") >= indexer.threshold)
      .select(col("query_id"), col("match_id"), col("score"))
    if (!resolvedOnly) verified
    else {
      val (dUpto, dSnap) = readSnapshot(spark, s"$stateDir/dropsc", dropsDataSchema)
      val dTail = tableOr(s"$stateDir/drops", dropsSchema)
        .where(col("_batch") > dUpto).drop("_batch")
      verified.join(dSnap.unionAll(dTail).select(col("id").as("match_id")),
        Seq("match_id"), "left_anti")
    }
  }

  /** Fold the accumulated per-batch `index/`, `sketch/` and `drops/`
    * partitions into single SORTED snapshots (`indexc/` by bk, `sketchc/`
    * and `dropsc/` by id) and delete the folded per-batch partitions —
    * the maintenance op that keeps the per-batch probe bounded (sorted
    * snapshot + eq-list pushdown) and the state-file count flat on a
    * long-lived stream. Runs automatically on the `compactEvery` cadence
    * or explicitly, any time; crash-safe per the header (snapshot marker
    * commits before the folded partitions are deleted; readers exclude
    * already-folded partitions by the snapshot watermark). Only batches
    * with a COMMITTED label snapshot are folded, so a crash-replayed
    * batch never finds its partitions half-owned by a snapshot. */
  def compactState(spark: SparkSession, stateDir: String): Unit =
    latestCommitted(s"$stateDir/labels").foreach { upto =>
      compactTable(spark, s"$stateDir/index", s"$stateDir/indexc", "bk", upto)
      compactTable(spark, s"$stateDir/sketch", s"$stateDir/sketchc", "id", upto)
      compactTable(spark, s"$stateDir/drops", s"$stateDir/dropsc", "id", upto)
    }

  /** Whether a state dir holds any parquet data file (shared with
    * [[SimilarityIndex]] — one source of truth for the idiom). */
  private[analytics] def hasParquetFiles(dir: String): Boolean = {
    val p = Paths.get(dir)
    Files.exists(p) && {
      val w = Files.walk(p)
      try w.iterator().asScala.exists(_.getFileName.toString.endsWith(".parquet"))
      finally w.close()
    }
  }

  /** Fold `srcDir`'s per-batch partitions with ids in (current snapshot
    * watermark, upto] into a new sorted snapshot at `dstDir/_upto=upto`,
    * then delete the folded source partitions. */
  private def compactTable(spark: SparkSession, srcDir: String, dstDir: String,
      sortCol: String, upto: Long): Unit = {
    if (!hasParquetFiles(srcDir)) return // nothing new to fold
    val full = spark.read.parquet(srcDir) // schema from files (sk is indexer-typed)
    val dataSchema = StructType(full.schema.filterNot(_.name == "_batch"))
    val (curUpto, cur) = readSnapshot(spark, dstDir, dataSchema)
    if (curUpto < upto) {
      val tail = full.where(col("_batch") > curUpto && col("_batch") <= upto).drop("_batch")
      writeSnapshot(dstDir,
        cur.unionByName(tail).repartitionByRange(col(sortCol))
          .sortWithinPartitions(col(sortCol)),
        upto, "_upto")
    }
    // delete folded per-batch partitions (≤ the LIVE snapshot watermark —
    // covers both this fold and leftovers from a crash after a previous
    // fold's marker commit)
    latestCommitted(dstDir).foreach { live =>
      val d = Paths.get(srcDir)
      if (Files.exists(d)) {
        val s = Files.list(d)
        try s.iterator().asScala.toList.foreach { p =>
          val nm = p.getFileName.toString
          if (nm.startsWith("_batch=") &&
              nm.stripPrefix("_batch=").toLongOption.exists(_ <= live)) deleteRec(p)
        } finally s.close()
      }
    }
  }

  /** The latest COMMITTED snapshot of a `_upto=`-partitioned compacted
    * view: (watermark, data) — (-1, empty) before the first compaction. */
  private def readSnapshot(spark: SparkSession, dir: String,
      dataSchema: StructType): (Long, DataFrame) =
    latestCommitted(dir) match {
      case None => (-1L, spark.createDataFrame(
        java.util.Collections.emptyList[Row](), dataSchema))
      case Some(k) => (k,
        spark.read.schema(dataSchema.add("_upto", LongType)).parquet(dir)
          .where(col("_upto") === k).drop("_upto"))
    }

  /** The current resolved corpus — one min-id representative per near-dup
    * component: `docs/` minus the accumulated `drops/` deltas (compacted
    * snapshot ∪ tail). A view, not a scan-and-rewrite: the anti-join's
    * drop side is the (small) dropped id set, so reading the resolution
    * costs one broadcast-shaped anti-join over the corpus. */
  def resolvedCorpus(spark: SparkSession, stateDir: String,
      idCol: String = "doc_id"): DataFrame = {
    // a stream whose batches were ALL empty leaves docs/ with no data
    // files (dynamic partitionBy writes no partition for zero rows) and
    // schema inference would throw; the resolved view of nothing is an
    // empty corpus with the schema pinned by the first processed batch's
    // `_docs_schema.json` marker (pre-marker state dirs fall back to a
    // single LONG idCol — the only shape recoverable from nothing)
    if (!hasParquetFiles(s"$stateDir/docs")) {
      val marker = Paths.get(s"$stateDir/_docs_schema.json")
      if (Files.exists(marker)) {
        val schema = DataType.fromJson(new String(Files.readAllBytes(marker),
          java.nio.charset.StandardCharsets.UTF_8)).asInstanceOf[StructType]
        return spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)
      }
      import spark.implicits._
      return Seq.empty[Long].toDF(idCol)
    }
    val docs = spark.read.parquet(s"$stateDir/docs")
    val (dropsUpto, dropsSnap) = readSnapshot(spark, s"$stateDir/dropsc", dropsDataSchema)
    val dropTail = spark.read.schema(dropsSchema).parquet(s"$stateDir/drops")
      .where(col("_batch") > dropsUpto).drop("_batch")
    val drops = dropsSnap.unionAll(dropTail).select(col("id").as("_drop_id"))
    docs.join(drops, docs(idCol).cast("long") === col("_drop_id"), "left_anti")
      .drop("_batch")
  }

  /** Materialize [[resolvedCorpus]] under `stateDir/resolved` — an
    * on-demand maintenance/compaction op for consumers that want the
    * resolution as plain files, never part of the per-batch path. */
  def compactResolved(spark: SparkSession, stateDir: String,
      idCol: String = "doc_id"): Unit =
    resolvedCorpus(spark, stateDir, idCol)
      .write.mode("overwrite").parquet(s"$stateDir/resolved")

  private val labelSchema = StructType.fromDDL("id LONG, component LONG, _batch LONG")

  /** The latest COMMITTED label snapshot (empty before any commit). The
    * `_committed_N` marker is written only after snapshot N's job commits,
    * so a crash mid-write leaves the previous snapshot live. */
  private def latestLabels(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    latestCommitted(dir) match {
      case None => Seq.empty[(Long, Long)].toDF("id", "component")
      case Some(k) => spark.read.schema(labelSchema).parquet(dir)
        .where(col("_batch") === k).drop("_batch")
    }
  }

  private def latestCommitted(dir: String): Option[Long] = {
    val d = Paths.get(dir)
    if (!Files.exists(d)) return None
    val s = Files.list(d)
    try s.iterator().asScala
      .flatMap(p => p.getFileName.toString.stripPrefix("_committed_").toLongOption
        .filter(_ => p.getFileName.toString.startsWith("_committed_")))
      .reduceOption(_ max _)
    finally s.close()
  }

  /** Write snapshot `key` of a marker-committed snapshot dir (labels or a
    * compacted view), commit it with an atomic marker, prune superseded
    * snapshots. Markers are plain `_`-prefixed files, invisible to
    * parquet reads. Uncommitted partition leftovers (a crash mid-write)
    * are cleaned BEFORE the write: a zero-row dynamic overwrite would
    * otherwise leave partial files under a marker that vouches for them. */
  private def writeSnapshot(dir: String, df: DataFrame, key: Long,
      partCol: String): Unit = {
    val live = latestCommitted(dir)
    val d = Paths.get(dir)
    if (Files.exists(d)) {
      val s = Files.list(d)
      try s.iterator().asScala.toList.foreach { p =>
        val nm = p.getFileName.toString
        if (nm.startsWith(s"$partCol=") &&
            !nm.stripPrefix(s"$partCol=").toLongOption.exists(k => live.contains(k)))
          deleteRec(p)
      } finally s.close()
    }
    // range-repartition upstream where it matters; AQE coalesces tiny
    // outputs to data-sized partitions
    df.withColumn(partCol, lit(key))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol).parquet(dir)
    Files.createDirectories(d)
    Files.write(Paths.get(s"$dir/_committed_$key"), Array.emptyByteArray)
    val s = Files.list(d)
    try s.iterator().asScala.toList.foreach { p =>
      val nm = p.getFileName.toString
      val stale =
        (nm.startsWith(s"$partCol=") &&
          nm.stripPrefix(s"$partCol=").toLongOption.exists(_ < key)) ||
        (nm.startsWith("_committed_") &&
          nm.stripPrefix("_committed_").toLongOption.exists(_ < key))
      if (stale) deleteRec(p)
    } finally s.close()
  }

  private[analytics] def deleteRec(p: java.nio.file.Path): Unit = {
    val s = Files.walk(p)
    try s.iterator().asScala.toList.reverse.foreach(Files.deleteIfExists(_))
    finally s.close()
  }
}
