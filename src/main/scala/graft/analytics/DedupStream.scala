package graft.analytics

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
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
  *    a retraction. The r11 first cut rewrote the resolved partitions of
  *    every touched component per batch; with duplicate clusters spread
  *    uniformly over arrival batches (the common case) that touched
  *    nearly every partition every batch, i.e. an O(history) rewrite in
  *    disguise — the delta form's per-batch write is exactly the newly
  *    dropped ids.
  *
  * Per-batch cost: compute is O(|batch|) (index the new docs) plus the
  * touched-component maintenance; the only history-proportional term left
  * is the columnar probe scan of `index/` — two 8-byte columns per
  * posting, orders cheaper than the text re-shingle it replaces, and the
  * candidate join against it broadcasts the (small) new side. A band-keyed
  * RocksDB state store (`flatMapGroupsWithState`) could eliminate even
  * that scan; plain-parquet state keeps every table externally readable
  * and replayable, which this module values more. Accumulating state
  * files are the other long-horizon term (footer/listing cost) — the same
  * small-file compaction trade EventLogStore documents.
  *
  * State layout under `stateDir` (all plain parquet):
  *  - `docs/`    — every document, partitioned by arrival batch;
  *  - `index/`   — (id, bk) band postings, partitioned by arrival batch;
  *                 `bk` = xxhash64(band index, band key), so equality is
  *                 band-scoped; hash collisions only ADD candidates, which
  *                 exact verification then rejects;
  *  - `sketch/`  — (id, sk) verification sketches, partitioned by arrival
  *                 batch, range-partitioned + sorted by id inside each
  *                 partition so pair verification fetches participants via
  *                 row-group-pruned id pushdown instead of a corpus scan;
  *  - `labels/`  — current (id, component) for every doc in a non-trivial
  *                 component — one snapshot per batch under `_batch=N`,
  *                 made live by an atomic `_committed_N` marker AFTER the
  *                 write job commits, then superseded snapshots are pruned
  *                 (a crash mid-write leaves the previous committed
  *                 snapshot intact and live);
  *  - `drops/`   — (id) newly-dropped per batch, partitioned by the batch
  *                 that dropped them;
  *  - `resolved/` — [[compactResolved]]'s materialization (optional).
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
  * replays cleanly. `StreamingSpec` asserts streaming == one-shot batch
  * [[Dedup.resolveNearDups]] across restarts, including a later batch
  * with a smaller id dethroning an earlier batch's representative. */
object DedupStream {

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

  /** Above this many ids, point lookups switch from a driver-collected
    * parquet-pushdown `isin` read (row-group pruning on the id-sorted
    * sketch files) to a distributed semi-join — the same cap-gated trade
    * as [[Dedup.incrementalNew]]'s bloom gate. */
  val PushdownMaxIds: Long = 10000L

  def resolveNearDupsStream(docs: DataFrame, stateDir: String, checkpoint: String,
      indexer: BandIndexer, idCol: String = "doc_id"): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, stateDir, indexer, idCol)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  private[graft] def processBatch(batch: DataFrame, batchId: Long, stateDir: String,
      indexer: BandIndexer, idCol: String): Unit = {
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
    if (latestCommitted(s"$stateDir/labels").exists(_ >= batchId)) return
    // reads use EXPLICIT schemas: a batch can legally write zero rows
    // (no documents, or no new near-dup pairs), and schema inference over
    // a parquet dir with no data files throws UNABLE_TO_INFER_SCHEMA
    def readAs(path: String, schema: StructType) = spark.read.schema(schema).parquet(path)
    def writePart(df: DataFrame, path: String): Unit =
      df.withColumn("_batch", lit(batchId))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch").parquet(path)
    def partSchema(df: DataFrame): StructType = df.withColumn("_batch", lit(batchId)).schema

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
    val allPostings = readAs(s"$stateDir/index", partSchema(postingsNew)).drop("_batch")
    val cands = postingsNew.as("a").join(allPostings.as("b"),
        col("a.bk") === col("b.bk") && col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .distinct()
      .localCheckpoint(true)

    // 4. exact verification, fetching sketches for pair PARTICIPANTS only
    val skSchema = partSchema(sketchNew)
    val partnerIds = cands.select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    val skAll = readAs(s"$stateDir/sketch", skSchema).drop("_batch")
    // one bounded collect answers both "how many" and "which": a
    // separate count() pays a second full job over the distinct-id set
    // on every micro-batch just to pick the branch
    val partnersCapped = partnerIds.limit(PushdownMaxIds.toInt + 1)
      .collect().map(_.getLong(0)).toSeq
    val skTbl =
      if (partnersCapped.size <= PushdownMaxIds)
        skAll.where(col("id").isin(partnersCapped: _*))
      else skAll.join(partnerIds, "id")
    val newEdges = cands
      .join(skTbl.select(col("id").as("id_a"), col("sk").as("sk_a")), "id_a")
      .join(skTbl.select(col("id").as("id_b"), col("sk").as("sk_b")), "id_b")
      .where(indexer.score(col("sk_a"), col("sk_b")) >= indexer.threshold)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint(true)
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
    writeLabels(s"$stateDir/labels", comp, batchId)
    comp.unpersist()
  }

  private val dropsSchema = StructType.fromDDL("id LONG, _batch LONG")

  /** The current resolved corpus — one min-id representative per near-dup
    * component: `docs/` minus the accumulated `drops/` deltas. A view, not
    * a scan-and-rewrite: the anti-join's drop side is the (small) dropped
    * id set, so reading the resolution costs one broadcast-shaped
    * anti-join over the corpus. */
  def resolvedCorpus(spark: org.apache.spark.sql.SparkSession, stateDir: String,
      idCol: String = "doc_id"): DataFrame = {
    // a stream whose batches were ALL empty leaves docs/ with no data
    // files (dynamic partitionBy writes no partition for zero rows) and
    // schema inference would throw; the resolved view of nothing is an
    // empty corpus. Note the SHAPE caveat: with no files there is no
    // schema to recover, so this fast path returns a single LONG idCol —
    // callers selecting other doc columns must handle the all-empty case
    val docsDir = Paths.get(s"$stateDir/docs")
    val hasData = Files.exists(docsDir) && {
      val w = Files.walk(docsDir)
      try w.iterator().asScala.exists(_.getFileName.toString.endsWith(".parquet"))
      finally w.close()
    }
    if (!hasData) {
      import spark.implicits._
      return Seq.empty[Long].toDF(idCol)
    }
    val docs = spark.read.parquet(s"$stateDir/docs")
    val drops = spark.read.schema(dropsSchema).parquet(s"$stateDir/drops")
      .select(col("id").as("_drop_id"))
    docs.join(drops, docs(idCol).cast("long") === col("_drop_id"), "left_anti")
      .drop("_batch")
  }

  /** Materialize [[resolvedCorpus]] under `stateDir/resolved` — an
    * on-demand maintenance/compaction op for consumers that want the
    * resolution as plain files, never part of the per-batch path. */
  def compactResolved(spark: org.apache.spark.sql.SparkSession, stateDir: String,
      idCol: String = "doc_id"): Unit =
    resolvedCorpus(spark, stateDir, idCol)
      .write.mode("overwrite").parquet(s"$stateDir/resolved")

  private val labelSchema = StructType.fromDDL("id LONG, component LONG, _batch LONG")

  /** The latest COMMITTED label snapshot (empty before any commit). The
    * `_committed_N` marker is written only after snapshot N's job commits,
    * so a crash mid-write leaves the previous snapshot live. */
  private def latestLabels(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
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

  /** Write label snapshot N, commit it with an atomic marker, prune
    * superseded snapshots. Markers are plain `_`-prefixed files, invisible
    * to parquet reads. */
  private def writeLabels(dir: String, comp: DataFrame, batchId: Long): Unit = {
    // range-repartition before the write: the local union-find path
    // parallelizes a driver array over default parallelism, which would
    // otherwise shed 32 tiny files per snapshot; AQE coalesces this to
    // data-sized partitions
    comp.repartitionByRange(col("id")).withColumn("_batch", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch").parquet(dir)
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(s"$dir/_committed_$batchId"), Array.emptyByteArray)
    val s = Files.list(Paths.get(dir))
    try s.iterator().asScala.toList.foreach { p =>
      val nm = p.getFileName.toString
      val stale =
        (nm.startsWith("_batch=") && nm.stripPrefix("_batch=").toLongOption.exists(_ < batchId)) ||
        (nm.startsWith("_committed_") && nm.stripPrefix("_committed_").toLongOption.exists(_ < batchId))
      if (stale) deleteRec(p)
    } finally s.close()
  }

  private def deleteRec(p: java.nio.file.Path): Unit = {
    val s = Files.walk(p)
    try s.iterator().asScala.toList.reverse.foreach(Files.deleteIfExists(_))
    finally s.close()
  }
}
