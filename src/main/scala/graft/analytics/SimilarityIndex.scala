package graft.analytics

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Persisted ANN indexes: train the quantizer geometry ONCE, serve many
  * query batches. Every inline [[Similarity]] search form retrains per
  * call — centroid count()s, Lloyd passes, corpus assignment, PQ/SQ8
  * encoding — which is the right shape for a one-shot batch job and the
  * wrong one for production ANN, where an index is built by a scheduled
  * job and queried continuously (the FAISS train/add/search lifecycle).
  *
  * Layout under `path` (plain parquet, like EventLogStore's stats
  * layout — externally readable, no sidecar formats):
  *  - `meta/`      one row: kind, nlist, m, kcent — read before search to
  *                 derive defaults (nprobe = nlist/16) without touching
  *                 the corpus;
  *  - `centroids/` (centroid_id, centv) — the coarse quantizer;
  *  - `vectors/`   (id, list_id, v) — IVF: the corpus clustered by list,
  *                 range-partitioned + sorted by list_id;
  *  - `codebook/`  (sub, cid, cv) — IVF-PQ subspace centroids;
  *  - `codes/`     (id, list_id, codes) — IVF-PQ: PQ codes clustered by
  *                 list, range-partitioned + sorted by list_id;
  *  - `sq8stats/`  one row: the per-dimension [min,max] map;
  *  - `sq8codes/`  (id, codes) — the 8-bit coded corpus.
  *
  * Scale shape of a saved-index search: centroids/codebook/stats
  * broadcast (tiny); the probed corpus read prunes to the PROBED LISTS —
  * probed list ids collect to the driver (bounded by nlist) and push down
  * as an `isin` filter over the list-sorted files, so parquet row-group
  * stats skip every unprobed list's row groups; past `PushdownMaxLists`
  * distinct lists it degrades to the equi-join form. Search equals the
  * inline form EXACTLY for the same geometry (spec-pinned): assignment,
  * probing, tie-breaks and ranking reuse the same expressions, and
  * doubles round-trip parquet bit-exactly. */
object SimilarityIndex {

  /** Above this many probed list ids, prune via equi-join instead of a
    * driver-collected isin pushdown (same gate pattern as
    * [[DedupStream.PushdownMaxIds]]). */
  val PushdownMaxLists: Long = 10000L

  private def writeSorted(df: DataFrame, sortCol: String, path: String): Unit =
    df.repartitionByRange(col(sortCol)).sortWithinPartitions(col(sortCol))
      .write.mode("overwrite").parquet(path)

  /** [[writeSorted]]'s append twin — the incremental `add` lands as new
    * sorted files next to the existing ones, so row-group stats keep
    * pruning on the sort key without rewriting the base. */
  private def appendSorted(df: DataFrame, sortCol: String, path: String): Unit =
    df.repartitionByRange(col(sortCol)).sortWithinPartitions(col(sortCol))
      .write.mode("append").parquet(path)

  private def meta(spark: SparkSession, path: String): org.apache.spark.sql.Row =
    spark.read.parquet(s"$path/meta").first()

  private def hasParquetFiles(dir: String): Boolean =
    DedupStream.hasParquetFiles(dir)

  /** A stored corpus table plus its streaming-add overlay (`<sub>_add/`,
    * written by [[addIvfStream]] with per-batch dynamic overwrite) — the
    * union every search reads, so streamed adds are visible without a
    * rebuild. */
  private def readWithAdds(spark: SparkSession, path: String, sub: String): DataFrame = {
    val base = spark.read.parquet(s"$path/$sub")
    val addDir = s"$path/${sub}_add"
    if (hasParquetFiles(addDir))
      base.unionByName(spark.read.parquet(addDir).drop("_batch"))
    else base
  }

  /** Prune a list-sorted table to the probed list ids. */
  private def pruneToLists(tbl: DataFrame, probes: DataFrame): DataFrame = {
    val lists = probes.select(col("list_id")).distinct()
    // one bounded collect decides the branch AND supplies the ids — a
    // separate count() is a second full job on the per-query hot path
    val capped = lists.limit(PushdownMaxLists.toInt + 1).collect().map(_.get(0))
    if (capped.length <= PushdownMaxLists)
      ParquetPushdown.inSorted(tbl, "list_id", capped.toSeq)
    else tbl.join(lists, "list_id")
  }

  // ---------------------------------------------------------------- IVF

  /** Build and persist an IVF index: centroids (lowest-id init, optional
    * Lloyd `iters` via [[Similarity.trainIvfCentroids]]) plus the corpus
    * clustered by its list assignment. `nlist <= 0` auto-sizes via
    * [[Similarity.autoIvf]]. */
  def saveIvf(corpus: DataFrame, path: String, nlist: Int = 0, iters: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    import Similarity._
    val spark = corpus.sparkSession
    val n = if (nlist > 0) nlist else autoIvf(corpus.count())._1
    val cent =
      (if (iters > 0) trainIvfCentroids(corpus, n, iters, idCol, vecCol)
         .select(col("centroid_id"), col("centv"))
       else corpus.where(col(idCol) < n)
         .select(col(idCol).as("centroid_id"), asDouble(col(vecCol)).as("centv")))
        .localCheckpoint(true)
    cent.coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    writeSorted(assignToLists(corpus, cent, idCol, vecCol, keepV = true),
      "list_id", s"$path/vectors")
    import spark.implicits._
    Seq(("ivf", n, 0, 0)).toDF("kind", "nlist", "m", "kcent")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Approximate top-k against a saved IVF index — identical results to
    * [[Similarity.ivfTopK]] with the index's centroids and geometry, but
    * the only corpus-scale work left is the pruned scan of the probed
    * lists. `nprobe <= 0` defaults to nlist/16 (floor 2), read from meta. */
  def ivfTopK(spark: SparkSession, queries: DataFrame, path: String, k: Int,
      nprobe: Int = 0, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import Similarity._
    val np = if (nprobe > 0) nprobe
      else math.max(2, meta(spark, path).getAs[Int]("nlist") / 16)
    val cent = spark.read.parquet(s"$path/centroids")
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("psim").desc, col("centroid_id"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("psim", cosine(col("qv"), col("centv")))
      .withColumn("prn", row_number().over(pw))
      .where(col("prn") <= np)
      .select(col("query_id"), col("qv"), col("centroid_id").as("list_id"))
      .localCheckpoint(true)
    val cands = pruneToLists(readWithAdds(spark, path, "vectors"), probes)
    val scored = broadcast(probes).join(cands, "list_id")
      .where(col("query_id") =!= col("id"))
      .withColumn("sim", cosine(col("qv"), col("v")))
      .where(!isnan(col("sim")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"), col("sim"))
  }

  // ------------------------------------------------------------- IVF-PQ

  /** Build and persist an IVF-PQ index: coarse centroids + list
    * assignments + PQ codebook + the m-byte-coded corpus. Mirrors
    * [[Similarity.ivfPqTopK]]'s training exactly (codes quantize raw
    * vectors; `iters = 0` keeps the codebook deterministic). */
  def saveIvfPq(corpus: DataFrame, path: String, nlist: Int, m: Int, kcent: Int,
      iters: Int = 0, idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    import Similarity._
    val spark = corpus.sparkSession
    val cent = corpus.where(col(idCol) < nlist)
      .select(col(idCol).cast("int").as("centroid_id"), asDouble(col(vecCol)).as("centv"))
      .localCheckpoint(true)
    cent.coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    val assigned = assignToLists(corpus, cent, idCol, vecCol, keepV = false)
    val cb = pqCodebook(corpus, m, kcent, iters, idCol, vecCol).localCheckpoint(true)
    cb.coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
    writeSorted(pqEncode(corpus, cb, m, idCol, vecCol).join(assigned, "id")
      .select(col("id"), col("list_id"), col("codes")), "list_id", s"$path/codes")
    import spark.implicits._
    Seq(("ivfpq", nlist, m, kcent)).toDF("kind", "nlist", "m", "kcent")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** ADC top-k against a saved IVF-PQ index — identical results to
    * [[Similarity.ivfPqTopK]] for the index's geometry; per query batch
    * only the probed lists' code rows are scanned (m ints per vector). */
  def ivfPqTopK(spark: SparkSession, queries: DataFrame, path: String, k: Int,
      nprobe: Int = 0, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import Similarity._
    val mrow = meta(spark, path)
    val (m, kcent) = (mrow.getAs[Int]("m"), mrow.getAs[Int]("kcent"))
    val np = if (nprobe > 0) nprobe else math.max(2, mrow.getAs[Int]("nlist") / 16)
    val cent = spark.read.parquet(s"$path/centroids")
    val cb = spark.read.parquet(s"$path/codebook")
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("psim").desc, col("centroid_id"))
    val probes = queries
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .crossJoin(broadcast(cent))
      .withColumn("psim", cosine(col("qv"), col("centv")))
      .withColumn("prn", row_number().over(pw))
      .where(col("prn") <= np)
      .select(col("query_id"), col("centroid_id").as("list_id"))
      .localCheckpoint(true)
    val qtab = pqQueryTab(queries, cb, m, idCol, vecCol)
    val cands = pruneToLists(readWithAdds(spark, path, "codes"), probes)
    adcTopK(
      cands.select(col("id").as("neighbor_id"), col("codes"), col("list_id"))
        .join(broadcast(probes), "list_id")
        .join(broadcast(qtab), "query_id")
        .withColumn("adist", adcDist(col("codes"), col("tab"), m, kcent)),
      m, kcent, k)
  }

  // ---------------------------------------------------------------- SQ8

  /** Persist the SQ8 codec: per-dimension [min,max] stats + the 8-bit
    * coded corpus — the 4× storage cut becomes an at-rest format instead
    * of a per-search recode. */
  def saveSq8(corpus: DataFrame, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    import Similarity._
    sq8Stats(corpus, vecCol).coalesce(1)
      .write.mode("overwrite").parquet(s"$path/sq8stats")
    sq8(corpus, idCol, vecCol).select(col("id"), col("codes"))
      .write.mode("overwrite").parquet(s"$path/sq8codes")
  }

  /** Asymmetric SQ8 top-k against the saved codec — identical results to
    * [[Similarity.sq8TopK]]; the corpus is never re-encoded. */
  def sq8TopK(spark: SparkSession, queries: DataFrame, path: String, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import Similarity._
    val rec = spark.read.parquet(s"$path/sq8codes")
      .crossJoin(broadcast(mmDense(spark.read.parquet(s"$path/sq8stats"))))
      .select(col("id").as("neighbor_id"), sq8Reconstruct(col("codes")).as("cv"))
      .where(!exists(col("cv"), c => c.isNull))
    sq8Rank(rec, queries, k, idCol, vecCol)
  }

  // ---------------------------------------------- incremental add (FAISS
  // add semantics: the geometry is FROZEN at train time; new vectors are
  // assigned/encoded with the SAVED quantizer and appended — no retrain)

  /** Append new vectors to a saved IVF index without retraining: assign
    * each to its nearest SAVED centroid with the exact expressions
    * [[saveIvf]] uses, and append as new list-sorted files — so
    * `saveIvf(A); addIvf(B)` holds the same rows as `saveIvf(A ∪ B)`
    * whenever both runs share the geometry (spec-pinned). Returns the
    * post-add list-population skew (max/mean) — the drift signal: frozen
    * centroids slowly mis-shape as the distribution moves, and a caller
    * gates [[retrainIvf]] on this passing its threshold. */
  def addIvf(newVectors: DataFrame, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Double = {
    import Similarity._
    val spark = newVectors.sparkSession
    val cent = spark.read.parquet(s"$path/centroids")
    appendSorted(assignToLists(newVectors, cent, idCol, vecCol, keepV = true),
      "list_id", s"$path/vectors")
    listSkew(spark, path, "vectors")
  }

  /** Append new vectors to a saved IVF-PQ index: nearest SAVED coarse
    * centroid + PQ codes under the SAVED codebook, appended list-sorted.
    * Same parity contract and skew return as [[addIvf]]; past-threshold
    * drift re-fits via [[retrainIvfPq]] (which needs the raw corpus —
    * PQ codes are lossy). */
  def addIvfPq(newVectors: DataFrame, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Double = {
    import Similarity._
    val spark = newVectors.sparkSession
    val m = meta(spark, path).getAs[Int]("m")
    val cent = spark.read.parquet(s"$path/centroids")
    val cb = spark.read.parquet(s"$path/codebook").localCheckpoint(true)
    val assigned = assignToLists(newVectors, cent, idCol, vecCol, keepV = false)
    appendSorted(pqEncode(newVectors, cb, m, idCol, vecCol).join(assigned, "id")
      .select(col("id"), col("list_id"), col("codes")), "list_id", s"$path/codes")
    listSkew(spark, path, "codes")
  }

  /** Append new vectors to a saved SQ8 codec, encoded under the SAVED
    * per-dimension [min,max] (the frozen-codec contract: stats are the
    * geometry; re-deriving them from new data would silently re-scale
    * every existing code). Out-of-range drift (new data outside the
    * saved [min,max] clamps) re-fits via [[retrainSq8]]. */
  def addSq8(newVectors: DataFrame, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    import Similarity._
    val spark = newVectors.sparkSession
    val stats = spark.read.parquet(s"$path/sq8stats")
    sq8EncodeWith(newVectors, stats, idCol, vecCol).select(col("id"), col("codes"))
      .write.mode("append").parquet(s"$path/sq8codes")
  }

  /** The shared saved-centroid assignment — identical to the save paths'
    * expressions so add parity is structural, not coincidental. */
  private def assignToLists(vectors: DataFrame, cent: DataFrame,
      idCol: String, vecCol: String, keepV: Boolean): DataFrame = {
    import Similarity._
    val c = vectors.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val scored = c.crossJoin(broadcast(cent))
      .select(col("id"), col("v"), col("centroid_id"),
        cosine(col("v"), col("centv")).as("csim"))
      .groupBy(col("id"))
      .agg(max_by(col("centroid_id"), struct(col("csim"), -col("centroid_id"))).as("list_id"),
        first(col("v")).as("v"))
    if (keepV) scored.select(col("id"), col("list_id"), col("v"))
    else scored.select(col("id"), col("list_id"))
  }

  /** Population skew (max/mean over non-empty lists) of a list-clustered
    * table — reads only the pruned `list_id` column. 1.0 = balanced. */
  def listSkew(spark: SparkSession, path: String, sub: String = "vectors"): Double = {
    val r = readWithAdds(spark, path, sub).groupBy(col("list_id")).count()
      .agg(max(col("count")).cast("double").as("mx"), avg(col("count")).as("av")).first()
    if (r.isNullAt(0) || r.getDouble(1) == 0.0) 1.0 else r.getDouble(0) / r.getDouble(1)
  }

  /** Re-train the IVF geometry in place from the stored corpus — the
    * maintenance op a caller runs when [[addIvf]]'s skew passes their
    * threshold. Reads `vectors/` (plus the streaming-add overlay) back as
    * the corpus, eagerly materializes it (the save path overwrites the
    * very files it would otherwise still be reading), re-runs [[saveIvf]]
    * at the given (or auto-sized) geometry, and clears the overlay. Lloyd
    * iterations default to 1 so the retrained centroids come from the
    * CURRENT distribution rather than requiring low ids to exist.
    *
    * Contract: QUIESCE [[addIvfStream]] before retraining — a running
    * stream holds the PRE-retrain centroids it collected at start (its
    * assignments would mis-list under the new geometry), and a batch
    * landing between the corpus materialization and the overlay clear
    * would be silently folded away. The fold-then-delete is NOT
    * crash-atomic; a crash between the save and the overlay clear leaves
    * overlay rows duplicated in the base — the id-dedup below makes
    * RE-RUNNING retrainIvf after a crash converge (duplicates collapse),
    * which is the recovery procedure. */
  def retrainIvf(spark: SparkSession, path: String, nlist: Int = 0,
      iters: Int = 1): Unit = {
    val corpus = readWithAdds(spark, path, "vectors")
      .select(col("id").as("vec_id"), col("v").as("embedding"))
      .dropDuplicates("vec_id") // crash-recovery: base ∪ stale overlay collapses
      .localCheckpoint(true)
    saveIvf(corpus, path, nlist, iters)
    val addDir = Paths.get(s"$path/vectors_add")
    if (Files.exists(addDir)) DedupStream.deleteRec(addDir)
  }

  /** Re-fit the IVF-PQ geometry in place — [[retrainIvf]]'s sibling for
    * the PQ codec, with one honest difference: PQ codes are LOSSY, so
    * the stored index cannot reproduce the raw vectors it was built from
    * and the caller supplies the raw corpus (the system-of-record
    * embeddings table — typically base ∪ everything added; ids dedup
    * here so a crash-recovery re-pass converges like [[retrainIvf]]).
    * Geometry arguments default (≤ 0) to the saved meta's. Re-runs
    * [[saveIvfPq]] — coarse centroids, codebook, and every code row
    * re-derive from the CURRENT corpus — and clears the add overlay.
    * Same contract as [[retrainIvf]]: quiesce concurrent adds first;
    * re-running after a crash converges (the save is a full overwrite
    * keyed only on the provided corpus). Retrained == fresh-saved at the
    * same geometry by construction (spec-pinned). */
  def retrainIvfPq(corpus: DataFrame, path: String, nlist: Int = 0,
      m: Int = 0, kcent: Int = 0, iters: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    val mr = meta(spark, path)
    saveIvfPq(corpus.dropDuplicates(idCol).localCheckpoint(true), path,
      if (nlist > 0) nlist else mr.getAs[Int]("nlist"),
      if (m > 0) m else mr.getAs[Int]("m"),
      if (kcent > 0) kcent else mr.getAs[Int]("kcent"),
      iters, idCol, vecCol)
    val addDir = Paths.get(s"$path/codes_add")
    if (Files.exists(addDir)) DedupStream.deleteRec(addDir)
  }

  /** Re-fit the SQ8 codec in place from the caller-supplied raw corpus
    * (lossy codes — same reasoning as [[retrainIvfPq]]): stats re-derive
    * from the CURRENT per-dimension [min,max] and every vector
    * re-encodes under them, atomically replacing base AND appended code
    * files (stats are the geometry — new stats must never decode old
    * codes, so a partial re-encode is never readable). Retrained ==
    * fresh-saved by construction (spec-pinned). */
  def retrainSq8(corpus: DataFrame, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    saveSq8(corpus.dropDuplicates(idCol).localCheckpoint(true), path,
      idCol, vecCol)

  /** Streaming face of [[addIvf]]: every arriving micro-batch is assigned
    * with the SAVED centroids (collected to driver-side literals once —
    * stream-safe under executor loss) and lands under
    * `vectors_add/_batch=N` via dynamic partition overwrite, so a
    * crash-replayed batch rewrites exactly its own partition —
    * replay-idempotent with no dedup read path. Searches
    * ([[ivfTopK]]) read base ∪ overlay transparently; [[retrainIvf]]
    * folds the overlay into the base. */
  def addIvfStream(vectors: DataFrame, path: String, checkpoint: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): StreamingQuery = {
    val spark = vectors.sparkSession
    val centSaved = spark.read.parquet(s"$path/centroids")
    val cent = spark.createDataFrame(
      java.util.Arrays.asList(centSaved.collect(): _*), centSaved.schema)
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        addStreamBatch(batch, batchId, path, cent, idCol, vecCol)
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  private[graft] def addStreamBatch(batch: DataFrame, batchId: Long, path: String,
      cent: DataFrame, idCol: String, vecCol: String): Unit =
    assignToLists(batch, cent, idCol, vecCol, keepV = true)
      .withColumn("_batch", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch").parquet(s"$path/vectors_add")
}
