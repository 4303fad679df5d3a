package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Streaming faces of the corpus-scoring operators: the model is trained
  * ONCE batch-side from a static reference sample, and each micro-batch
  * of arriving documents is scored with the full batch semantics inside
  * `foreachBatch` (per-doc aggregation needs a shuffle a plain streaming
  * plan cannot express without watermark state it doesn't need — each
  * doc is scored exactly once, on arrival).
  *
  * Restart safety follows [[DedupStream]]: scores are written with
  * DYNAMIC partition overwrite keyed on the micro-batch id, so a batch
  * replayed after a crash rewrites exactly its own partition —
  * idempotent, no dedup read path. The union of all per-batch scores
  * equals the one-shot batch scoring of the same documents (asserted by
  * `StreamingSpec`). */
object CorpusStream {

  /** CCNet perplexity scoring as a streaming query: every arriving
    * document gains (n_tokens, log_ppl) against the fixed train-sample
    * model. Bucketing is intentionally absent — terciles need the whole
    * score distribution; a streaming pipeline filters against CUTOFFS
    * estimated from a batch sample (`Corpus.perplexityScore` on the
    * sample gives exactly those). */
  def perplexityScoreStream(docs: DataFrame, train: DataFrame,
      outDir: String, checkpoint: String, vocab: Int = 2000,
      lambda: Double = 0.9, alpha: Double = 1.0,
      textCol: String = "text", idCol: String = "doc_id"): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Corpus.perplexityScores(batch, train, vocab, lambda, alpha,
            textCol, idCol)
          .withColumn("_batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_batch")
          .parquet(outDir)
        ()
      }
      .start()

  /** DSIR importance weighting as a streaming query: per-arriving-doc
    * log-likelihood-ratio weights against FIXED target/reference bucket
    * distributions (both trained batch-side — the reference corpus
    * stands in for the raw distribution, which a stream cannot supply
    * upfront). Selection quartiles are likewise a batch-sample decision;
    * the stream emits raw weights. (Batch `selected` is VALUE-based —
    * strictly above the exact p75 cutoff, under-selecting on ties — see
    * [[Corpus.importanceWeights]]; a streaming consumer applying a
    * batch-sampled cutoff inherits that contract.) */
  def importanceWeightsStream(docs: DataFrame, target: DataFrame,
      reference: DataFrame, outDir: String, checkpoint: String,
      buckets: Int = 4096, textCol: String = "text",
      idCol: String = "doc_id"): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Corpus.importanceWeights(batch, target, buckets, textCol, idCol,
            referenceOverride = Some(reference))
          .select(col("id"), col("n_features"), col("log_weight"))
          .withColumn("_batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_batch")
          .parquet(outDir)
        ()
      }
      .start()

  /** Naive Bayes classification as a streaming query: every arriving
    * document gains (pred_label, log_score) under a model trained ONCE
    * batch-side ([[Corpus.naiveBayesTrain]]). The one-row model is
    * eagerly collected to DRIVER-SIDE LITERALS (a local relation) before
    * the stream starts, so micro-batches re-broadcast a driver-held row
    * instead of re-running the training aggregation once per batch — and,
    * unlike a `localCheckpoint` (whose blocks live in executor storage),
    * the model survives executor loss for the stream's whole lifetime. */
  def naiveBayesClassifyStream(docs: DataFrame, model: DataFrame,
      outDir: String, checkpoint: String, buckets: Int = 4096,
      textCol: String = "text"): StreamingQuery = {
    val spark = docs.sparkSession
    val m = spark.createDataFrame(
      java.util.Arrays.asList(model.collect(): _*), model.schema)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Corpus.naiveBayesClassify(batch, m, buckets, textCol)
          .withColumn("_batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_batch")
          .parquet(outDir)
        ()
      }
      .start()
  }

  /** Portable per-id draw order — the JVM-side twin of
    * [[graft.functions.TextFunctions.hash60]] (first 15 hex chars of the
    * md5 of the id string), so the streaming quota draw picks the same
    * ids the batch sampler's hash60 window order would. */
  private[graft] def hash60Jvm(id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  /** Cluster-balanced quota ADMISSION as a streaming query — the
    * streaming face of [[Similarity.clusterBalancedSample]]: every
    * arriving vector is assigned to its nearest centroid of a FIXED
    * batch-trained quantizer, and at most `quota` vectors per cluster
    * are admitted over the stream's LIFETIME — first arrival wins,
    * within-batch ties broken by the portable hash60 id order (the same
    * uniform draw the batch op uses). The quantizer ships as a BROADCAST
    * VARIABLE probed by a typed map — O(nlist·dims) data, never
    * O(nlist·dims) plan nodes, so the 2^18-centroid IVF clamp holds.
    * State per cluster is the ADMITTED ID SET (bounded by `quota`), not
    * a bare count: re-delivered ids (reprocessed ingest, overlapping
    * file drops) are recognized and not admitted or emitted twice. The
    * state commits atomically with the file sink's manifest, so a
    * restart resumes the quotas instead of re-admitting. (State schema:
    * one array<bigint> of admitted ids per cluster — checkpoints from
    * the pre-release count-only form are not compatible.)
    *
    * Contract: ids must be (castable to) LONG and vectors non-null —
    * the typed state path needs a concrete key type (every embedding
    * table in this repo keys by long `vec_id`); a null id after the
    * cast fails fast with a clear error. Admission is inherently
    * arrival-ordered; batch [[Similarity.clusterBalancedSample]]
    * remains the order-free form.
    *
    * Heap sizing: the stateful stage buffers ONE cluster's distinct new
    * ids per micro-batch on a single task to sort them into the portable
    * draw order (8 bytes/id plus ids already admitted, ≤ `quota`). With
    * a small `nlist` and a very large first batch that concentrates
    * O(|batch|/nlist) ids on one task — size the FIRST load's batches
    * (maxFilesPerTrigger / maxBytesPerTrigger) so a cluster's share fits
    * task heap; steady-state batches are small by construction. A
    * pre-trim cannot bound this exactly: re-delivered ids are only
    * recognizable against the admitted-id STATE, so any bounded
    * stateless top-k could trim away ids the state would have admitted. */
  def clusterQuotaSampleStream(vectors: DataFrame, centroids: DataFrame,
      quota: Int, outDir: String, checkpoint: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): StreamingQuery = {
    val spark = vectors.sparkSession
    import spark.implicits._
    // sorted ascending so the strictly-greater argmax ties toward the
    // smaller centroid id — the batch op's max_by(struct(csim, -id)) rule
    val cent: Array[(Int, Array[Double])] = centroids
      .select(col("centroid_id").cast("int"),
        Similarity.asDouble(col("centv"))).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    require(cent.nonEmpty, "empty centroid table")
    val bc = spark.sparkContext.broadcast(cent)
    vectors
      .select(col(idCol).cast("long").as("vec_id"),
        Similarity.asDouble(col(vecCol)).as("v"))
      .as[(java.lang.Long, Array[Double])]
      .map { case (idBoxed, v) =>
        require(idBoxed != null,
          s"clusterQuotaSampleStream: id column '$idCol' must cast to a non-null long")
        val cs = bc.value
        var best = 0
        var bestSim = graft.functions.CosineSimilarity.compute(v, cs(0)._2)
        var i = 1
        while (i < cs.length) {
          val s = graft.functions.CosineSimilarity.compute(v, cs(i)._2)
          // Double.compare ranks NaN GREATEST and ties keep the first
          // (smallest) centroid id — exactly the batch op's
          // max_by(struct(csim, -centroid_id)) ordering, degenerate
          // zero-norm centroids (NaN csim) included
          if (java.lang.Double.compare(s, bestSim) > 0) { best = i; bestSim = s }
          i += 1
        }
        (idBoxed.longValue(), cs(best)._1)
      }
      .groupByKey(_._2)
      .flatMapGroupsWithState[Seq[Long], (Long, Int)](OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (listId: Int, rows: Iterator[(Long, Int)], state: GroupState[Seq[Long]]) =>
          val admitted = state.getOption.getOrElse(Seq.empty)
          val seen = admitted.toSet
          val room = math.max(0, quota - admitted.size)
          val take =
            if (room == 0) Seq.empty[Long]
            else rows.map(_._1).toSeq.distinct.filterNot(seen)
              // key PRECOMPUTED: Scala sortBy runs its key function per
              // COMPARISON, which would md5 each id ~2·log n times
              .map(id => ((hash60Jvm(id), id), id)).sortBy(_._1).map(_._2)
              .take(room)
          if (take.nonEmpty) state.update(admitted ++ take)
          take.iterator.map(id => (id, listId))
      }
      .toDF("vec_id", "list_id")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .format("parquet").option("path", outDir)
      .outputMode("append")
      .start()
  }
}
