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
    * eagerly materialized here (localCheckpoint), so micro-batches
    * re-broadcast a cached row instead of re-running the training
    * aggregation once per batch. */
  def naiveBayesClassifyStream(docs: DataFrame, model: DataFrame,
      outDir: String, checkpoint: String, buckets: Int = 4096,
      textCol: String = "text"): StreamingQuery = {
    val m = model.localCheckpoint(true)
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

  /** Cluster-balanced quota ADMISSION as a streaming query — the
    * streaming face of [[Similarity.clusterBalancedSample]]: every
    * arriving vector is assigned to its nearest centroid of a FIXED
    * batch-trained quantizer (embedded as literals — stateless per-row
    * arithmetic, no stream-static join), and at most `quota` vectors per
    * cluster are admitted over the stream's LIFETIME — first arrival
    * wins, within-batch ties broken by a deterministic id hash (the
    * uniform-draw semantics of the batch op, applied to arrival order).
    * Per-cluster admitted counts live in engine-managed
    * flatMapGroupsWithState state, committed atomically with the file
    * sink's manifest, so a restart resumes the quotas instead of
    * re-admitting.
    *
    * Scale shape: assignment cost is vectors × centroids codegen'd
    * array arithmetic (centroid table bounded at 2^18 by the IVF clamp);
    * the stateful op shuffles one narrow (id, list) row per vector and
    * keeps ONE long of state per cluster. Admission is inherently
    * arrival-ordered; batch [[Similarity.clusterBalancedSample]] remains
    * the order-free form. */
  def clusterQuotaSampleStream(vectors: DataFrame, centroids: DataFrame,
      quota: Int, outDir: String, checkpoint: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): StreamingQuery = {
    val spark = vectors.sparkSession
    import spark.implicits._
    // sorted ascending so the argmax's first-wins tie rule matches the
    // batch op's (max csim, then smaller centroid id)
    val cent = centroids.select(col("centroid_id").cast("int"),
        Similarity.asDouble(col("centv"))).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    require(cent.nonEmpty, "empty centroid table")
    val idLit = array(cent.map(c => lit(c._1)): _*)
    val centLit = array(cent.map(c => array(c._2.map(lit(_)): _*)): _*)
    val v = Similarity.asDouble(col(vecCol))
    val best = graft.functions.TextFunctions.bindOnce(
      transform(centLit, c => Similarity.cosine(v, c)), scores =>
        aggregate(sequence(lit(1), lit(cent.length)), lit(0),
          (bestI, i) => when(bestI === 0 ||
              element_at(scores, i) > element_at(scores, bestI), i)
            .otherwise(bestI)))
    vectors
      .select(col(idCol).cast("long").as("vec_id"),
        element_at(idLit, best).as("list_id"))
      .as[(Long, Int)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, (Long, Int)](OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (listId: Int, rows: Iterator[(Long, Int)], state: GroupState[Long]) =>
          val admitted = state.getOption.getOrElse(0L)
          val room = math.max(0L, quota - admitted).toInt
          val take =
            if (room == 0) Seq.empty[Long]
            else rows.map(_._1).toSeq
              .sortBy(id =>
                (scala.util.hashing.MurmurHash3.stringHash(id.toString), id))
              .take(room)
          state.update(admitted + take.size)
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
