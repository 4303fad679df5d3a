package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

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
}
