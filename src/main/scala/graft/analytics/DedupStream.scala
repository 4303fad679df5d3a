package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming face of corpus near-dup resolution: pair generation +
  * connected components + canonical-representative pruning, run
  * incrementally inside `foreachBatch` against accumulating state tables —
  * the shape a production ingestion pipeline wants ("resolve the corpus as
  * it arrives"), composing the batch pieces ([[Dedup.resolveNearDups]])
  * rather than reimplementing them.
  *
  * State layout under `stateDir` (all plain parquet, readable by anything):
  *  - `docs/`   — every document seen, partitioned by arrival batch;
  *  - `edges/`  — every near-dup pair, partitioned by the batch that
  *                discovered it;
  *  - `resolved/` — the current resolved corpus (one representative per
  *                near-dup component), rewritten each micro-batch.
  *
  * Restart safety: both accumulating tables are written with DYNAMIC
  * partition overwrite keyed on the micro-batch id, so a batch replayed
  * after a crash/restart rewrites exactly its own partition instead of
  * appending duplicates — idempotent without a dedup read path. The
  * `resolved/` snapshot is a full rewrite per batch, so a replay converges
  * to the identical snapshot.
  *
  * Incrementality contract: `pairGen(newDocs, allDocs)` must return every
  * qualifying pair (id_a < id_b) that TOUCHES a new document —
  * [[Dedup.minhashLshPairsBetween]] is the ready-made instance. Under
  * that contract the union of all per-batch edges equals the one-shot
  * batch pair set, so the streaming resolved corpus equals batch
  * [[Dedup.resolveNearDups]] over the same documents (asserted by
  * `StreamingSpec`). Components re-run per batch over the full edge
  * table — edge graphs are tiny relative to the corpus (pairs, not
  * documents), and label propagation re-converges in O(log diameter)
  * rounds from scratch, which beats maintaining incremental component
  * state for correctness under restart. */
object DedupStream {

  def resolveNearDupsStream(docs: DataFrame, stateDir: String, checkpoint: String,
      pairGen: (DataFrame, DataFrame) => DataFrame,
      idCol: String = "doc_id"): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // reads use EXPLICIT schemas: a batch can legally write zero rows
        // (no documents, or — far more often — no new near-dup pairs),
        // and schema inference over a parquet dir with no data files
        // throws UNABLE_TO_INFER_SCHEMA
        def readAs(path: String, schema: org.apache.spark.sql.types.StructType) =
          spark.read.schema(schema).parquet(path)
        val withBatch = (df: DataFrame) => df.withColumn("_batch", lit(batchId))
        withBatch(batch)
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_batch")
          .parquet(s"$stateDir/docs")
        val allDocs = readAs(s"$stateDir/docs", withBatch(batch).schema)
        val newDocs = allDocs.where(col("_batch") === batchId).drop("_batch")
        val pairs = pairGen(newDocs, allDocs.drop("_batch"))
        withBatch(pairs)
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_batch")
          .parquet(s"$stateDir/edges")
        val edges = readAs(s"$stateDir/edges", withBatch(pairs).schema)
        Dedup.resolveNearDups(allDocs.drop("_batch"), edges, idCol)
          .write.mode("overwrite").parquet(s"$stateDir/resolved")
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
