package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for LLM training-data pipelines, each designed
  * around a shuffle-efficient Spark plan:
  *
  *  - exact: hash-groupBy on a fingerprint — one shuffle of (hash, id).
  *  - n-gram Jaccard: inverted shingle index self-join — pairs are only
  *    generated for documents sharing a shingle (never O(N²)); at 100 TB,
  *    frequent-shingle caps bound the join fan-out.
  *  - MinHash + LSH: k portable hash functions over shingles → b band keys →
  *    bucket self-join → exact-Jaccard verification of candidates only.
  *  - SimHash: 60-bit sign-aggregated token fingerprints; near-dups share
  *    close fingerprints (banded by prefix for the join).
  */
object Dedup {

  /** Exact dedup: one representative (min id) per distinct normalized text. */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_copies"))

  /** Distinct (id, shingle) pairs — the inverted-index input. */
  def shingleIndex(docs: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"), explode(shingles(col(textCol), n)).as("shingle"))
      .distinct()

  /** Exact n-gram Jaccard near-dup pairs with similarity >= threshold.
    * Returns (id_a, id_b, jaccard) with id_a < id_b. */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double,
      textCol: String = "text", idCol: String = "doc_id", n: Int = 3): DataFrame = {
    // the shingle index feeds the self-join twice and the size table once;
    // persist it instead of recomputing the split/explode/distinct subtree
    // (at warehouse scale this is a checkpointed intermediate table)
    val idx = shingleIndex(docs, textCol, idCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = idx.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val common = idx.as("a").join(idx.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash prime modulus (2^31 - 1, prime). */
  val MinhashP = 2147483647L

  /** MinHash signatures: each shingle is md5-hashed ONCE, then the k hash
    * functions are affine transforms h_i(x) = ((2i+1)·x + i·2654435761) mod
    * (2^31-1) — the standard construction; 1 md5 per shingle instead of k.
    * Returns (id, seed, minhash). */
  def minhashSignatures(docs: DataFrame, k: Int,
      textCol: String = "text", idCol: String = "doc_id", n: Int = 3): DataFrame =
    shingleIndex(docs, textCol, idCol, n)
      .withColumn("h", pmod(hash60(col("shingle")), lit(MinhashP)))
      .select(col("id"), explode(sequence(lit(0), lit(k - 1))).as("seed"), col("h"))
      .groupBy(col("id"), col("seed"))
      .agg(min((
        (col("seed") * 2 + 1) * col("h") + col("seed") * lit(2654435761L)
      ) % MinhashP).as("minhash"))

  /** MinHash-LSH candidate pairs, verified by exact Jaccard.
    * `k` hashes in `bands` bands of k/bands rows; two documents are
    * candidates iff they agree on all rows of at least one band. */
  def minhashLshPairs(docs: DataFrame, threshold: Double, k: Int = 16, bands: Int = 4,
      textCol: String = "text", idCol: String = "doc_id", n: Int = 3): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    // NOTE: persisting idx here measured slower — the cache barrier hides
    // the plan from AQE's join planning; recomputing the narrow subtree
    // wins at this shape. Revisit with a checkpointed shingle table at
    // warehouse scale.
    val idx = shingleIndex(docs, textCol, idCol, n)
    val sig = idx
      .withColumn("h", pmod(hash60(col("shingle")), lit(MinhashP)))
      .select(col("id"), explode(sequence(lit(0), lit(k - 1))).as("seed"), col("h"))
      .groupBy(col("id"), col("seed"))
      .agg(min((
        (col("seed") * 2 + 1) * col("h") + col("seed") * lit(2654435761L)
      ) % MinhashP).as("minhash"))
    val rows = k / bands
    val bandKeys = sig
      .withColumn("band", (col("seed") / rows).cast("int"))
      .groupBy(col("id"), col("band"))
      // deterministic key: minhashes in seed order within the band
      .agg(concat_ws(",", array_sort(collect_list(
        concat(lpad(col("seed").cast("string"), 2, "0"), lit("="), col("minhash"))))).as("band_key"))
    val cands = bandKeys.as("a").join(bandKeys.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // verify candidates with exact Jaccard (cheap: only candidate pairs)
    val sizes = idx.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val common = cands
      .join(idx.select(col("id").as("id_a"), col("shingle")), "id_a")
      .join(idx.select(col("id").as("id_b"), col("shingle").as("shingle_b")), "id_b")
      .where(col("shingle") === col("shingle_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash (60-bit): per bit position, sum +1/-1 over distinct token
    * hashes; the sign of each sum sets the bit. Near-duplicate documents
    * have small Hamming distance. Returns (id, simhash). */
  def simhash(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
        explode(array_distinct(tokens(col(textCol)))).as("tok"))
      .withColumn("h", hash60(col("tok")))
    val bitSums = toks
      .select(col("id"), explode(sequence(lit(0), lit(59))).as("b"), col("h"))
      .groupBy(col("id"), col("b"))
      .agg(sum(expr("CASE WHEN shiftright(h, CAST(b AS INT)) % 2 = 1 THEN 1 ELSE -1 END")).as("s"))
    bitSums.groupBy(col("id"))
      .agg(sum(expr("CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(b AS INT)) ELSE CAST(0 AS BIGINT) END")).as("simhash"))
  }
}
