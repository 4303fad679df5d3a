package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded point-lookup pushdown over SORTED parquet state tables.
  *
  * Spark translates an `In` filter into a LEFT-DEEP or-of-eq chain for
  * parquet (recursion depth = value count), which stack-overflows the
  * row-group/page filter evaluator around ~2000 terms (measured; the
  * session conf `spark.sql.parquet.pushdown.inFilterThreshold` is pinned
  * to the safe 1000 in [[graft.GraftSession]]). To probe a sorted table
  * with MORE keys than that while keeping parquet stats pruning engaged,
  * [[inSorted]] splits the sorted key list into ≤[[EqListMax]]-value
  * chunks and reads each chunk as `key ∈ [chunk.min, chunk.max] ∧ key IN
  * (chunk)` — the chunks are CONTIGUOUS in key space, so the range
  * predicate alone file-prunes a range-partitioned table down to the few
  * files a chunk overlaps, and the eq-list prunes row groups/pages inside
  * them. The union stays one job over one shared file listing (all
  * branches filter the same relation).
  *
  * Bytes read scale with the KEY COUNT (keys × page granule), not the
  * table size — the property the incremental-state probes
  * ([[DedupStream]], [[SimilarityIndex]]) need at 100 TB. */
private[analytics] object ParquetPushdown {

  /** Max eq-list terms per parquet filter — the or-chain recursion-safe
    * bound, mirrored by the session's `inFilterThreshold`. */
  val EqListMax = 1000

  /** `tbl` filtered to `keyCol` ∈ `keys`, as chunked range-scoped
    * eq-lists. Keys must be numeric (the state tables key by long hashes
    * / ids / int list ids); ORIGINAL values are kept for the literals so
    * no cast wraps the column and breaks pushdown. */
  def inSorted(tbl: DataFrame, keyCol: String, keys: Seq[Any]): DataFrame =
    if (keys.isEmpty) tbl.where(lit(false))
    else keys.distinct.sortBy(_.asInstanceOf[Number].longValue)
      .grouped(EqListMax).map { ch =>
        tbl.where(col(keyCol) >= ch.head && col(keyCol) <= ch.last &&
          col(keyCol).isin(ch: _*))
      }.reduce(_ unionAll _)
}
