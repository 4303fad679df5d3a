package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal (as-of) join — "for each left row, the latest right row with
  * the same key and rightTs <= leftTs". The event-sourcing staple: attach
  * the then-current dimension state (price, config, prior event) to each
  * event. The reference expresses this inside JS handlers by carrying the
  * last-seen value in fold state (JintProjectionStateHandler.cs handler
  * state); Spark-first it is a first-class relational operator.
  *
  * NOT a range join (O(n·m) candidate explosion at scale): both sides are
  * tagged and UNIONed, hash-shuffled ONCE on the key, sorted within
  * partitions by (ts, side), and the payload is carried forward with
  * `last(_, ignoreNulls)` over an unbounded-preceding running window —
  * linear in rows, the same partition-and-sweep shape as the projection
  * fold, and identical at 100 TB. Payload columns ride in ONE struct so
  * every output column comes from the SAME matched right row (per-column
  * last() could mix rows when right-side values are null).
  *
  * Semantics pinned by the oracle (`asof_join_attrib` vs DuckDB
  * `ASOF LEFT JOIN`): match is inclusive (rightTs == leftTs matches, the
  * right row sorting first at equal ts); left rows with no prior right
  * row keep NULL payload; NULL keys never match (filtered from the right
  * side, like equality-join semantics). Right rows should be unique per
  * (key, ts) — at equal (key, ts) duplicates the LAST in payload-struct
  * order wins deterministically, where engines' ASOF tie choice is
  * unspecified: pre-aggregate when that matters. Skew note: one hot key
  * folds in one task (same bound as any per-key sweep); salt or
  * pre-aggregate the right side if a key dominates. */
object Temporal {

  /** Interval (range) join: every (point, interval) pair with the same
    * key and `start <= ts < end` — sessionization, attribution windows,
    * validity-period lookups. A naive theta-join degenerates to
    * per-key cross products (Spark plans key-equi + range FILTER, which
    * is fine only while single keys stay small); this instead buckets
    * time into fixed blocks: each interval EXPLODES into the blocks it
    * covers, each point computes its one block, and the join is a pure
    * equi-join on (key…, block) + the exact range predicate. A point's
    * block is unique, so a matching interval meets it in exactly one
    * block — no distinct step. Block count per interval =
    * span/blockSize + 1: pick blockSize near the typical interval span
    * so fan-out stays O(1) per interval while each block's population
    * stays bounded — shuffle volume is then linear in points +
    * intervals, independent of per-key density, and the plan shape
    * survives 100 TB. Returns left.* + `payload` columns from the
    * matched interval (inner join: unmatched points drop). */
  def intervalJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      tsCol: String, startCol: String, endCol: String, payload: Seq[String],
      blockSize: Long): DataFrame = {
    require(blockSize > 0, "blockSize must be positive")
    // exact integer block id for a NON-NEGATIVE time domain: long modulo
    // stays exact where double floor(x/b) loses precision past 2^53
    // (nanosecond epochs are ~2^60)
    def blk(c: Column): Column =
      ((c - (c % blockSize)).cast("decimal(38,0)") / blockSize).cast("long")
    val p = points.withColumn("_blk", blk(col(tsCol)))
    val i = intervals
      .where(keys.map(col(_).isNotNull).reduce(_ && _) &&
        col(endCol) > col(startCol))
      .select(keys.map(col) ++
        Seq(col(startCol).as("_s"), col(endCol).as("_e"),
          struct(payload.map(col): _*).as("_p")): _*)
      // end is exclusive: the last covered block is the one holding end-1
      .withColumn("_blk", explode(sequence(blk(col("_s")), blk(col("_e") - 1))))
    p.join(i, keys :+ "_blk")
      .where(col(tsCol) >= col("_s") && col(tsCol) < col("_e"))
      .select(points.columns.map(col) ++
        payload.map(f => col("_p").getField(f).as(f)): _*)
  }

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    val leftCols = left.columns.toSeq
    val payStruct = struct(payload.map(col): _*)
    val rightPrepared = right
      .where(keys.map(col(_).isNotNull).reduce(_ && _))
      .select(keys.map(col) ++ Seq(col(rightTs).as("_t"), payStruct.as("_p")): _*)
    val payType = rightPrepared.schema("_p").dataType
    val lTagged = left.select(
      leftCols.map(col) ++
        Seq(col(leftTs).as("_t"), lit(1).as("_side"), lit(null).cast(payType).as("_p")): _*)
    val rTagged = rightPrepared.select(
      leftCols.map(c =>
        if (keys.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("_t"), lit(0).as("_side"), col("_p")): _*)
    // _p as the final sort key makes the duplicate-(key, ts) case
    // deterministic: equal-timestamp right rows resolve by payload-struct
    // order, not partition arrival order
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionAll(rTagged)
      .withColumn("_asof", last(col("_p"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("_asof").getField(p).as(p)): _*)
  }
}
