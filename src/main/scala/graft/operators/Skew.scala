package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins with heavy-tailed key distributions
  * (SURVEY.md / build brief: "skewed keys → salting or AQE skew-join").
  *
  * AQE's adaptive skew-join split (enabled in GraftSession) handles
  * sort-merge joins from runtime stats; explicit salting guarantees the
  * split regardless of join strategy or stats quality — the standard
  * belt-and-braces for a known-hot key (e.g. one stream holding 10% of a
  * 100 TB log, one document shingle shared by millions of near-dups). */
object Skew {

  /** Salted equi-join: every row of the skewed `large` side gets a
    * deterministic salt in [0, factor); the `small` side is replicated
    * once per salt value; the join key becomes (key, salt). A hot key's
    * rows now spread over `factor` reducers instead of one, with
    * identical join semantics.
    *
    * The salt is a hash of the large side's full row (deterministic —
    * reruns produce identical plans and results; `rand()` would not).
    * Supports "inner" and "left" joins: both replicate only the small
    * side, so no large-side row is duplicated or lost. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, factor: Int,
      how: String = "inner"): DataFrame = {
    require(how == "inner" || how == "left",
      s"saltedJoin supports inner/left (small side is replicated); got $how")
    require(factor > 0, "factor must be positive")
    val largeCols = large.columns.map(col)
    val salted = large.withColumn("_salt",
      pmod(xxhash64(largeCols: _*), lit(factor.toLong)).cast("int"))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated,
        salted("_salt") === replicated("_salt") &&
          salted(key) === replicated(key), how)
      .drop("_salt").drop(replicated(key))
  }
}
