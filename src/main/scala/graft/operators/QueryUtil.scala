package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Helpers shared by the correctness-gate query modules.
  *
  * Double sums are order-dependent; Spark's partial aggregation and
  * DuckDB's sequential scan add in different orders, so `sum(double)` can
  * differ in the last ulp between engines. For oracle-checked aggregates we
  * sum exact integer CENTS as longs — a codegen'd long sum, ~3× faster than
  * Spark's decimal aggregate path (no per-row Decimal allocation) — and
  * rescale once at the end. Both engines compute the identical double
  * product and round it the same way (half away from zero), so the cent
  * values are bit-identical.
  *
  * Overflow headroom: a long holds ~9.2e18, i.e. ~9e16 dollars of cents per
  * group — beyond any per-stream or per-order total, but reachable by a
  * GLOBAL sum over ~100 TB of lineitems. Low-cardinality global aggregates
  * use the two-level pattern (RelationalQueries.q1/q5): long partial sums
  * per input partition map-side, then an exact decimal merge of the few
  * partial rows, which is overflow-safe at any scale and keeps the hot
  * per-row path in codegen'd long arithmetic. */
object QueryUtil {
  /** Integer cents of a 2-decimal monetary double. Exact: 2-dp values are
    * within 1 ulp of an integer count of cents, and both engines round the
    * same IEEE double product. */
  def cents(c: Column): Column = round(c * 100).cast("long")
  def centsSql(c: String): String = s"CAST(round($c * 100) AS BIGINT)"

  /** Exact sum of a 2-decimal monetary column, returned as double. */
  def dsum(c: Column): Column = (sum(cents(c)).cast("double") / lit(100.0))
  /** DuckDB rendering of [[dsum]]. */
  def dsumSql(c: String): String =
    s"(CAST(sum(${centsSql(c)}) AS DOUBLE) / 100.0)"

  /** Exact revenue-style sum: price * (1 - discount), both 2-decimal;
    * per-row product is cents × percent, rescaled by 1e4. */
  def revenueSum(price: Column, discount: Column): Column =
    (sum(cents(price) * (lit(100L) - cents(discount))).cast("double") / lit(10000.0))
  def revenueSumSql(price: String, discount: String): String =
    s"(CAST(sum(${centsSql(price)} * (100 - ${centsSql(discount)})) AS DOUBLE) / 10000.0)"

  /** Order-independent average of a 2-decimal column (exact sum / count). */
  def davg(c: Column): Column = (dsum(c) / count(lit(1)))
  def davgSql(c: String): String = s"(${dsumSql(c)} / count(*))"
}
