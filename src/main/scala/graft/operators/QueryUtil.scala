package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Helpers shared by the correctness-gate query modules.
  *
  * Double sums are order-dependent; Spark's partial aggregation and
  * DuckDB's sequential scan add in different orders, so `sum(double)` can
  * differ in the last ulp between engines. For oracle-checked aggregates we
  * sum exactly in decimal and cast the final result to double — identical
  * bits on both sides, and still one codegen'd aggregate at scale. */
object QueryUtil {
  /** Exact sum of a 2-decimal monetary column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")
  /** DuckDB rendering of [[dsum]]. */
  def dsumSql(c: String): String = s"CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"

  /** Exact revenue-style sum: price * (1 - discount), both 2-decimal. */
  def revenueSum(price: Column, discount: Column): Column =
    sum(price.cast("decimal(12,2)") * (lit(1).cast("decimal(3,0)") - discount.cast("decimal(12,2)")))
      .cast("double")
  def revenueSumSql(price: String, discount: String): String =
    s"CAST(sum(CAST($price AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,0)) - CAST($discount AS DECIMAL(12,2)))) AS DOUBLE)"

  /** Order-independent average of a 2-decimal column (exact sum / count). */
  def davg(c: Column): Column =
    (sum(c.cast("decimal(18,2)")).cast("double") / count(lit(1))).as("davg")
  def davgSql(c: String): String =
    s"(CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE) / count(*))"
}
