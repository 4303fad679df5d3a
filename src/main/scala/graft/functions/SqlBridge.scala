package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's private[sql] Column <-> Expression conversions
  * (org.apache.spark.sql.classic.ExpressionUtils). Lives under
  * org.apache.spark.sql so the access modifier admits it — the standard
  * pattern for Catalyst extensions built outside the Spark tree. */
object Bridge {
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Column → fully CONVERTED Catalyst expression via the active
    * session's converter. [[expression]] wraps the column's node tree
    * lazily (fine inside Dataset APIs, which convert the whole tree
    * later); an expression handed straight to the analyzer — e.g.
    * returned from a FunctionRegistry builder — must be converted NOW,
    * or it stays an opaque Unevaluable wrapper. */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.SparkSession.active.expression(c)

  /** Register a SQL function into an EXISTING session's function
    * registry (the notebook/REPL path; `SparkSessionExtensions` is the
    * config-driven path for new sessions). `sessionState` is
    * private[sql] — hence this bridge. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)

  /** Build a NEW session over an existing SparkContext with the given
    * extensions applied — what `spark.sql.extensions` does at session
    * construction, callable in-process (tests exercise the REAL
    * extension path without tearing down the shared context). */
  def sessionWithExtensions(sc: org.apache.spark.SparkContext,
      configure: org.apache.spark.sql.SparkSessionExtensions => Unit)
      : org.apache.spark.sql.SparkSession = {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    configure(ext)
    // the full constructor is Scala-private but bytecode-public (the
    // same signature Builder.getOrCreate invokes); resolve it by the
    // FULL parameter-type signature so a Spark upgrade that reshuffles
    // overloads fails loudly here instead of binding the wrong one
    val ctor = classOf[org.apache.spark.sql.classic.SparkSession]
      .getDeclaredConstructor(
        classOf[org.apache.spark.SparkContext],
        classOf[Option[_]], classOf[Option[_]],
        classOf[org.apache.spark.sql.SparkSessionExtensions],
        classOf[scala.collection.immutable.Map[_, _]],
        classOf[scala.collection.immutable.Map[_, _]])
    ctor.newInstance(sc, None, None, ext,
      Map.empty[String, String], Map.empty[String, String])
      .asInstanceOf[org.apache.spark.sql.SparkSession]
  }
}
