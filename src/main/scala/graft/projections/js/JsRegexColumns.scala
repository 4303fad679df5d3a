package graft.projections.js

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The JS regex surface (`test` / `match` / regex `replace` / regex
  * `split`/`search`) as native codegen'd expressions, each delegating to
  * the SAME [[JsRegexOps]] static the interpreter native uses — same
  * pattern cache, same backtracking read budget, same ES algorithms
  * (capture splicing in split, $-substitution in replace, zero-width
  * advance rules) — so a compiled plan is byte-exact with the
  * interpreter fold for every pattern, flag and subject. Patterns and
  * flags are compile-time literals of the handler source (a regex
  * literal evaluates to a fresh regex per event: lastIndex always starts
  * 0, which is exactly fresh-per-call). Reference: the reference engine
  * ships full ECMAScript regex through Jint
  * (JintProjectionStateHandler.cs handlers run arbitrary handler ES). */
private[js] object JsRegexColumns {
  private[js] def checkStr(dt: DataType, who: String): TypeCheckResult =
    if (dt == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$who expects a string input, got ${dt.simpleString}")

  def test(c: Column, pattern: String, flags: String): Column =
    Bridge.column(JsRegexTest(Bridge.expression(c), pattern, flags))
  def matches(c: Column, pattern: String, flags: String): Column =
    Bridge.column(JsRegexMatch(Bridge.expression(c), pattern, flags))
  def replace(c: Column, rep: Column, pattern: String, flags: String): Column =
    Bridge.column(JsRegexReplace(Bridge.expression(c), Bridge.expression(rep),
      pattern, flags))
  def split(c: Column, pattern: String, flags: String,
      limit: Option[Double]): Column =
    Bridge.column(JsRegexSplit(Bridge.expression(c), pattern, flags, limit))
  def search(c: Column, pattern: String, flags: String): Column =
    Bridge.column(JsRegexSearch(Bridge.expression(c), pattern, flags))
}

private[js] case class JsRegexTest(child: Expression, pattern: String,
    flags: String) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    JsRegexColumns.checkStr(child.dataType, "js_regex_test")
  override def nullSafeEval(v: Any): Any =
    JsRegexOps.colTest(v.asInstanceOf[UTF8String], pattern, flags)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("jsRegexPat", pattern, "java.lang.String")
    val f = ctx.addReferenceObj("jsRegexFlags", flags, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.projections.js.JsRegexOps.colTest($c, $p, $f)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

private[js] case class JsRegexMatch(child: Expression, pattern: String,
    flags: String) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    JsRegexColumns.checkStr(child.dataType, "js_regex_match")
  override def eval(input: InternalRow): Any = {
    val s = child.eval(input)
    if (s == null) null
    else JsRegexOps.colMatch(s.asInstanceOf[UTF8String], pattern, flags)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("jsRegexPat", pattern, "java.lang.String")
    val f = ctx.addReferenceObj("jsRegexFlags", flags, "java.lang.String")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        ${c.isNull} ? null :
          graft.projections.js.JsRegexOps.colMatch(${c.value}, $p, $f);
      boolean ${ev.isNull} = (${ev.value} == null);""")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

private[js] case class JsRegexReplace(left: Expression, right: Expression,
    pattern: String, flags: String) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"js_regex_replace expects string inputs")
  override def nullSafeEval(s: Any, rep: Any): Any =
    JsRegexOps.colReplace(s.asInstanceOf[UTF8String],
      rep.asInstanceOf[UTF8String], pattern, flags)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("jsRegexPat", pattern, "java.lang.String")
    val f = ctx.addReferenceObj("jsRegexFlags", flags, "java.lang.String")
    defineCodeGen(ctx, ev, (s, rep) =>
      s"graft.projections.js.JsRegexOps.colReplace($s, $rep, $p, $f)")
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

private[js] case class JsRegexSplit(child: Expression, pattern: String,
    flags: String, limit: Option[Double]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def checkInputDataTypes(): TypeCheckResult =
    JsRegexColumns.checkStr(child.dataType, "js_regex_split")
  override def nullSafeEval(v: Any): Any =
    JsRegexOps.colSplit(v.asInstanceOf[UTF8String], pattern, flags,
      limit.isDefined, limit.getOrElse(0.0))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("jsRegexPat", pattern, "java.lang.String")
    val f = ctx.addReferenceObj("jsRegexFlags", flags, "java.lang.String")
    val hasLim = limit.isDefined
    val lim = limit.getOrElse(0.0)
    defineCodeGen(ctx, ev, c =>
      s"graft.projections.js.JsRegexOps.colSplit($c, $p, $f, $hasLim, $lim)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

private[js] case class JsRegexSearch(child: Expression, pattern: String,
    flags: String) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    JsRegexColumns.checkStr(child.dataType, "js_regex_search")
  override def nullSafeEval(v: Any): Any =
    JsRegexOps.colSearch(v.asInstanceOf[UTF8String], pattern, flags)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("jsRegexPat", pattern, "java.lang.String")
    val f = ctx.addReferenceObj("jsRegexFlags", flags, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.projections.js.JsRegexOps.colSearch($c, $p, $f)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}