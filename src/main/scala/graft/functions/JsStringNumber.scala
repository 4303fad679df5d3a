package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ECMAScript ToNumber of a string as a native codegen'd expression —
  * the exact dual of [[JsNumberString]], delegating to the SAME
  * `JsVal.strToNum` the interpreter's `Number(str)` / unary `+` use, so
  * a compiled `Number(m[0])` is bit-identical to the interpreter fold on
  * every input ("" → 0, "  1.5 " → 1.5, anything unparseable → NaN).
  * NaN is a VALUE ("abc" → NaN double), not SQL NULL — only NULL in is
  * NULL out; the caller maps SQL NULL per its null convention
  * (JS null → 0, undefined → NaN). */
case class JsStringNumber(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"js_string_number expects a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    JsStringNumber.parse(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.JsStringNumber.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsStringNumber {
  /** Static entry point for generated code. */
  def parse(s: UTF8String): Double =
    graft.projections.js.JsVal.strToNum(s.toString)

  def apply(c: Column): Column = Bridge.column(JsStringNumber(Bridge.expression(c)))
}
