package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ECMAScript Number::toString (ECMA-262 6.1.6.1.20) as a native codegen'd
  * expression — the exact formatting `JsVal.numToStr` gives the
  * interpreter ("1" not "1.0", plain decimal to 1e21, "1e+21"/"1e-7"
  * beyond, "NaN"/"Infinity"), shared by the JS column compiler
  * ([[graft.projections.js.JsColumnCompiler]]) wherever a compiled
  * projection renders a number into a partition key, a concatenated
  * string, or state JSON. One static call per row; no interpreter. NaN
  * input is a VALUE here ("NaN"), not SQL NULL — only NULL in is NULL
  * out. */
case class JsNumberString(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"js_number_string expects a double input, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    JsNumberString.format(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.JsNumberString.format($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsNumberString {
  /** Static entry point for generated code. */
  def format(d: Double): UTF8String =
    UTF8String.fromString(graft.projections.js.JsVal.numToStr(d))

  def apply(c: Column): Column = Bridge.column(JsNumberString(Bridge.expression(c)))
}
