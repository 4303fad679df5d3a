package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A string column as a JSON string literal — quotes + the exact escape
  * set `JsVal.writeJsonString` uses for JSON.stringify, so compiled state
  * rendering ([[graft.projections.js.JsColumnCompiler]] transformBy
  * output) is byte-identical to the interpreter's. One static call per
  * row, codegen'd like [[JsNumberString]]. */
case class JsJsonString(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"js_json_string expects a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    JsJsonString.quote(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.JsJsonString.quote($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsJsonString {
  /** Static entry point for generated code. */
  def quote(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.projections.js.JsVal.jsonQuote(s.toString))

  def apply(c: Column): Column = Bridge.column(JsJsonString(Bridge.expression(c)))
}
