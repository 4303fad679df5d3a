package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ES `parseInt(str, radix)` as a native codegen'd expression,
  * delegating to the SAME `JsVal.parseIntStr` the interpreter native
  * uses — longest radix-digit prefix, sign strip, NaN when empty — so a
  * compiled `s.n += parseInt(e.body.id)` is bit-identical to the
  * interpreter fold. The radix is a compile-time constant of the
  * handler source (non-literal radixes stay interpreted). NaN is a
  * VALUE; only NULL in is NULL out. */
case class JsParseInt(child: Expression, radix: Int) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"js_parse_int expects a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    JsParseInt.parse(v.asInstanceOf[UTF8String], radix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.JsParseInt.parse($c, $radix)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsParseInt {
  /** Static entry point for generated code. */
  def parse(s: UTF8String, radix: Int): Double =
    graft.projections.js.JsVal.parseIntStr(s.toString, radix)

  def apply(c: Column, radix: Int): Column =
    Bridge.column(JsParseInt(Bridge.expression(c), radix))
}

/** ES `parseFloat(str)` — longest decimal-literal prefix — over the
  * interpreter's own `JsVal.parseFloatStr`. */
case class JsParseFloat(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"js_parse_float expects a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    JsParseFloat.parse(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.JsParseFloat.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsParseFloat {
  /** Static entry point for generated code. */
  def parse(s: UTF8String): Double =
    graft.projections.js.JsVal.parseFloatStr(s.toString)

  def apply(c: Column): Column = Bridge.column(JsParseFloat(Bridge.expression(c)))
}
