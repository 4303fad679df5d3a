package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.projections.js.{JsError, JsNull, JsObj, JsUndef, JsVal}

/** Navigate a member path inside a raw JSON text column and render the
  * value as its exact ECMAScript `JSON.stringify` form — the engine the
  * JS column compiler uses for `s.f = e.body.x` overwrites and dynamic
  * emit bodies whose values are (or contain) OBJECTS or ARRAYS.
  *
  * Rendering from the TEXT (via the interpreter's own `JsVal.parseJson`
  * + `stringify`) rather than from a VARIANT is what makes the output
  * byte-identical to the interpreter: Spark's variant encoding SORTS
  * object keys and keeps decimal spellings ("1.50"), while JS preserves
  * insertion order and re-renders every number through Number::toString.
  *
  * Semantics per ES member access + JSON.stringify, matching
  * `CompiledJsProjection`'s envelope `body` getter
  * (JsProjection.scala:913): NULL/unparseable input text is `undefined`;
  * reading a property OF undefined/null throws (the handler-level
  * TypeError the interpreter raises); plain properties of scalars and
  * arrays are undefined; a final value of undefined renders as SQL NULL
  * (the caller skips the key / substitutes "null" as its context
  * demands). NULL input therefore cannot short-circuit — null handling
  * is manual, not `nullSafeEval`. */
case class JsJsonPath(child: Expression, path: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"js_json_path expects a string input, got ${child.dataType.simpleString}")

  @transient private lazy val segs: Array[String] = path.toArray

  override def eval(input: InternalRow): Any =
    JsJsonPath.render(child.eval(input).asInstanceOf[UTF8String], segs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val segsRef =
      ctx.addReferenceObj("jsJsonPathSegs", path.toArray, "java.lang.String[]")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      UTF8String ${ev.value} = graft.functions.JsJsonPath.render(
        ${c.isNull} ? null : ${c.value}, $segsRef);
      boolean ${ev.isNull} = (${ev.value} == null);""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsJsonPath {
  /** Static entry point for generated code. */
  def render(data: UTF8String, segs: Array[String]): UTF8String = {
    var cur: JsVal =
      if (data == null) JsUndef
      else try JsVal.parseJson(data.toString) catch { case _: JsError => JsUndef }
    var i = 0
    while (i < segs.length) {
      val p = segs(i)
      cur match {
        case JsUndef =>
          throw new RuntimeException(s"cannot read property '$p' of undefined")
        case JsNull =>
          throw new RuntimeException(s"cannot read property '$p' of null")
        case JsObj(fields) => cur = fields.getOrElse(p, JsUndef)
        case _ => cur = JsUndef // scalar/array receivers: plain props are undefined
      }
      i += 1
    }
    JsVal.stringify(cur).map(UTF8String.fromString).orNull
  }

  def apply(c: Column, path: Seq[String]): Column =
    Bridge.column(JsJsonPath(Bridge.expression(c), path))
}
