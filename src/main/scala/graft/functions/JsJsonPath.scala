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

  /** Same navigation, rendered as ES ToString instead of JSON.stringify
    * ([[JsPathToString]]): arrays join recursively ("1,2"), objects are
    * "[object Object]", undefined/null spell themselves. */
  def renderToStr(data: UTF8String, segs: Array[String]): UTF8String = {
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
        case _ => cur = JsUndef
      }
      i += 1
    }
    UTF8String.fromString(JsVal.toStr(cur))
  }

  def apply(c: Column, path: Seq[String]): Column =
    Bridge.column(JsJsonPath(Bridge.expression(c), path))
}

/** ES ToString of a JSON value navigated by member path from its raw
  * text — the `String(e.body.x)` / concatenation engine for dynamics
  * with provenance, byte-exact with the interpreter for EVERY value
  * shape including arrays (recursive comma join), which the variant
  * type-dispatch chain cannot express. */
case class JsPathToString(child: Expression, path: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"js_path_to_string expects a string input, got ${child.dataType.simpleString}")

  @transient private lazy val segs: Array[String] = path.toArray

  override def eval(input: InternalRow): Any =
    JsJsonPath.renderToStr(child.eval(input).asInstanceOf[UTF8String], segs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val segsRef =
      ctx.addReferenceObj("jsPathToStrSegs", path.toArray, "java.lang.String[]")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      UTF8String ${ev.value} = graft.functions.JsJsonPath.renderToStr(
        ${c.isNull} ? null : ${c.value}, $segsRef);
      boolean ${ev.isNull} = false;""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsPathToString {
  def apply(c: Column, path: Seq[String]): Column =
    Bridge.column(JsPathToString(Bridge.expression(c), path))
}

/** JS `String.prototype.length` — UTF-16 code UNITS, where SQL `length`
  * counts codepoints. Units = codepoints + one extra per supplementary
  * character; supplementary characters are exactly the 4-byte UTF-8
  * sequences, counted straight off the bytes with no String
  * materialization. */
case class JsUtf16Length(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"js_utf16_length expects a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    JsUtf16Length.len(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.JsUtf16Length.len($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsUtf16Length {
  /** Static entry point for generated code. */
  def len(s: UTF8String): Long = {
    val bytes = s.numBytes()
    var i = 0
    var units = 0L
    while (i < bytes) {
      val b = s.getByte(i) & 0xFF
      val size =
        if (b < 0x80) 1 else if (b < 0xE0) 2 else if (b < 0xF0) 3 else 4
      units += (if (size == 4) 2 else 1)
      i += size
    }
    units
  }

  def apply(c: Column): Column = Bridge.column(JsUtf16Length(Bridge.expression(c)))
}
