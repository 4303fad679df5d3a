package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType, VariantType}
import org.apache.spark.types.variant.VariantUtil
import org.apache.spark.unsafe.types.{UTF8String, VariantVal}

/** The top-level TYPE TAG of a variant value as an O(1) header read —
  * the drop-in replacement for `schema_of_variant` in the JS column
  * compiler's runtime type dispatch. `schema_of_variant` builds the full
  * RECURSIVE schema string ("OBJECT<k: BIGINT, …>", allocating and
  * sorting per call); the dispatch only ever asks "string / number /
  * boolean / object / array?", which the first header byte answers
  * (measured: the schema build dominated a compiled partitionBy key
  * read 4× at 10× sf0.1). Tag names match schema_of_variant's spelling
  * for the types JSON can produce — "STRING", "BIGINT", "DOUBLE",
  * "DECIMAL" (prefix of the parameterized form, so `startsWith` guards
  * hold), "BOOLEAN", "OBJECT", "ARRAY", "VOID" — so call sites compare
  * against the same literals. */
case class JsVariantKind(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == VariantType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"js_variant_kind expects a variant input, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    JsVariantKind.kind(v.asInstanceOf[VariantVal])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.JsVariantKind.kind($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsVariantKind {
  private val STRING = UTF8String.fromString("STRING")
  private val BIGINT = UTF8String.fromString("BIGINT")
  private val DOUBLE = UTF8String.fromString("DOUBLE")
  private val DECIMAL = UTF8String.fromString("DECIMAL")
  private val BOOLEAN = UTF8String.fromString("BOOLEAN")
  private val OBJECT = UTF8String.fromString("OBJECT")
  private val ARRAY = UTF8String.fromString("ARRAY")
  private val VOID = UTF8String.fromString("VOID")
  private val OTHER = UTF8String.fromString("OTHER")

  /** Static entry point for generated code. Goes through the Variant
    * wrapper, NOT a raw `getType(bytes, 0)` read — an extracted member
    * can reference into its parent's buffer at a non-zero position
    * (first caught as every partition key reading as OBJECT → null). */
  def kind(v: VariantVal): UTF8String =
    new org.apache.spark.types.variant.Variant(v.getValue, v.getMetadata)
      .getType match {
      case VariantUtil.Type.STRING => STRING
      case VariantUtil.Type.LONG => BIGINT
      case VariantUtil.Type.DOUBLE => DOUBLE
      case VariantUtil.Type.DECIMAL => DECIMAL
      case VariantUtil.Type.BOOLEAN => BOOLEAN
      case VariantUtil.Type.OBJECT => OBJECT
      case VariantUtil.Type.ARRAY => ARRAY
      case VariantUtil.Type.NULL => VOID
      case _ => OTHER // dates/binary/uuid — unreachable from JSON text
    }

  def apply(c: Column): Column = Bridge.column(JsVariantKind(Bridge.expression(c)))
}
