package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native sliding-window 128-bit fingerprints over a token array — the
  * substring-census hot loop (Lee et al. 2021 window hashes) as ONE
  * compiled expression: for every k-token window starting at 1-based
  * position i, emits (i, h1, h2) where h1/h2 are independent XXH64 chains
  * over per-token hashes. Documents shorter than k tokens yield an empty
  * array.
  *
  * Replaces the `transform(sequence(...), i -> xxhash64(slice(w, i, k)))`
  * higher-order-function formulation: HOFs are CodegenFallback — every
  * window paid an interpreted expression-tree walk (slice allocation,
  * boxed struct construction, re-hashing each token's BYTES once per
  * covering window). The ×300 stage diag attributed 59% of
  * dedup_substring_remove's wall clock to that map stage. Here each
  * token's bytes are hashed exactly TWICE per document (two independent
  * seeds), and each window does 2k compiled `hashLong` chain steps —
  * no allocation beyond the result array.
  *
  * Key-equality contract (what the census needs): equal window text ⇒
  * equal (h1, h2); two DIFFERENT windows collide only on a simultaneous
  * pairwise collision in BOTH independent token-hash streams (~2⁻¹²⁸ per
  * token pair) or both chain hashes (~2⁻¹²⁸) — the repo's accepted
  * winKey trade (64 bits alone would give ~10⁴ expected collisions on
  * the ~10¹² windows of a 100 TB corpus). The DuckDB oracle groups
  * windows by their literal text, so a collision would surface as an
  * oracle mismatch, not silently. */
case class WindowHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"window size k must be >= 1, got $k")

  override def dataType: DataType = WindowHashes.OutType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"window_hashes expects array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any =
    WindowHashes.compute(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WindowHashes$$.MODULE$$.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

object WindowHashes {
  /** One row per window: 1-based start + the two key halves, all flat
    * (no nested struct — 16 bytes of key per census row through every
    * downstream exchange instead of a pointered struct). */
  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false))), containsNull = false)

  private val Seed1 = 42L // xxhash64's default seed — continuity with r16 keys
  private val Seed2 = 777L

  def compute(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val a1 = new Array[Long](n)
    val a2 = new Array[Long](n)
    var t = 0
    while (t < n) {
      val s = tokens.getUTF8String(t)
      if (s == null) { a1(t) = Seed1; a2(t) = Seed2 }
      else {
        a1(t) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed1)
        a2(t) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed2)
      }
      t += 1
    }
    val m = n - k + 1
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      var h1 = Seed1
      var h2 = Seed2
      var j = i
      val end = i + k
      while (j < end) {
        h1 = XXH64.hashLong(a1(j), h1)
        h2 = XXH64.hashLong(a2(j), h2)
        j += 1
      }
      out(i) = new GenericInternalRow(Array[Any](i + 1, h1, h2))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: window_hashes(tokens, k). */
  def apply(tokens: Column, k: Int): Column =
    Bridge.column(WindowHashes(Bridge.expression(tokens), k))
}
