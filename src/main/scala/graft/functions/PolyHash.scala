package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for the polynomial rolling hash
  * `fold(0, cp -> (acc * 31 + cp) mod P)` over a string's codepoints —
  * the shingle-id function of the dedup family (P = 2^31 - 1).
  *
  * A plain object (no companion class) so Scala emits static forwarders:
  * generated code calls `graft.functions.PolyHashKernel.hash(...)`
  * directly — one static call per row, loop JIT-compiled, no boxing.
  *
  * ASCII fast path: when numChars == numBytes every byte IS its
  * codepoint, so the loop reads bytes with no String materialization;
  * otherwise it falls back to a codepoint walk (identical result — the
  * DuckDB oracle folds over regexp-extracted characters' codepoints).
  */
object PolyHashKernel {
  val Mod: Long = 2147483647L

  def hash(s: UTF8String): Long = {
    val nb = s.numBytes()
    if (s.numChars() == nb) {
      var h = 0L
      var i = 0
      while (i < nb) {
        h = (h * 31L + (s.getByte(i) & 0xffL)) % Mod
        i += 1
      }
      h
    } else {
      val str = s.toString
      var h = 0L
      var i = 0
      while (i < str.length) {
        val cp = str.codePointAt(i)
        h = (h * 31L + cp) % Mod
        i += Character.charCount(cp)
      }
      h
    }
  }
}

/** Native codegen expression wrapping PolyHashKernel — the fast path of
  * `Dedup.polyHash`. Why not `aggregate(regexp_extract_all(s, '.'), ...)`:
  * that shape materializes a per-character string array and interprets a
  * lambda per element — at millions of (doc, shingle) edges it dominates
  * the MinHash/SimHash signature stage. This is a single static call in
  * whole-stage codegen, zero allocation on the ASCII path.
  */
case class PolyHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${GraftFunctions.PolyHashName} expects a string input, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(s: Any): Any =
    PolyHashKernel.hash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHashKernel.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
}
