package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native table-generating expression emitting word 3-gram shingles
  * (`graft_shingles`) — the custom-Generator face of the dedup family's
  * hot path, replacing the three-array HOF construction
  * `explode(transform(sequence(...), i -> concat_ws(' ', w[i], w[i+1],
  * w[i+2])))` over `split(text, ' ')`.
  *
  * Why it is faster: the HOF shape materializes (1) the word array, (2)
  * the index sequence, (3) the transformed shingle array — all per row,
  * before the explode even starts. This generator makes ONE copy per
  * document (`UTF8String.getBytes` materializes the value's bytes when
  * it doesn't exactly span its backing array — the common case for
  * UnsafeRow/columnar-scan inputs), scans those bytes once for space
  * positions, then emits each shingle as a copy-free slice of that one
  * buffer: words split on a single space are separated by exactly one
  * space in the source, so the span from word i's first byte to word
  * i+2's last byte IS the `concat_ws(' ', ...)` result. (Splitting on
  * the 0x20 byte is exact for UTF-8: a space byte cannot occur inside a
  * multi-byte sequence.) One copy + k slices still beats the HOF form's
  * three per-row array materializations.
  *
  * Semantics are bit-identical to the HOF form, including the empty-word
  * behavior of `split` with its implicit limit -1 (consecutive spaces
  * yield empty words; trailing empties kept) — spec-asserted against the
  * HOF twin on crafted and real corpora. Interpreted eval (CodegenFallback)
  * by design: GenerateExec evaluates the generator itself outside
  * whole-stage codegen either way; the surrounding pipeline stays codegen.
  */
/** `distinct = true` (`graft_shingles_distinct`) additionally drops
  * repeated shingles WITHIN the document, emitting each doc's shingle
  * SET in first-occurrence order (r13 opt): shingle dedupe is
  * document-local by definition, so doing it here — a per-row hash set
  * bounded by the doc's own shingle count — replaces the corpus-wide
  * `.distinct()` exchange the pair family used to pay after the
  * explode. Multiset semantics (term frequency et al.) stay on the
  * default form.
  */
case class ShingleGenerator(child: Expression, distinct: Boolean = false)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${GraftFunctions.ShinglesName} expects a string input, got ${other.catalogString}")
  }

  override def elementSchema: StructType =
    new StructType().add("shingle", StringType, nullable = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      val nb = bytes.length
      // word boundaries: starts(k) .. ends(k) exclusive; empty doc -> one
      // empty word, matching split(text, ' ')
      var nWords = 1
      var i = 0
      while (i < nb) { if (bytes(i) == ' '.toByte) nWords += 1; i += 1 }
      if (nWords < 3) Nil
      else {
        val starts = new Array[Int](nWords)
        val ends = new Array[Int](nWords)
        var w = 0
        starts(0) = 0
        i = 0
        while (i < nb) {
          if (bytes(i) == ' '.toByte) { ends(w) = i; w += 1; starts(w) = i + 1 }
          i += 1
        }
        ends(w) = nb
        val all = (0 until nWords - 2).iterator.map { k =>
          val from = starts(k)
          UTF8String.fromBytes(bytes, from, ends(k + 2) - from)
        }
        val out =
          if (!distinct) all
          else {
            // per-document dedupe: the set is bounded by this doc's own
            // shingle count, and UTF8String hashes/compares by bytes
            val seen = new java.util.HashSet[UTF8String]()
            all.filter(seen.add)
          }
        out.map(s => new GenericInternalRow(Array[Any](s)))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGenerator =
    copy(child = newChild)
}
