package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(Float|Double) embedding columns, built from
  * codegen'd higher-order functions (no UDFs, no RDDs).
  *
  * Determinism: every reduction is an ORDERED left fold (`aggregate` =
  * ((0+x1)+x2)+...), so results are bit-identical across runs, partitions,
  * and engines that fold in the same order (the DuckDB oracle mirrors the
  * fold with list_reduce). Floats are widened to double BEFORE any
  * arithmetic so both engines multiply/accumulate in float64.
  */
object VectorOps {

  private def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Ordered-fold sum of an array<double>. */
  def foldSum(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two embedding columns (widened to double). */
  def dot(a: Column, b: Column): Column =
    foldSum(zip_with(asDouble(a), asDouble(b), (x, y) => x * y))

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity; formula shape `dot / (sqrt(na) * sqrt(nb))` is
    * mirrored verbatim in the oracle SQL so the IEEE op sequence matches.
    */
  def cosine(a: Column, b: Column, normSqA: Column, normSqB: Column): Column =
    dot(a, b) / (sqrt(normSqA) * sqrt(normSqB))
}
