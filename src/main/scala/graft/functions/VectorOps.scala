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

  /** Reference dot product from built-in higher-order functions — same
    * fold order as the fast path; kept for cross-checking bit-equality.
    */
  def dotFold(a: Column, b: Column): Column =
    foldSum(zip_with(asDouble(a), asDouble(b), (x, y) => x * y))

  /** Dot product via the fused codegen expression (see DotProduct.scala).
    * Requires GraftFunctions.register(spark) / GraftExtensions on the
    * session — every graft operator that uses it registers on entry.
    */
  def dot(a: Column, b: Column): Column =
    call_function(GraftFunctions.DotName, a, b)

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity; formula shape `dot / (sqrt(na) * sqrt(nb))` is
    * mirrored verbatim in the oracle SQL so the IEEE op sequence matches.
    */
  def cosine(a: Column, b: Column, normSqA: Column, normSqB: Column): Column =
    dot(a, b) / (sqrt(normSqA) * sqrt(normSqB))
}
