package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused dot product over two array<float|double> columns — a native
  * Catalyst expression with whole-stage codegen.
  *
  * Why not `aggregate(zip_with(a, b, _*_), 0d, _+_)`: that shape allocates
  * an intermediate array and interprets two lambdas PER ROW — at 2M
  * candidate pairs x 64 dims that's the dominant cost of the similarity
  * operators. This expression compiles to a tight scalar loop inside the
  * generated code (no allocation, no virtual calls), ~an order of
  * magnitude faster, while keeping the EXACT same float64 left-fold
  * accumulation order: `s += (double)a[i] * (double)b[i]` — so results
  * stay bit-identical to the built-in fold and to the DuckDB oracle's
  * list_reduce.
  *
  * Array elements must be non-null (embedding vectors); element nulls are
  * not checked in the hot loop by design.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects array<float|double> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  /** NULL on length mismatch (same as the zip_with fold, which pads with
    * null, and the oracle's out-of-bounds list index) — a partial dot
    * product over truncated inputs would be a plausible-looking wrong
    * number, exactly the failure mode that must surface as null instead.
    */
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val xf = elemType(left) == FloatType
    val yf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      def get(arr: String, e: Expression) = elemType(e) match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case _ => s"$arr.getDouble($i)"
      }
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ${get(a, left)} * ${get(b, right)};
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Session registration for graft's native expressions. */
object GraftFunctions {
  val DotName = "graft_dot"
  val PolyHashName = "graft_polyhash"
  val ShinglesName = "graft_shingles"
  val ShinglesDistinctName = "graft_shingles_distinct"
  val NearestCentroidName = "graft_nearest_centroid"
  val NearestCellsName = "graft_nearest_cells"

  /** Arity-checked builder shared by both registration paths. */
  def buildDot(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"$DotName requires exactly 2 arguments (array<float|double>), got ${exprs.length}")
    DotProduct(exprs.head, exprs(1))
  }

  def buildPolyHash(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"$PolyHashName requires exactly 1 argument (string), got ${exprs.length}")
    PolyHashExpr(exprs.head)
  }

  def buildShingles(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"$ShinglesName requires exactly 1 argument (string), got ${exprs.length}")
    ShingleGenerator(exprs.head)
  }

  def buildShinglesDistinct(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"$ShinglesDistinctName requires exactly 1 argument (string), got ${exprs.length}")
    ShingleGenerator(exprs.head, distinct = true)
  }

  def buildNearestCentroid(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"$NearestCentroidName requires exactly 3 arguments (cents, vec, nsq), got ${exprs.length}")
    NearestCentroid(exprs.head, exprs(1), exprs(2))
  }

  def buildNearestCells(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 4,
      s"$NearestCellsName requires exactly 4 arguments (cents, vec, nsq, p), got ${exprs.length}")
    NearestCells(exprs.head, exprs(1), exprs(2), exprs(3))
  }

  /** Idempotent per-session registration (for sessions not built with
    * GraftExtensions).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      DotName, buildDot, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      PolyHashName, buildPolyHash, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ShinglesName, buildShingles, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ShinglesDistinctName, buildShinglesDistinct, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NearestCentroidName, buildNearestCentroid, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NearestCellsName, buildNearestCells, "built-in")
  }
}
