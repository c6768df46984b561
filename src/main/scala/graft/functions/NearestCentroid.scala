package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid assignment fused into ONE codegen'd scalar loop:
  * `graft_nearest_centroid(cents, vec, nsq)` returns the `cent_id` of the
  * centroid maximizing cosine(vec, cvec), ties to the SMALLER id — the
  * exact (cos DESC, cent_id ASC) order of the ranked-window formulation
  * and the SQL oracle.
  *
  * Why an expression and not a join: the IVF quantizers assign every
  * corpus row to its cell. As a crossJoin + window that shuffles
  * |corpus| x numCells scored rows and sorts them; as a max(struct)
  * aggregate it plans as SortAggregate (struct buffers are not
  * hash-aggregable) — the same sort again. As `aggregate()` over a
  * broadcast centroid array the shuffle disappears but higher-order
  * functions are CodegenFallback: the lambda interprets per centroid per
  * row and breaks the surrounding whole-stage codegen (measured ~15%
  * slower end-to-end than the window form at sf0.1 despite doing less
  * IO). This expression keeps the shuffle-free shape AND the tight loop:
  * the corpus streams map-only past a broadcast single-row centroid
  * array, each row costing numCells fused dot products — no exchange, no
  * sort, no interpretation.
  *
  * Arithmetic is bit-identical to the declarative form: the dot is the
  * same ascending-index float64 fold as [[DotProduct]], the cosine the
  * same `dot / (sqrt(nsq) * sqrt(cn))` op sequence, so assignments (and
  * thus results) hash-match the DuckDB oracle's row_number formulation.
  *
  * `cents` is array<struct<cent_id: long, cvec: array<float|double>,
  * cn: double>> — the collect_list build in Similarity.centArray. Field
  * ORDER is positional. Returns null only for an empty centroid array.
  */
case class NearestCentroid(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  private def cents: Expression = first
  private def vec: Expression = second

  private def centsStruct: StructType = first.dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  private def cvecElem: DataType = centsStruct.fields(1).dataType
    .asInstanceOf[ArrayType].elementType

  private def vecElem: DataType =
    second.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    val centsOk = first.dataType match {
      case ArrayType(StructType(Array(f0, f1, f2)), _) =>
        f0.dataType == LongType &&
          (f1.dataType match {
            case ArrayType(FloatType | DoubleType, _) => true
            case _ => false
          }) && f2.dataType == DoubleType
      case _ => false
    }
    val vecOk = second.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (centsOk && vecOk && third.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid expects (array<struct<long,array<float|double>,double>>, " +
        s"array<float|double>, double), got ${first.dataType.catalogString}, " +
        s"${second.dataType.catalogString}, ${third.dataType.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(centsAny: Any, vecAny: Any, nsqAny: Any): Any = {
    val cs = centsAny.asInstanceOf[ArrayData]
    val v = vecAny.asInstanceOf[ArrayData]
    val nsq = nsqAny.asInstanceOf[Double]
    val nc = cs.numElements()
    if (nc == 0) return null
    val vf = vecElem == FloatType
    val cf = cvecElem == FloatType
    val n = v.numElements()
    var bestCos = Double.NegativeInfinity
    var bestId = Long.MaxValue
    var c = 0
    while (c < nc) {
      val row = cs.getStruct(c, 3)
      val id = row.getLong(0)
      val cv = row.getArray(1)
      val cn = row.getDouble(2)
      var dot = 0.0
      var i = 0
      while (i < n) {
        val xv = if (vf) v.getFloat(i).toDouble else v.getDouble(i)
        val yv = if (cf) cv.getFloat(i).toDouble else cv.getDouble(i)
        dot += xv * yv
        i += 1
      }
      val cos = dot / (math.sqrt(nsq) * math.sqrt(cn))
      if (cos > bestCos || (cos == bestCos && id < bestId)) {
        bestCos = cos; bestId = id
      }
      c += 1
    }
    java.lang.Long.valueOf(bestId)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cs, v, nsq) => {
      val nc = ctx.freshName("nc")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val row = ctx.freshName("row")
      val cv = ctx.freshName("cv")
      val cn = ctx.freshName("cn")
      val dot = ctx.freshName("dot")
      val cos = ctx.freshName("cos")
      val id = ctx.freshName("id")
      val bestCos = ctx.freshName("bestCos")
      val bestId = ctx.freshName("bestId")
      def get(arr: String, idx: String, elem: DataType) = elem match {
        case FloatType => s"(double) $arr.getFloat($idx)"
        case _ => s"$arr.getDouble($idx)"
      }
      s"""
         |int $nc = $cs.numElements();
         |if ($nc == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $v.numElements();
         |  double $bestCos = Double.NEGATIVE_INFINITY;
         |  long $bestId = Long.MAX_VALUE;
         |  for (int $c = 0; $c < $nc; $c++) {
         |    InternalRow $row = $cs.getStruct($c, 3);
         |    long $id = $row.getLong(0);
         |    ArrayData $cv = $row.getArray(1);
         |    double $cn = $row.getDouble(2);
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += ${get(v, i, vecElem)} * ${get(cv, i, cvecElem)};
         |    }
         |    double $cos = $dot / (java.lang.Math.sqrt($nsq) * java.lang.Math.sqrt($cn));
         |    if ($cos > $bestCos || ($cos == $bestCos && $id < $bestId)) {
         |      $bestCos = $cos; $bestId = $id;
         |    }
         |  }
         |  ${ev.value} = $bestId;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NearestCentroid =
    copy(first = newFirst, second = newSecond, third = newThird)
}
