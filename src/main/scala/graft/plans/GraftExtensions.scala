package graft.plans

import graft.functions.{DotProduct, GraftFunctions, NearestCells, NearestCentroid, PolyHashExpr, ShingleGenerator}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers graft's native Catalyst
  * expressions so `SELECT graft_dot(a, b)` works in plain SQL on any
  * session built with `.withExtensions(new GraftExtensions)` (or via
  * spark.sql.extensions=graft.plans.GraftExtensions on a cluster).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // event-time predicates on the ns-normalized column fold back onto
    // the raw timestamp so parquet min/max pruning still applies
    e.injectOptimizerRule(_ => TsNanosPushdown)
    // whole-operator extension: plans AsofJoinPlan as the sorted-merge
    // AsofJoinExec (see plans/AsofJoin.scala)
    e.injectPlannerStrategy(_ => AsofJoinStrategy)
    e.injectPlannerStrategy(_ => IntervalJoinStrategy)
    // SQL surface for the whole-operator joins: ON-clause markers
    // (graft_asof / graft_overlaps) rewritten to the custom plans.
    // ANALYSIS-time (resolution rule), deliberately: the optimizer's
    // join rules assume row-wise predicates and would transform the
    // marker Join (EliminateOuterJoin, PushPredicateThroughJoin) in
    // ways that are invalid for an as-of match — see MarkerJoins.scala
    e.injectResolutionRule(_ => MarkerJoinRewrite)
    // the safe pushdown/pruning subset for the now-opaque custom nodes:
    // left-only filters through the as-of join, both sides through the
    // interval join, payload/column pruning from Projects above
    e.injectOptimizerRule(_ => GraftJoinPushdown)
    e.injectFunction((
      new FunctionIdentifier(MarkerJoins.AsofName),
      new ExpressionInfo(classOf[GraftAsofMarker].getName, MarkerJoins.AsofName),
      MarkerJoins.buildAsof))
    e.injectFunction((
      new FunctionIdentifier(MarkerJoins.OverlapsName),
      new ExpressionInfo(classOf[GraftOverlapsMarker].getName, MarkerJoins.OverlapsName),
      MarkerJoins.buildOverlaps))
    e.injectFunction((
      new FunctionIdentifier(MarkerJoins.RangeName),
      new ExpressionInfo(classOf[GraftRangeMarker].getName, MarkerJoins.RangeName),
      MarkerJoins.buildRange))
    e.injectFunction((
      new FunctionIdentifier(MarkerJoins.SaltedName),
      new ExpressionInfo(classOf[GraftSaltedMarker].getName, MarkerJoins.SaltedName),
      MarkerJoins.buildSalted))
    e.injectFunction((
      new FunctionIdentifier(GraftFunctions.DotName),
      new ExpressionInfo(classOf[DotProduct].getName, GraftFunctions.DotName),
      GraftFunctions.buildDot))
    e.injectFunction((
      new FunctionIdentifier(GraftFunctions.PolyHashName),
      new ExpressionInfo(classOf[PolyHashExpr].getName, GraftFunctions.PolyHashName),
      GraftFunctions.buildPolyHash))
    e.injectFunction((
      new FunctionIdentifier(GraftFunctions.ShinglesName),
      new ExpressionInfo(classOf[ShingleGenerator].getName, GraftFunctions.ShinglesName),
      GraftFunctions.buildShingles))
    e.injectFunction((
      new FunctionIdentifier(GraftFunctions.ShinglesDistinctName),
      new ExpressionInfo(classOf[ShingleGenerator].getName, GraftFunctions.ShinglesDistinctName),
      GraftFunctions.buildShinglesDistinct))
    e.injectFunction((
      new FunctionIdentifier(GraftFunctions.NearestCentroidName),
      new ExpressionInfo(classOf[NearestCentroid].getName, GraftFunctions.NearestCentroidName),
      GraftFunctions.buildNearestCentroid))
    e.injectFunction((
      new FunctionIdentifier(GraftFunctions.NearestCellsName),
      new ExpressionInfo(classOf[NearestCells].getName, GraftFunctions.NearestCellsName),
      GraftFunctions.buildNearestCells))
  }
}
