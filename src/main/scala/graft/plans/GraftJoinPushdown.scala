package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** The safe subset of predicate pushdown and column pruning for the
  * custom temporal joins — re-implemented HERE because claiming the
  * marker joins at analysis time (see [[MarkerJoins]]) makes
  * [[AsofJoinPlan]]/[[IntervalJoinPlan]] opaque to the built-in
  * optimizer rules, and the built-ins' row-wise assumptions were the
  * reason to hide from them in the first place. What IS algebraically
  * valid per operator:
  *
  *  - As-of join: each output row is f(left_row, ALL right rows of the
  *    key), so LEFT-only predicates commute (dropping left rows drops
  *    exactly their outputs) but right-side predicates do NOT — they
  *    change which right row is "latest at-or-before". Left-only
  *    conjuncts push to the left child; everything else stays above.
  *  - Interval overlap join: a genuine row-wise inner theta join
  *    (overlap(l, r) reads one row per side), so BOTH left-only and
  *    right-only conjuncts push through — to their respective children.
  *
  * Column pruning: the SQL-surface payload defaults to the right side's
  * full output; a Project above narrows it to the referenced payload
  * columns and each child gets a Project keeping only join inputs +
  * referenced columns — so `SELECT two columns FROM ... graft_asof`
  * reaches the parquet scan as a two-column ReadSchema instead of a
  * full-width scan (the 100 TB difference between enriching an event
  * table and re-reading it).
  *
  * Only deterministic predicates move (nondeterministic ones must
  * evaluate per OUTPUT row, the same rule PushPredicateThroughNonJoin
  * applies). Every rewrite strictly shrinks something (conjunct moved,
  * payload narrowed, child output narrowed), so the fixedPoint batch
  * converges.
  */
object GraftJoinPushdown extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x => Seq(x)
  }

  private def filterOver(keep: Seq[Expression], node: LogicalPlan): LogicalPlan =
    keep.reduceOption(And).map(Filter(_, node)).getOrElse(node)

  /** Project(child to `needed`) when that strictly narrows it. */
  private def prune(child: LogicalPlan, needed: AttributeSet): LogicalPlan =
    if (child.output.exists(!needed.contains(_)))
      Project(child.output.filter(needed.contains), child)
    else child

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // ---- predicate pushdown -------------------------------------------
    case f @ Filter(cond, a: AsofJoinPlan) =>
      val (push, keep) = conjuncts(cond).partition(c =>
        c.deterministic && c.references.subsetOf(a.left.outputSet))
      if (push.isEmpty) f
      else filterOver(keep,
        a.copy(left = Filter(push.reduce(And), a.left)))

    case f @ Filter(cond, i: IntervalJoinPlan) =>
      val (lPush, rest) = conjuncts(cond).partition(c =>
        c.deterministic && c.references.subsetOf(i.left.outputSet))
      val (rPush, keep) = rest.partition(c =>
        c.deterministic && c.references.subsetOf(i.right.outputSet))
      if (lPush.isEmpty && rPush.isEmpty) f
      else filterOver(keep, i.copy(
        left = filterOver(lPush, i.left),
        right = filterOver(rPush, i.right)))

    // ---- column pruning -----------------------------------------------
    // a Project above (directly, or over the residual Filter the as-of
    // right-side predicates legitimately leave in place) narrows the
    // payload and both children to what the query actually reads
    case p @ Project(fields, a: AsofJoinPlan) =>
      val narrowed = pruneAsof(a, AttributeSet(fields.flatMap(_.references)))
      if (narrowed == a) p else Project(fields, narrowed)

    case p @ Project(fields, f @ Filter(cond, a: AsofJoinPlan)) =>
      val narrowed = pruneAsof(a,
        AttributeSet(fields.flatMap(_.references)) ++ cond.references)
      if (narrowed == a) p else Project(fields, f.copy(child = narrowed))

    case p @ Project(fields, i: IntervalJoinPlan) =>
      val narrowed = pruneInterval(i, AttributeSet(fields.flatMap(_.references)))
      if (narrowed == i) p else Project(fields, narrowed)

    case p @ Project(fields, f @ Filter(cond, i: IntervalJoinPlan)) =>
      val narrowed = pruneInterval(i,
        AttributeSet(fields.flatMap(_.references)) ++ cond.references)
      if (narrowed == i) p else Project(fields, f.copy(child = narrowed))

    // an Aggregate directly over the node (no Project in between — the
    // common `join.groupBy(...).agg(...)` shape) prunes the same way
    case ag @ Aggregate(gs, as_, a: AsofJoinPlan, _) =>
      val narrowed = pruneAsof(a,
        AttributeSet(gs.flatMap(_.references) ++ as_.flatMap(_.references)))
      if (narrowed == a) ag else ag.copy(child = narrowed)

    case ag @ Aggregate(gs, as_, i: IntervalJoinPlan, _) =>
      val narrowed = pruneInterval(i,
        AttributeSet(gs.flatMap(_.references) ++ as_.flatMap(_.references)))
      if (narrowed == i) ag else ag.copy(child = narrowed)
  }

  private def pruneAsof(a: AsofJoinPlan, refs: AttributeSet): AsofJoinPlan = {
    val payload = a.rightPayload.filter(refs.contains)
    val rNeeded = AttributeSet(
      a.rightKeys.flatMap(_.references) ++ a.rightTs.references ++
        a.rightTie.references) ++ AttributeSet(payload)
    val lNeeded = AttributeSet(
      a.leftKeys.flatMap(_.references) ++ a.leftTs.references) ++
      (refs -- AttributeSet(a.rightPayload))
    a.copy(
      left = prune(a.left, lNeeded),
      right = prune(a.right, rNeeded),
      rightPayload = payload)
  }

  private def pruneInterval(
      i: IntervalJoinPlan, refs: AttributeSet): IntervalJoinPlan = {
    val payload = i.rightPayload.filter(refs.contains)
    val rNeeded = AttributeSet(
      i.rightKeys.flatMap(_.references) ++ i.rightStart.references ++
        i.rightEnd.references) ++ AttributeSet(payload)
    val lNeeded = AttributeSet(
      i.leftKeys.flatMap(_.references) ++ i.leftStart.references ++
        i.leftEnd.references) ++ (refs -- AttributeSet(i.rightPayload))
    i.copy(
      left = prune(i.left, lNeeded),
      right = prune(i.right, rNeeded),
      rightPayload = payload)
  }
}
