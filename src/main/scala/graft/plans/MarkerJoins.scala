package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, EqualNullSafe, EqualTo, Expression, Unevaluable}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan, ResolvedHint}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, StringType}

/** SQL surface for the whole-operator joins (plans/AsofJoin.scala,
  * plans/IntervalJoin.scala): boolean MARKER functions legal inside a
  * join's ON clause, plus the analysis rule that recognizes a join
  * carrying one and swaps the whole Join node for the corresponding
  * custom logical plan. This is the missing half of the extension
  * ladder — the DataFrame faces (`AsofJoin.asofJoinExec`,
  * `IntervalJoin.intervalJoinExec`) only serve Scala callers; a
  * `spark.sql` user writes
  *
  * {{{
  *   SELECT ... FROM facts f LEFT JOIN dim d
  *     ON f.user_id <=> d.user_id
  *    AND graft_asof(f.ts, d.ts, d.version_id)            -- backward
  *    -- or graft_asof(f.ts, d.ts, d.version_id, 'forward', 3600000000000)
  *
  *   SELECT ... FROM l JOIN r
  *     ON l.k <=> r.k AND graft_overlaps(l.vfrom, l.vto, r.vfrom, r.vto)
  * }}}
  *
  * and gets the same `AsofJoinExec`/`IntervalJoinExec` physical plans
  * (broadcast or shuffled by the same stats rule; `/*+ BROADCAST(d) */`
  * and `/*+ MERGE(d) */` hints force the choice exactly as they would
  * for an equi-join).
  *
  * Design decisions, all in the name of NEVER silently changing
  * semantics:
  *
  *  - The markers are [[Unevaluable]]: if the rewrite does not fire
  *    (extensions missing, marker smuggled somewhere the rule refuses),
  *    the query FAILS — it cannot run with different semantics.
  *  - Key equalities must be NULL-SAFE (`<=>`). The physical operators
  *    compare keys like a window partition — NULL keys group together —
  *    which is `<=>`, not `=`. A plain `=` key fails loudly with the
  *    reason instead of silently matching NULLs the SQL text said to
  *    drop.
  *  - `graft_asof` requires LEFT OUTER JOIN (an as-of join keeps every
  *    left row, null payload when unmatched); `graft_overlaps` requires
  *    INNER JOIN (only overlapping pairs survive). The other shape is a
  *    loud error, not a reinterpretation.
  *  - Direction/tolerance must be foldable literals: the physical plan
  *    is picked at planning time, so run-time-varying direction has no
  *    meaningful implementation.
  *
  * The rewrite runs at ANALYSIS time (an extended resolution rule), not
  * in the optimizer, and the placement is load-bearing: the optimizer's
  * join rules assume ROW-WISE join predicates, which an as-of match is
  * not. Concretely, in one operator-optimization fixedPoint iteration
  * `EliminateOuterJoin` converts `LEFT JOIN ... ON graft_asof(...)
  * WHERE r.x IS NOT NULL` into an INNER join and the very next rule
  * pushes `r.x IS NOT NULL` into the right CHILD — but filtering the
  * right side BEFORE an as-of match changes which row is "latest
  * at-or-before" (a row-wise-invalid transform that would silently
  * change answers). Claiming the Join while the analyzer still holds
  * the user's literal ON/WHERE shape makes the custom node opaque to
  * every such equivalence; the safe subset of pushdown/pruning is then
  * re-introduced by [[GraftJoinPushdown]], which knows the operators'
  * actual algebra. Because the rewrite precedes `EliminateResolvedHint`,
  * join-strategy hints are still `ResolvedHint` nodes wrapping the
  * children — the rule consumes them off the child roots itself.
  *
  * The replacement plan is built over the SAME children and the SAME
  * output attribute ids (payload = the right side's full output;
  * [[GraftJoinPushdown]] prunes it to what the query references), so
  * everything above the join is untouched.
  */
object MarkerJoins {
  val AsofName = "graft_asof"
  val OverlapsName = "graft_overlaps"
  val RangeName = "graft_range"
  val SaltedName = "graft_salted"

  /** graft_asof(l_ts, r_ts, r_tie [, direction [, tolerance_ns]]) */
  def buildAsof(exprs: Seq[Expression]): Expression = {
    require(exprs.length >= 3 && exprs.length <= 5,
      s"$AsofName requires 3-5 arguments " +
        "(left_ts, right_ts, right_tie[, direction[, tolerance_ns]]), " +
        s"got ${exprs.length}")
    GraftAsofMarker(exprs)
  }

  /** graft_overlaps(l_start, l_end, r_start, r_end) */
  def buildOverlaps(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 4,
      s"$OverlapsName requires exactly 4 arguments " +
        s"(left_start, left_end, right_start, right_end), got ${exprs.length}")
    GraftOverlapsMarker(exprs)
  }

  /** graft_range(l_ts, r_ts, lo, hi): right rows with
    * l_ts + lo <= r_ts <= l_ts + hi, executed as the BINNED equi-join
    * (Relational.rangeJoinBinned's plan shape — never a per-key nested
    * loop).
    */
  def buildRange(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 4,
      s"$RangeName requires exactly 4 arguments " +
        s"(left_ts, right_ts, lo, hi), got ${exprs.length}")
    GraftRangeMarker(exprs)
  }

  /** graft_salted(salts): semantically a no-op on the equi-join it rides
    * in, physically the hot-key shear (Relational.saltedJoin's shape).
    */
  def buildSalted(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"$SaltedName requires exactly 1 argument (salts), got ${exprs.length}")
    GraftSaltedMarker(exprs)
  }
}

/** As-of marker: a boolean placeholder in a join condition, consumed by
  * [[MarkerJoinRewrite]]. Unevaluable by design — see [[MarkerJoins]].
  */
case class GraftAsofMarker(children: Seq[Expression])
    extends Expression with Unevaluable {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = MarkerJoins.AsofName
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** Interval-overlap marker; same contract as [[GraftAsofMarker]]. */
case class GraftOverlapsMarker(children: Seq[Expression])
    extends Expression with Unevaluable {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = MarkerJoins.OverlapsName
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** Binned-range-join marker; same contract as [[GraftAsofMarker]]. */
case class GraftRangeMarker(children: Seq[Expression])
    extends Expression with Unevaluable {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = MarkerJoins.RangeName
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** Salted-join marker; same contract as [[GraftAsofMarker]]. */
case class GraftSaltedMarker(children: Seq[Expression])
    extends Expression with Unevaluable {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = MarkerJoins.SaltedName
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** Rewrites marker-carrying joins to the custom logical nodes; injected
  * via `GraftExtensions.injectResolutionRule` (see [[MarkerJoins]] for
  * why analysis time, not the optimizer). Any marker that survives in a
  * shape the rule refuses raises immediately with the reason — there is
  * no silent fallback path.
  */
object MarkerJoinRewrite extends Rule[LogicalPlan] {

  private def isMarker(e: Expression): Boolean =
    e.isInstanceOf[GraftAsofMarker] || e.isInstanceOf[GraftOverlapsMarker] ||
      e.isInstanceOf[GraftRangeMarker] || e.isInstanceOf[GraftSaltedMarker]

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x => Seq(x)
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"graft marker join: $msg")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // fire only on fully-resolved plans: `<=>` coercion has run (so key
    // types already match) and every marker that will exist does. The
    // resolved gate also keeps the scan from firing on every analyzer
    // iteration of a still-resolving tree.
    if (!plan.resolved) return plan
    // cheap global gate: the scan below only runs for plans that
    // actually carry a marker, so the 99% of queries without one pay a
    // single tree scan per analyzer invocation. Subquery plans live
    // inside expressions, so both the gate and the rewrite must descend
    // into them — a marker join under EXISTS/IN is legitimate usage
    val hasAny = (plan +: plan.subqueriesAll)
      .exists(_.exists(_.expressions.exists(_.exists(isMarker))))
    if (!hasAny) return plan
    val out = plan.transformUpWithSubqueries {
      case j: Join if j.condition.exists(_.exists(isMarker)) => rewrite(j)
    }
    // markers anywhere else (WHERE, SELECT, a join the match above could
    // not see) are misuse: refuse with guidance rather than letting the
    // Unevaluable surface a generic planning error later
    (out +: out.subqueriesAll).foreach(_.foreach { node =>
      node.expressions.foreach(_.foreach {
        case _: GraftAsofMarker => fail(
          s"${MarkerJoins.AsofName} is only legal as a top-level AND-conjunct " +
            "of a LEFT OUTER JOIN condition, alongside `<=>` key equalities: " +
            "LEFT JOIN r ON l.k <=> r.k AND graft_asof(l.ts, r.ts, r.tie)")
        case _: GraftOverlapsMarker => fail(
          s"${MarkerJoins.OverlapsName} is only legal as a top-level AND-conjunct " +
            "of an INNER JOIN condition, alongside `<=>` key equalities: " +
            "JOIN r ON l.k <=> r.k AND graft_overlaps(l.s, l.e, r.s, r.e)")
        case _: GraftRangeMarker => fail(
          s"${MarkerJoins.RangeName} is only legal as a top-level AND-conjunct " +
            "of an INNER JOIN condition, alongside equi-join keys: " +
            "JOIN r ON l.k = r.k AND graft_range(l.ts, r.ts, lo, hi)")
        case _: GraftSaltedMarker => fail(
          s"${MarkerJoins.SaltedName} is only legal as a top-level AND-conjunct " +
            "of an INNER JOIN condition, alongside equi-join keys: " +
            "JOIN r ON l.k = r.k AND graft_salted(8)")
        case _ =>
      })
    })
    out
  }

  /** At analysis time join-strategy hints are still [[ResolvedHint]]
    * nodes wrapping the hinted relation (EliminateResolvedHint, which
    * would fold them into `Join.hint`, is an optimizer rule) — peel
    * them off the child root and keep the outermost strategy.
    */
  private def unwrapHints(
      p: LogicalPlan): (LogicalPlan, Option[logical.JoinStrategyHint]) =
    p match {
      case h: ResolvedHint =>
        val (inner, deeper) = unwrapHints(h.child)
        (inner, h.hints.strategy.orElse(deeper))
      case other => (other, None)
    }

  private def rewrite(j: Join): LogicalPlan = {
    val conj = conjuncts(j.condition.get)
    val (markers, rest) = conj.partition(isMarker)
    if (markers.size != 1) fail(
      "exactly one graft marker must appear as a top-level AND-conjunct " +
        s"of the join condition, found ${markers.size}")

    // graft_range / graft_salted rewrite to STANDARD Join compositions
    // (their semantics are row-wise, so the optimizer may treat the
    // result like any other join — unlike the as-of/interval nodes
    // below, which must stay opaque); they keep the non-marker conjuncts
    // verbatim, `=` and `<=>` alike
    markers.head match {
      case m: GraftRangeMarker => return rewriteRange(j, m, rest)
      case m: GraftSaltedMarker => return rewriteSalted(j, m, rest)
      case _ =>
    }

    val (lChild, lStrategy) = unwrapHints(j.left)
    val (rChild, rStrategy) = unwrapHints(j.right)

    val lOut = lChild.outputSet
    val rOut = rChild.outputSet
    // 0 = references only the left child, 1 = only the right, -1 = mixed
    def sideOf(e: Expression): Int =
      if (e.references.subsetOf(lOut)) 0
      else if (e.references.subsetOf(rOut)) 1
      else -1

    // Non-key conjuncts: for an INNER join, ON ≡ WHERE, so they carry
    // out as a Filter over the rewritten node (the interval overlap IS
    // a row-wise theta join, so this is exact). For LEFT OUTER (as-of),
    // an ON-clause residual means "match only right rows satisfying P,
    // else null-extend" — which is NOT a post-filter AND not row-wise
    // composable with the as-of match — so it stays a loud error; WHERE
    // predicates on the join result are the supported spelling and
    // arrive as a Filter node above, untouched.
    val keyBuf = Seq.newBuilder[(Expression, Expression)]
    val residualBuf = Seq.newBuilder[Expression]
    rest.foreach {
      case EqualNullSafe(a, b) => (sideOf(a), sideOf(b)) match {
        case (0, 1) => keyBuf += ((a, b))
        case (1, 0) => keyBuf += ((b, a))
        case _ => fail(
          s"key conjunct '${EqualNullSafe(a, b).sql}' must compare one " +
            "left-side expression with one right-side expression")
      }
      case eq @ EqualTo(a, b)
          if Set(sideOf(a), sideOf(b)) == Set(0, 1) => fail(
        s"key equality '${eq.sql}' must be null-safe `<=>`: the physical " +
          "as-of/interval operators group keys like a window partition " +
          "(NULL keys match each other), which is `<=>` semantics; a plain " +
          "`=` would promise NULL-dropping the operator does not implement")
      case other if j.joinType == Inner => residualBuf += other
      case other => fail(
        s"unsupported join conjunct '${other.sql}': only `<=>` key " +
          "equalities may accompany the marker in a LEFT OUTER join " +
          "condition (apply residual predicates as WHERE filters on the " +
          "join result — they stay post-join filters for LEFT OUTER)")
    }
    val keys = keyBuf.result()
    val residuals = residualBuf.result()
    if (keys.isEmpty) fail(
      "at least one `<=>` key equality must accompany the marker")
    def withResiduals(node: LogicalPlan): LogicalPlan =
      if (residuals.isEmpty) node
      else Filter(residuals.reduce(And), node)

    def checkSide(what: String, e: Expression, want: Int): Unit = {
      val side = if (want == 0) "left" else "right"
      if (sideOf(e) != want)
        fail(s"$what must reference only the $side side of the join")
      if (e.dataType != LongType)
        fail(s"$what must be BIGINT (the engine's ns-since-epoch " +
          s"convention, Tables.tsToNanos), got ${e.dataType.simpleString}")
    }

    val bcastHint = broadcastHintOf(rStrategy.orElse(lStrategy))
      .orElse(legacyHintOf(j.hint))

    markers.head match {
      case GraftAsofMarker(args) =>
        if (j.joinType != LeftOuter) fail(
          s"${MarkerJoins.AsofName} requires LEFT OUTER JOIN (an as-of " +
            s"join keeps every left row), got ${j.joinType.sql}")
        checkSide("arg 1 (left timestamp)", args(0), 0)
        checkSide("arg 2 (right timestamp)", args(1), 1)
        checkSide("arg 3 (right tiebreak)", args(2), 1)
        val dir =
          if (args.length >= 4) AsofDirection.of(
            foldString(args(3), "arg 4 (direction)"))
          else AsofBackward
        val tol =
          if (args.length == 5) Some(foldLong(args(4), "arg 5 (tolerance)"))
          else None
        tol.foreach(t => if (t < 0) fail("tolerance must be >= 0 ns"))
        AsofJoinPlan(lChild, rChild, keys.map(_._1), keys.map(_._2),
          args(0), args(1), args(2), rChild.output, dir, tol, bcastHint)

      case GraftOverlapsMarker(args) =>
        if (j.joinType != Inner) fail(
          s"${MarkerJoins.OverlapsName} requires INNER JOIN (only " +
            s"overlapping pairs survive), got ${j.joinType.sql}")
        checkSide("arg 1 (left start)", args(0), 0)
        checkSide("arg 2 (left end)", args(1), 0)
        checkSide("arg 3 (right start)", args(2), 1)
        checkSide("arg 4 (right end)", args(3), 1)
        withResiduals(
          IntervalJoinPlan(lChild, rChild, keys.map(_._1), keys.map(_._2),
            args(0), args(1), args(2), args(3), rChild.output, bcastHint))

      case other => fail(s"unexpected marker $other") // unreachable
    }
  }

  /** Binned range join in SQL: `JOIN r ON l.k = r.k AND
    * graft_range(l.ts, r.ts, lo, hi)` rewrites to
    * Relational.rangeJoinBinned's plan shape — the left window explodes
    * into its ≤2 covering bins, the right side stamps its bin, the join
    * condition gains `l_bin = r_bin` (turning the theta range into an
    * equi-join on (keys, bin) — ExtractEquiJoinKeys picks ALL the
    * equality conjuncts up as hash keys), and the exact range predicate
    * filters the residue. Original key conjuncts ride verbatim (`=`
    * keeps `=` semantics, `<=>` keeps null-safe). A plain theta
    * `BETWEEN` in SQL would plan as a per-key nested loop; this is the
    * scalable spelling.
    */
  private def rewriteRange(j: Join, m: GraftRangeMarker,
      rest: Seq[Expression]): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions._
    if (j.joinType != Inner) fail(
      s"${MarkerJoins.RangeName} requires INNER JOIN, got ${j.joinType.sql}")
    if (rest.isEmpty) fail(
      s"${MarkerJoins.RangeName}: at least one key conjunct must accompany " +
        "the marker (an unkeyed range join is a cartesian scan)")
    val Seq(lTs, rTs, loE, hiE) = m.children
    val lOut = j.left.outputSet
    val rOut = j.right.outputSet
    if (!lTs.references.subsetOf(lOut) || lTs.dataType != LongType) fail(
      s"${MarkerJoins.RangeName} arg 1 (left_ts) must be a BIGINT over the left side")
    if (!rTs.references.subsetOf(rOut) || rTs.dataType != LongType) fail(
      s"${MarkerJoins.RangeName} arg 2 (right_ts) must be a BIGINT over the right side")
    val lo = foldLong(loE, s"${MarkerJoins.RangeName} arg 3 (lo)")
    val hi = foldLong(hiE, s"${MarkerJoins.RangeName} arg 4 (hi)")
    if (hi <= lo) fail(s"${MarkerJoins.RangeName}: empty window [$lo, $hi]")
    val w = hi - lo
    def divBin(e: Expression): Expression =
      IntegralDivide(e, Literal(w))
    // left explodes into the (<=2) distinct bins its window covers
    val binGen = Explode(ArrayDistinct(CreateArray(Seq(
      divBin(Add(lTs, Literal(lo))), divBin(Add(lTs, Literal(hi)))))))
    val lBinField = binGen.elementSchema.head
    val lBin = AttributeReference("__graft_bin_l", lBinField.dataType,
      lBinField.nullable)()
    val lGen = logical.Generate(binGen, unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(lBin), j.left)
    val rBinExpr = Alias(divBin(rTs), "__graft_bin_r")()
    val rProj = logical.Project(j.right.output :+ rBinExpr, j.right)
    val rBin = rBinExpr.toAttribute
    val cond = (rest :+ EqualTo(lBin, rBin)).reduce(And)
    val joined = Join(lGen, rProj, Inner, Some(cond), j.hint)
    val ranged = Filter(And(
      GreaterThanOrEqual(rTs, Add(lTs, Literal(lo))),
      LessThanOrEqual(rTs, Add(lTs, Literal(hi)))), joined)
    logical.Project(j.left.output ++ j.right.output, ranged)
  }

  /** Salted skew join in SQL: `JOIN r ON l.k = r.k AND graft_salted(n)`
    * is SEMANTICALLY the plain equi-join; the rewrite is
    * Relational.saltedJoin's shear — each left row gets a deterministic
    * whole-row-hash salt in [0, n), each right row replicates once per
    * salt, and the join condition gains the salt equality, spreading a
    * hot key across n shuffle partitions. Use when AQE's skew split
    * isn't enough; n multiplies the right side, so keep it the smaller
    * input.
    */
  private def rewriteSalted(j: Join, m: GraftSaltedMarker,
      rest: Seq[Expression]): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions._
    if (j.joinType != Inner) fail(
      s"${MarkerJoins.SaltedName} requires INNER JOIN, got ${j.joinType.sql}")
    val hasEqui = rest.exists {
      case EqualTo(a, b) => a.references.nonEmpty && b.references.nonEmpty
      case EqualNullSafe(a, b) => a.references.nonEmpty && b.references.nonEmpty
      case _ => false
    }
    if (!hasEqui) fail(
      s"${MarkerJoins.SaltedName}: at least one equi-join key conjunct must " +
        "accompany the marker (salting a non-equi join has nothing to shear)")
    val salts = foldLong(m.children.head,
      s"${MarkerJoins.SaltedName} arg 1 (salts)")
    if (salts < 2 || salts > 4096) fail(
      s"${MarkerJoins.SaltedName}: salts must be in [2, 4096], got $salts")
    // deterministic whole-left-row salt — replays land identically
    val saltAlias = Alias(Pmod(new XxHash64(
      Seq(CreateStruct(j.left.output))), Literal(salts)), "__graft_salt_l")()
    val lProj = logical.Project(j.left.output :+ saltAlias, j.left)
    val saltGen = Explode(new Sequence(Literal(0L), Literal(salts - 1L)))
    val rSaltField = saltGen.elementSchema.head
    val rSalt = AttributeReference("__graft_salt_r", rSaltField.dataType,
      rSaltField.nullable)()
    val rGen = logical.Generate(saltGen, unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(rSalt), j.right)
    val cond = (rest :+ EqualTo(saltAlias.toAttribute, rSalt)).reduce(And)
    val joined = Join(lProj, rGen, Inner, Some(cond), j.hint)
    logical.Project(j.left.output ++ j.right.output, joined)
  }

  /** SQL join-strategy hints force the physical choice exactly as for
    * equi-joins: BROADCAST(right) -> broadcast exec, MERGE/SHUFFLE_HASH
    * -> shuffled merge exec, no hint -> the strategy's stats rule.
    */
  private def broadcastHintOf(
      s: Option[logical.JoinStrategyHint]): Option[Boolean] =
    s.flatMap {
      case logical.BROADCAST => Some(true)
      case logical.SHUFFLE_MERGE | logical.SHUFFLE_HASH => Some(false)
      case _ => None
    }

  /** Fallback for a Join whose hint field is already populated — only
    * reachable if the rule ever fires post-EliminateResolvedHint (e.g.
    * on a hand-built plan); the SQL path resolves before that.
    */
  private def legacyHintOf(h: JoinHint): Option[Boolean] =
    broadcastHintOf(h.rightHint.flatMap(_.strategy))

  private def foldString(e: Expression, what: String): String =
    if (e.foldable && e.dataType == StringType) {
      val v = e.eval()
      if (v == null) fail(s"$what must not be NULL")
      v.toString
    } else fail(s"$what must be a foldable string literal " +
      "('backward' | 'forward' | 'nearest')")

  private def foldLong(e: Expression, what: String): Long =
    if (e.foldable &&
        (e.dataType == LongType || e.dataType == IntegerType)) {
      e.eval() match {
        case null => fail(s"$what must not be NULL")
        case i: java.lang.Integer => i.toLong
        case l: java.lang.Long => l
      }
    } else fail(s"$what must be a foldable integer literal (nanoseconds)")
}
