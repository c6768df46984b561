package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Restores parquet row-group pruning for event-time predicates after the
  * ns normalization.
  *
  * `Tables.tsToNanos` projects the fixture's timestamp column to Long
  * nanoseconds (`timestampdiff(MICROSECOND, epoch, ts) * 1000`, or
  * `unix_micros(ts) * 1000`). A user predicate on the normalized column —
  * `events.where(col("ts") < cutoffNs)` — is pushed through the Project
  * by Catalyst with the alias substituted, but the resulting scan filter
  * is an EXPRESSION over the raw column, which the parquet source cannot
  * translate: the scan degrades to reading every row group. At 100 TB an
  * event-time cutoff is THE pruning predicate (incremental maintenance,
  * backfills, retention windows), so this rule rewrites, inside Filter
  * conditions only,
  *
  *   (timestampdiff(MICROSECOND, epochNtz, ts) * 1000)  cmp  nsLiteral
  *   (unix_micros(ts) * 1000)                           cmp  nsLiteral
  *
  * into `ts cmp tsLiteral` on the RAW timestamp column with the bound
  * divided back to micros — exact integer math with direction-correct
  * rounding (ceil for `<`/`>=`, floor for `<=`/`>`). The plain
  * attribute-vs-literal comparison then reaches the source as a
  * PushedFilter and prunes row groups via min/max stats.
  *
  * Null semantics are preserved: the comparison rewrites map null ts to
  * a null comparison exactly as the original (null-intolerant arithmetic
  * → null comparison) did, at ANY position in the condition tree. The
  * one non-null-preserving rewrite — equality against a non-µs-aligned
  * ns bound can never hold (ns values are exact ×1000 multiples) and
  * folds to FALSE — is applied ONLY where the equality is the Filter
  * condition itself or a direct And-conjunct of it: under negation,
  * `NOT(ts === c)` on a null ts row is NOT(null) = null → dropped by
  * the original, but NOT(false) = true would wrongly keep it, so
  * non-conjunct positions keep the unrewritten equality. Bounds near
  * Long.MaxValue skip the rewrite rather than overflow (addExact
  * guards).
  */
object TsNanosPushdown extends Rule[LogicalPlan] {

  /** Matches the normalization projection applied to a raw timestamp
    * column, in its POST-ANALYSIS shape: the analyzer implicit-casts the
    * NTZ column (and the NTZ epoch literal, then folds it) to
    * TimestampType with the session zone, so what reaches the optimizer
    * is e.g.
    *
    *   timestampdiff(MICROSECOND, 0L:timestamp, cast(ts as timestamp, UTC)) * 1000
    *
    * Returns (raw column, epoch offset in micros). The NTZ→LTZ cast is
    * only the identity on the internal micros under a zero-offset zone
    * (a DST zone is not even monotonic across spring-forward), so the
    * NTZ patterns are guarded on the cast's zone resolving to UTC — the
    * engine pins spark.sql.session.timeZone=UTC in every entry point, so
    * the rewrite fires in practice; other zones just keep the unpushed
    * plan. The bare-UnixMicros pattern (TimestampType vintage) is
    * instant-based and zone-free.
    */
  private object NsOfTs {
    private def isUtc(tz: Option[String]): Boolean =
      tz.exists { z =>
        try java.time.ZoneId.of(z).normalized() == java.time.ZoneOffset.UTC
        catch { case _: Throwable => false }
      }

    def unapply(e: Expression): Option[(Expression, Long)] = e match {
      case Multiply(inner, Literal(1000L, LongType), _) => inner match {
        case TimestampDiff(unit, Literal(s: Long, TimestampType),
            Cast(ts, TimestampType, tz, _), _)
            if unit.equalsIgnoreCase("MICROSECOND") &&
              ts.dataType == TimestampNTZType && isUtc(tz) =>
          Some((ts, s))
        case UnixMicros(Cast(ts, TimestampType, tz, _))
            if ts.dataType == TimestampNTZType && isUtc(tz) => Some((ts, 0L))
        case UnixMicros(ts) if ts.dataType == TimestampType => Some((ts, 0L))
        case _ => None
      }
      case Multiply(l @ Literal(1000L, LongType), inner, em) =>
        unapply(Multiply(inner, l, em))
      case _ => None
    }
  }

  private def tsLit(ts: Expression, us: Long): Expression =
    Literal(us, ts.dataType)

  /** micros bound for `ns cmp c`: ceil(c/1000) when the comparison keeps
    * values strictly below / at-or-above the bound, floor otherwise.
    */
  private def ceilDiv(c: Long): Option[Long] =
    try Some(Math.floorDiv(Math.addExact(c, 999L), 1000L))
    catch { case _: ArithmeticException => None }
  private def floorDiv(c: Long): Option[Long] = Some(Math.floorDiv(c, 1000L))

  private def rewrite(e: Expression): Option[Expression] = {
    def mk(ts: Expression, s: Long, q: Option[Long],
        f: (Expression, Expression) => Expression): Option[Expression] =
      q.flatMap { v =>
        try Some(f(ts, tsLit(ts, Math.addExact(s, v))))
        catch { case _: ArithmeticException => None }
      }
    e match {
      // ns < c  ⇔  µs < ceil(c/1000)
      case LessThan(NsOfTs(ts, s), Literal(c: Long, LongType)) =>
        mk(ts, s, ceilDiv(c), LessThan)
      case LessThanOrEqual(NsOfTs(ts, s), Literal(c: Long, LongType)) =>
        mk(ts, s, floorDiv(c), LessThanOrEqual)
      case GreaterThan(NsOfTs(ts, s), Literal(c: Long, LongType)) =>
        mk(ts, s, floorDiv(c), GreaterThan)
      case GreaterThanOrEqual(NsOfTs(ts, s), Literal(c: Long, LongType)) =>
        mk(ts, s, ceilDiv(c), GreaterThanOrEqual)
      // µs-aligned only: the non-aligned fold to FALSE is not null-safe
      // under negation and is handled by foldConjuncts at top level
      case EqualTo(NsOfTs(ts, s), Literal(c: Long, LongType))
          if Math.floorMod(c, 1000L) == 0L =>
        mk(ts, s, Some(Math.floorDiv(c, 1000L)), EqualTo)
      // literal-on-the-left orientations: mirror the operator
      case LessThan(l @ Literal(_, LongType), r @ NsOfTs(_, _)) =>
        rewrite(GreaterThan(r, l))
      case LessThanOrEqual(l @ Literal(_, LongType), r @ NsOfTs(_, _)) =>
        rewrite(GreaterThanOrEqual(r, l))
      case GreaterThan(l @ Literal(_, LongType), r @ NsOfTs(_, _)) =>
        rewrite(LessThan(r, l))
      case GreaterThanOrEqual(l @ Literal(_, LongType), r @ NsOfTs(_, _)) =>
        rewrite(LessThanOrEqual(r, l))
      case EqualTo(l @ Literal(_, LongType), r @ NsOfTs(_, _)) =>
        rewrite(EqualTo(r, l))
      case _ => None
    }
  }

  /** Fold non-µs-aligned equalities to FALSE, but only at null-rejecting
    * positions: the condition root and And-conjuncts reachable from it.
    * FALSE and null are interchangeable there (both drop the row); under
    * NOT/OR they are not, so deeper positions are left alone.
    */
  private def foldConjuncts(e: Expression): Expression = e match {
    case And(l, r) => And(foldConjuncts(l), foldConjuncts(r))
    case EqualTo(NsOfTs(_, _), Literal(c: Long, LongType))
        if Math.floorMod(c, 1000L) != 0L => Literal.FalseLiteral
    case EqualTo(Literal(c: Long, LongType), NsOfTs(_, _))
        if Math.floorMod(c, 1000L) != 0L => Literal.FalseLiteral
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val newCond = foldConjuncts(cond)
        .transformUp { case e => rewrite(e).getOrElse(e) }
      if (newCond.fastEquals(cond)) f else Filter(newCond, child)
  }
}
