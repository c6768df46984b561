package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** WHOLE-OPERATOR as-of join — the full custom-operator ladder the
  * engine's extension tier is for: a logical node ([[AsofJoinPlan]]), a
  * planner strategy ([[AsofJoinStrategy]], injected by
  * [[GraftExtensions]]), and a physical merge operator ([[AsofJoinExec]]).
  *
  * Semantics (identical to `Relational.asofJoin`, the union+window
  * composition, and to the reference's latest-at-or-before lookup shape):
  * every left row picks the LAST right row of the same key with
  * `right.ts <= left.ts` (inclusive; ties on ts broken by the largest
  * `tiebreak`), or null payload when no such row exists. Keys compare
  * like a window partition (nulls group together), matching the
  * composed form and its SQL oracle.
  *
  * Why a physical operator when the composition already passes: the
  * union+window form SHUFFLES AND SORTS THE UNION of both tables inside
  * one window, carries every payload column through
  * `last(_, ignoreNulls)` frames, and then filters half the rows back
  * out. The merge exec declares `ClusteredDistribution` per side and a
  * per-side local sort, then streams BOTH sorted partitions through a
  * single-pass merge — O(|L|+|R|) per partition with ONE retained
  * candidate row, no window state, no post-filter, and each side's
  * exchange carries only its own columns. At 100 TB the right side is
  * typically the small slowly-changing one: it sorts independently
  * instead of riding inside the event-table's window sort.
  *
  * Timestamps and tiebreaks are LongType by contract — the engine's
  * ns-since-epoch convention (`Tables.tsToNanos`); the builder rejects
  * anything else rather than silently comparing mixed types.
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTie: Expression,
    rightPayload: Seq[Attribute],
    direction: AsofDirection = AsofBackward,
    toleranceNs: Option[Long] = None,
    broadcastHint: Option[Boolean] = None) extends BinaryNode {
  // payload is nullable in the output: an unmatched left row emits nulls
  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))
  // an unknown BinaryNode defaults to the |L|·|R| PRODUCT estimate,
  // which would poison every broadcast decision above this node; an
  // as-of join emits exactly one row per left row, so left + right
  // bytes is the honest upper bound
  override def stats: org.apache.spark.sql.catalyst.plans.logical.Statistics =
    org.apache.spark.sql.catalyst.plans.logical.Statistics(
      sizeInBytes = left.stats.sizeInBytes + right.stats.sizeInBytes)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] as [[AsofJoinExec]]; injected via
  * `GraftExtensions.injectPlannerStrategy`.
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lts, rts, tie, payload, dir, tol, hint) =>
      // physical choice mirrors equi-join planning: broadcast the right
      // side when it is dimension-sized (stats vs the session's
      // autoBroadcastJoinThreshold), which leaves the fact side with NO
      // exchange and NO sort; hint Some(true)/Some(false) forces the
      // choice (the registry pins the shuffled form explicitly — at
      // test SF everything is broadcast-sized, at 100 TB it is not)
      val threshold = org.apache.spark.sql.internal.SQLConf.get
        .autoBroadcastJoinThreshold
      val broadcast = hint.getOrElse(
        threshold > 0 && r.stats.sizeInBytes <= threshold)
      if (broadcast) {
        BroadcastAsofJoinExec(lk, rk, lts, rts, tie, payload, dir, tol,
          planLater(l), planLater(r)) :: Nil
      } else {
        AsofJoinExec(lk, rk, lts, rts, tie, payload, dir, tol,
          planLater(l), planLater(r)) :: Nil
      }
    case _ => Nil
  }
}

/** Match direction, mirroring pandas `merge_asof`:
  *   - [[AsofBackward]]: latest right row with `rts <= lts`
  *     (ts ties -> LARGEST tiebreak, the carry-forward window's pick);
  *   - [[AsofForward]]: earliest right row with `rts >= lts`
  *     (ts ties -> SMALLEST tiebreak, the mirror pick);
  *   - [[AsofNearest]]: whichever of those two is closer in |Δts|;
  *     equal distance -> the backward one (a FIXED rule, because the
  *     engine must be deterministic and the SQL oracle must encode the
  *     same choice).
  * `toleranceNs` (when set) drops matches with |Δts| > tolerance — the
  * match becomes a null-payload row, not a dropped row.
  */
sealed trait AsofDirection extends Serializable { def name: String }
case object AsofBackward extends AsofDirection { val name = "backward" }
case object AsofForward extends AsofDirection { val name = "forward" }
case object AsofNearest extends AsofDirection { val name = "nearest" }
object AsofDirection {
  def of(s: String): AsofDirection = s match {
    case "backward" => AsofBackward
    case "forward" => AsofForward
    case "nearest" => AsofNearest
    case other => throw new IllegalArgumentException(
      s"asofJoinExec: unknown direction '$other' (backward|forward|nearest)")
  }
}

/** Sorted-merge as-of join. Requirements do the distributed heavy
  * lifting declaratively — EnsureRequirements (and AQE's re-validation)
  * plant one hash exchange per side on the keys plus a LOCAL sort per
  * side, so the merge below runs on co-partitioned, (key, ts)-sorted
  * iterators. The merge itself retains exactly one candidate (key,
  * payload) pair, so memory is O(1) per partition regardless of key
  * cardinality or skew — there is no grouped buffer to spill.
  */
case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTie: Expression,
    rightPayload: Seq[Attribute],
    direction: AsofDirection,
    toleranceNs: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // local (per-partition) sorts; ts ascending so the last consumed
  // candidate is the latest at-or-before, tiebreak ascending so equal
  // timestamps resolve to the largest tiebreak — byte-for-byte the
  // composed window's (ts asc, tiebreak asc, last wins) semantics
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs :+ rightTie).map(SortOrder(_, Ascending)))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val leftOutput = left.output
    val rightOutput = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val payload = rightPayload
    val outAttrs = output
    val dir = direction
    val tol = toleranceNs

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOutput)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val lTsEval = BindReferences.bindReference(lTsExpr, leftOutput)
      val rTsEval = BindReferences.bindReference(rTsExpr, rightOutput)
      val payloadProj = UnsafeProjection.create(payload, rightOutput)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullPayload = new GenericInternalRow(payload.size)

      new Iterator[InternalRow] {
        // rh is the right lookahead: valid until the next rIter.next()
        // (advancing the LEFT iterator never invalidates it). The
        // retained backward candidate's key/ts/payload are .copy()'d
        // because projections reuse their buffers and the sorter reuses
        // row memory on advance. Left rows arrive in (key, ts) order, so
        // everything the cursor discards is unusable for every later
        // left row too — single forward pass, one retained row, O(1)
        // memory per partition for all three directions.
        private var rh: InternalRow = advanceRight()
        private var candKey: UnsafeRow = null
        private var candTs: Long = 0L
        private var candPayload: UnsafeRow = null

        private def advanceRight(): InternalRow =
          if (rIter.hasNext) rIter.next() else null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val ltsBoxed = lTsEval.eval(l)
          if (ltsBoxed == null) {
            // null event time: matches nothing (and sorted first, so the
            // right cursor has not moved past anything it still needs)
            numOutputRows += 1
            return resultProj(joined(l, nullPayload))
          }
          val lts = ltsBoxed.asInstanceOf[Long]
          // advance the cursor; retain the backward candidate (latest
          // right row with rts <= lts) for backward/nearest. For
          // forward, rows with rts < lts are equally unusable by every
          // later (larger-lts) left row — discard without retaining.
          var scan = true
          while (scan && rh != null) {
            val rk = rKeyProj(rh)
            val c = keyOrd.compare(rk, lk)
            if (c < 0) {
              rh = advanceRight() // earlier key: can never match again
            } else if (c == 0) {
              val rtsBoxed = rTsEval.eval(rh)
              if (rtsBoxed == null) {
                rh = advanceRight() // null right ts: matches nothing
              } else {
                val rts = rtsBoxed.asInstanceOf[Long]
                val consumable =
                  if (dir eq AsofForward) rts < lts else rts <= lts
                if (consumable) {
                  if (!(dir eq AsofForward)) {
                    candKey = rk.copy()
                    candTs = rts
                    candPayload = payloadProj(rh).copy()
                  }
                  rh = advanceRight()
                } else scan = false // at-or-after: stop, rh is the forward head
              }
            } else scan = false // later key: stop, keep for next left
          }
          // backward option: retained candidate, if still this key
          val backOk = !(dir eq AsofForward) && candKey != null &&
            keyOrd.compare(candKey, lk) == 0 &&
            tol.forall(t => lts - candTs <= t)
          // forward option: the head itself, if this key and in tolerance
          // (head rts >= lts by construction when same key)
          lazy val fwdTs: Long = rTsEval.eval(rh).asInstanceOf[Long]
          val fwdOk = !(dir eq AsofBackward) && rh != null &&
            keyOrd.compare(rKeyProj(rh), lk) == 0 &&
            tol.forall(t => fwdTs - lts <= t)
          val out = dir match {
            case AsofBackward =>
              if (backOk) { numMatched += 1; joined(l, candPayload) }
              else joined(l, nullPayload)
            case AsofForward =>
              if (fwdOk) { numMatched += 1; joined(l, payloadProj(rh)) }
              else joined(l, nullPayload)
            case AsofNearest =>
              if (backOk && (!fwdOk || lts - candTs <= fwdTs - lts)) {
                // equal distance -> backward, the documented fixed rule
                numMatched += 1; joined(l, candPayload)
              } else if (fwdOk) {
                numMatched += 1; joined(l, payloadProj(rh))
              } else joined(l, nullPayload)
          }
          numOutputRows += 1
          resultProj(out)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Broadcast as-of join — the dimension-lookup fast path. The right
  * side rides a BroadcastExchange (IdentityBroadcastMode); the LEFT
  * side keeps its incoming partitioning and ordering untouched: NO
  * exchange, NO sort on the fact table. Each task builds a per-key
  * (ts, tie)-sorted array index from the broadcast rows once, then
  * answers every left row with a binary search — backward takes the
  * rightmost slot with ts <= lts (= max tiebreak within the tied ts),
  * forward the leftmost slot with ts >= lts (= min tiebreak), nearest
  * arbitrates the two with the fixed equal-distance -> backward rule.
  * Identical semantics to [[AsofJoinExec]] by construction; the
  * AsofExecSpec parity test holds them equal row-for-row.
  *
  * Memory is O(|dimension|) per executor — exactly the broadcast-join
  * deal. The strategy only picks this form when stats put the right
  * side under autoBroadcastJoinThreshold (or the caller forces it), so
  * a fact-sized right side falls back to the shuffled merge.
  */
case class BroadcastAsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTie: Expression,
    rightPayload: Seq[Attribute],
    direction: AsofDirection,
    toleranceNs: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // preserved verbatim: the whole point of the broadcast form is that
  // the fact side's layout survives the enrichment
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution ::
      BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val leftOutput = left.output
    val rightOutput = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val rTieExpr = rightTie
    val payload = rightPayload
    val outAttrs = output
    val dir = direction
    val tol = toleranceNs

    val broadcastRelation = right.executeBroadcast[Array[InternalRow]]()

    left.execute().mapPartitions ({ lIter =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOutput)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOutput)
      val rTsEval = BindReferences.bindReference(rTsExpr, rightOutput)
      val rTieEval = BindReferences.bindReference(rTieExpr, rightOutput)
      val lTsEval = BindReferences.bindReference(lTsExpr, leftOutput)
      val payloadProj = UnsafeProjection.create(payload, rightOutput)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullPayload = new GenericInternalRow(payload.size)

      // per-task index build: key -> (tsArr, payloadArr) sorted by
      // (ts, tie). The dimension is broadcast-sized by contract, so the
      // build is a small in-memory sort per task.
      val index = new java.util.HashMap[UnsafeRow, (Array[Long], Array[UnsafeRow])]()
      locally {
        val grouped = new java.util.HashMap[UnsafeRow,
          scala.collection.mutable.ArrayBuffer[(Long, Long, UnsafeRow)]]()
        broadcastRelation.value.foreach { r =>
          val ts = rTsEval.eval(r)
          if (ts != null) { // null right ts matches nothing: skip at build
            val k = rKeyProj(r).copy()
            // NULL tiebreak sorts FIRST, matching the merge form's
            // ascending (NULLS FIRST) requiredChildOrdering — a bare
            // asInstanceOf would coerce null to 0L and pick a different
            // payload row than the merge exec for the same tied group
            val tieBoxed = rTieEval.eval(r)
            val tie = if (tieBoxed == null) Long.MinValue
                      else tieBoxed.asInstanceOf[Long]
            var buf = grouped.get(k)
            if (buf == null) {
              buf = scala.collection.mutable.ArrayBuffer.empty
              grouped.put(k, buf)
            }
            buf += ((ts.asInstanceOf[Long], tie, payloadProj(r).copy()))
          }
        }
        grouped.forEach { (k, buf) =>
          val sorted = buf.sortBy(e => (e._1, e._2)).toArray
          index.put(k, (sorted.map(_._1), sorted.map(_._3)))
        }
      }

      // rightmost i with tsArr(i) <= t, or -1
      def floorIdx(tsArr: Array[Long], t: Long): Int = {
        var lo = 0; var hi = tsArr.length - 1; var res = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (tsArr(mid) <= t) { res = mid; lo = mid + 1 } else hi = mid - 1
        }
        res
      }

      lIter.map { l =>
        val ltsBoxed = lTsEval.eval(l)
        val entry = if (ltsBoxed == null) null else index.get(lKeyProj(l))
        numOutputRows += 1
        if (entry == null) resultProj(joined(l, nullPayload))
        else {
          val (tsArr, pArr) = entry
          val lts = ltsBoxed.asInstanceOf[Long]
          val fi = floorIdx(tsArr, lts)           // backward slot
          val ci = fi + 1                          // forward slot (first ts > lts
                                                   // ... except ties: see below)
          // forward must be INCLUSIVE of lts with MIN tie: the first
          // slot with ts >= lts is the leftmost of the tied group, not
          // fi+1 (fi points at the max-tie slot of the tied group)
          def ceilIdx: Int = {
            var lo = 0; var hi = tsArr.length - 1; var res = tsArr.length
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (tsArr(mid) >= lts) { res = mid; hi = mid - 1 } else lo = mid + 1
            }
            res
          }
          val backOk = (dir ne AsofForward) && fi >= 0 &&
            tol.forall(t => lts - tsArr(fi) <= t)
          lazy val fwdIdx = if (dir eq AsofBackward) -1 else ceilIdx
          val fwdOk = (dir ne AsofBackward) && fwdIdx < tsArr.length &&
            tol.forall(t => tsArr(fwdIdx) - lts <= t)
          val out = dir match {
            case AsofBackward =>
              if (backOk) { numMatched += 1; joined(l, pArr(fi)) }
              else joined(l, nullPayload)
            case AsofForward =>
              if (fwdOk) { numMatched += 1; joined(l, pArr(fwdIdx)) }
              else joined(l, nullPayload)
            case AsofNearest =>
              if (backOk && (!fwdOk || lts - tsArr(fi) <= tsArr(fwdIdx) - lts)) {
                numMatched += 1; joined(l, pArr(fi))
              } else if (fwdOk) { numMatched += 1; joined(l, pArr(fwdIdx)) }
              else joined(l, nullPayload)
          }
          resultProj(out)
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoin {
  /** DataFrame face of the physical as-of join — the drop-in peer of
    * `Relational.asofJoin(left, right, key, tsCol, tiebreak, payloadCols)`
    * with the same contract: right payload names must not collide with
    * left columns; `tiebreak` must totally order right rows within
    * (key, ts) for determinism.
    *
    * The right side is re-projected through fresh aliases before the
    * node is built, so a self-as-of (both sides carved from one scan,
    * the common case for event streams) can never alias-collide
    * attribute ids between the children.
    *
    * `direction` / `toleranceNs` mirror pandas `merge_asof`: backward
    * (default), forward, or nearest, optionally bounded to |Δts| <=
    * toleranceNs (an out-of-tolerance left row keeps its row with null
    * payload — left-join shape, never row-dropping).
    */
  def asofJoinExec(left: DataFrame, right: DataFrame, key: String,
      tsCol: String, tiebreak: String, payloadCols: Seq[String],
      direction: String = "backward",
      toleranceNs: Option[Long] = None,
      broadcast: Option[Boolean] = None): DataFrame = {
    toleranceNs.foreach(t => require(t >= 0L,
      s"asofJoinExec: tolerance must be >= 0 ns, got $t"))
    val dup = payloadCols.toSet.intersect(left.columns.toSet)
    require(dup.isEmpty,
      s"asofJoinExec: payload columns collide with left columns: ${dup.mkString(", ")}")
    val rCols = (Seq(key, tsCol, tiebreak) ++ payloadCols).distinct
    val rProj = right.select(rCols.map(c => col(c).as(c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rProj.queryExecution.analyzed
    def attrOf(out: Seq[Attribute], n: String, side: String): Attribute =
      out.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"asofJoinExec: no column '$n' on the $side side"))
    val lTs = attrOf(lPlan.output, tsCol, "left")
    val rTs = attrOf(rPlan.output, tsCol, "right")
    val rTie = attrOf(rPlan.output, tiebreak, "right")
    Seq("left ts" -> lTs.dataType, "right ts" -> rTs.dataType,
        "tiebreak" -> rTie.dataType).foreach { case (what, dt) =>
      require(dt == LongType,
        s"asofJoinExec: $what must be LongType (engine ns convention), got $dt")
    }
    val lKey = attrOf(lPlan.output, key, "left")
    val rKey = attrOf(rPlan.output, key, "right")
    // mismatched key types would silently produce zero matches in the
    // broadcast form (UnsafeRow byte-equality across different schemas)
    // and undefined comparisons in the merge form — reject loudly (the
    // SQL marker path is safe: <=> type-coerces both sides)
    require(lKey.dataType == rKey.dataType,
      s"asofJoinExec: key '$key' type mismatch between sides: " +
        s"${lKey.dataType} vs ${rKey.dataType}")
    val node = AsofJoinPlan(lPlan, rPlan,
      Seq(lKey), Seq(rKey),
      lTs, rTs, rTie, payloadCols.map(attrOf(rPlan.output, _, "right")),
      AsofDirection.of(direction), toleranceNs, broadcast)
    org.apache.spark.sql.graft.PlanBridge.ofRows(left.sparkSession, node)
      // the node's own output keeps every left column; the caller-facing
      // frame matches the composed operator (left cols + payload)
  }
}
