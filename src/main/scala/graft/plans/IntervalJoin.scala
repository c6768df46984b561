package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** WHOLE-OPERATOR interval overlap join — the temporal-alignment
  * operator two SCD2 histories need (and Spark's join zoo lacks): every
  * (left, right) pair of the same key whose HALF-OPEN validity
  * intervals `[ls, le)` and `[rs, re)` intersect (`ls < re && rs < le`)
  * joins; a NULL start is an open past (-∞) and a NULL end an open
  * future (+∞), exactly the SCD2 current-row convention, so SCD2
  * frames join without pre-coalescing sentinels. Empty/inverted
  * intervals (`s >= e`) intersect NOTHING on either side — both
  * physical forms drop them identically (lead()-derived SCD2 chains
  * with duplicate timestamps produce exactly these zero-width rows,
  * and the physical choice must not change the answer).
  *
  * Why not the binned range join (`Relational.rangeJoinBinned`): that
  * operator matches POINTS into fixed-width windows — the bin width IS
  * the window. Variable-length validity intervals have no fixed width;
  * binning them means replicating each interval into every bin it
  * crosses (an open-ended current row crosses ALL of them). The merge
  * exec instead clusters both sides on the key, sorts each side by
  * interval start (one LOCAL sort per side), and sweeps: per key a
  * bounded ACTIVE buffer holds the right intervals whose end has not
  * passed the left cursor — memory is the maximum concurrent-validity
  * depth per key (SCD2: the version overlap width, typically tiny),
  * never the partition.
  *
  * Bounds are LongType by contract — the engine's ns-since-epoch
  * convention (`Tables.tsToNanos`).
  */
case class IntervalJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftStart: Expression,
    leftEnd: Expression,
    rightStart: Expression,
    rightEnd: Expression,
    rightPayload: Seq[Attribute],
    broadcastHint: Option[Boolean] = None) extends BinaryNode {
  // inner-join shape: only overlapping pairs survive, payload not null
  override def output: Seq[Attribute] = left.output ++ rightPayload
  // an unknown BinaryNode defaults to the |L|·|R| PRODUCT estimate —
  // technically the worst case here, but SCD2 validity chains overlap
  // a bounded few versions per row; sum-of-sides is the estimate that
  // keeps broadcast decisions above this node sane (Spark's own
  // non-CBO inner-join estimate is equally a guess, in the other
  // direction)
  override def stats: org.apache.spark.sql.catalyst.plans.logical.Statistics =
    org.apache.spark.sql.catalyst.plans.logical.Statistics(
      sizeInBytes = left.stats.sizeInBytes + right.stats.sizeInBytes)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[IntervalJoinPlan]]; injected via GraftExtensions. Physical
  * choice mirrors the as-of strategy: a dimension-sized right side
  * (stats vs autoBroadcastJoinThreshold) broadcasts and the fact side
  * crosses untouched; otherwise both sides cluster on the key.
  */
object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoinPlan(l, r, lk, rk, ls, le, rs, re, payload, hint) =>
      val threshold = org.apache.spark.sql.internal.SQLConf.get
        .autoBroadcastJoinThreshold
      val broadcast = hint.getOrElse(
        threshold > 0 && r.stats.sizeInBytes <= threshold)
      if (broadcast) {
        BroadcastIntervalJoinExec(lk, rk, ls, le, rs, re, payload,
          planLater(l), planLater(r)) :: Nil
      } else {
        IntervalJoinExec(lk, rk, ls, le, rs, re, payload,
          planLater(l), planLater(r)) :: Nil
      }
    case _ => Nil
  }
}

private[plans] object IntervalBounds {
  /** Open bounds: null start = -∞, null end = +∞. */
  def startOf(e: Any): Long =
    if (e == null) Long.MinValue else e.asInstanceOf[Long]
  def endOf(e: Any): Long =
    if (e == null) Long.MaxValue else e.asInstanceOf[Long]
}

/** Sweep-line merge form. Both children cluster on the key and sort
  * LOCALLY by (key, start NULLS FIRST) — nulls-first IS the -∞
  * interpretation, so no pre-coalescing projection is needed. Per key
  * the sweep keeps an active buffer of right intervals; for each left
  * row it (1) evicts buffer entries whose end has passed the left
  * start — later lefts start even later, so eviction is final —
  * (2) consumes the cursor up to the left end, (3) emits every buffered
  * entry that truly overlaps (the rs < le check re-filters entries
  * consumed for an earlier, longer left).
  */
case class IntervalJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftStart: Expression,
    leftEnd: Expression,
    rightStart: Expression,
    rightEnd: Expression,
    rightPayload: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ rightPayload

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftStart).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightStart).map(SortOrder(_, Ascending)))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val leftOutput = left.output
    val rightOutput = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lsExpr = leftStart
    val leExpr = leftEnd
    val rsExpr = rightStart
    val reExpr = rightEnd
    val payload = rightPayload
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOutput)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val lsEval = BindReferences.bindReference(lsExpr, leftOutput)
      val leEval = BindReferences.bindReference(leExpr, leftOutput)
      val rsEval = BindReferences.bindReference(rsExpr, rightOutput)
      val reEval = BindReferences.bindReference(reExpr, rightOutput)
      val payloadProj = UnsafeProjection.create(payload, rightOutput)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow

      // active right intervals for the CURRENT key: (rs, re, payload)
      val active = scala.collection.mutable.ArrayDeque.empty[(Long, Long, UnsafeRow)]
      var activeKey: UnsafeRow = null
      var rh: InternalRow = if (rIter.hasNext) rIter.next() else null

      new Iterator[InternalRow] {
        private var pending: Iterator[InternalRow] = Iterator.empty

        override def hasNext: Boolean = pending.hasNext || advance()

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          pending.next()
        }

        private def advance(): Boolean = {
          while (!pending.hasNext && lIter.hasNext) {
            val l = lIter.next()
            val ls = IntervalBounds.startOf(lsEval.eval(l))
            val le = IntervalBounds.endOf(leEval.eval(l))
            // empty/inverted LEFT intervals intersect nothing — skip the
            // row entirely (the next left re-checks key change itself)
            if (ls < le) {
              val lk = lKeyProj(l)
              if (activeKey == null || keyOrd.compare(activeKey, lk) != 0) {
                // key change: the buffer belongs to a previous key
                active.clear()
                activeKey = lk.copy()
              }
              // (1) evict: ends at-or-before this left's start can never
              // overlap this or any later (larger-ls) left of this key
              active.filterInPlace { case (_, re, _) => re > ls }
              // (2) consume right rows of this key starting before le
              var scan = true
              while (scan && rh != null) {
                val rk = rKeyProj(rh)
                val c = keyOrd.compare(rk, lk)
                if (c < 0) {
                  rh = if (rIter.hasNext) rIter.next() else null
                } else if (c == 0) {
                  val rs = IntervalBounds.startOf(rsEval.eval(rh))
                  if (rs < le) {
                    val re = IntervalBounds.endOf(reEval.eval(rh))
                    // rs < re: empty/inverted intervals never join (parity
                    // with the broadcast form's index build); re > ls:
                    // dead-on-arrival intervals never buffer
                    if (rs < re && re > ls) {
                      active.append((rs, re, payloadProj(rh).copy()))
                    }
                    rh = if (rIter.hasNext) rIter.next() else null
                  } else scan = false
                } else scan = false
              }
              // (3) emit every buffered interval that overlaps THIS left
              // (rs < le re-checks entries consumed for a longer earlier
              // left; re > ls re-checks entries not yet evicted)
              if (active.nonEmpty) {
                val lCopy = l.copy()
                val hits = active.filter { case (rs, re, _) => rs < le && re > ls }
                if (hits.nonEmpty) {
                  numOutputRows += hits.length
                  pending = hits.iterator.map { case (_, _, p) =>
                    resultProj(joined(lCopy, p))
                  }
                }
              }
            }
          }
          pending.hasNext
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Broadcast interval join — dimension-sized right side. Per task the
  * broadcast rows group per key into start-sorted arrays; each left row
  * binary-searches the upper bound (first rs >= le) and scans backward
  * filtering re > ls. The scan is bounded below by the true hit count
  * but can touch already-ended intervals (no interval tree); fine at
  * dimension scale, and the fact side keeps layout + partitioning with
  * zero exchange.
  */
case class BroadcastIntervalJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftStart: Expression,
    leftEnd: Expression,
    rightStart: Expression,
    rightEnd: Expression,
    rightPayload: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ rightPayload

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution ::
      BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val leftOutput = left.output
    val rightOutput = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lsExpr = leftStart
    val leExpr = leftEnd
    val rsExpr = rightStart
    val reExpr = rightEnd
    val payload = rightPayload
    val outAttrs = output

    val broadcastRelation = right.executeBroadcast[Array[InternalRow]]()

    left.execute().mapPartitions ({ lIter =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOutput)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOutput)
      val lsEval = BindReferences.bindReference(lsExpr, leftOutput)
      val leEval = BindReferences.bindReference(leExpr, leftOutput)
      val rsEval = BindReferences.bindReference(rsExpr, rightOutput)
      val reEval = BindReferences.bindReference(reExpr, rightOutput)
      val payloadProj = UnsafeProjection.create(payload, rightOutput)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow

      // key -> (startArr sorted asc, endArr, payloadArr) aligned
      val index = new java.util.HashMap[UnsafeRow, (Array[Long], Array[Long], Array[UnsafeRow])]()
      locally {
        val grouped = new java.util.HashMap[UnsafeRow,
          scala.collection.mutable.ArrayBuffer[(Long, Long, UnsafeRow)]]()
        broadcastRelation.value.foreach { r =>
          val k = rKeyProj(r).copy()
          val rs = IntervalBounds.startOf(rsEval.eval(r))
          val re = IntervalBounds.endOf(reEval.eval(r))
          if (rs < re) { // empty/inverted intervals can never overlap
            var buf = grouped.get(k)
            if (buf == null) {
              buf = scala.collection.mutable.ArrayBuffer.empty
              grouped.put(k, buf)
            }
            buf += ((rs, re, payloadProj(r).copy()))
          }
        }
        grouped.forEach { (k, buf) =>
          val sorted = buf.sortBy(_._1).toArray
          index.put(k, (sorted.map(_._1), sorted.map(_._2), sorted.map(_._3)))
        }
      }

      lIter.flatMap { l =>
        val ls = IntervalBounds.startOf(lsEval.eval(l))
        val le = IntervalBounds.endOf(leEval.eval(l))
        // empty/inverted LEFT intervals intersect nothing (merge parity)
        val entry = if (ls < le) index.get(lKeyProj(l)) else null
        if (entry == null) Iterator.empty
        else {
          val (rsArr, reArr, pArr) = entry
          // upper bound: first idx with rs >= le — candidates are [0, ub)
          var lo = 0; var hi = rsArr.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (rsArr(mid) < le) lo = mid + 1 else hi = mid
          }
          val ub = lo
          val lCopy = if (ub > 0) l.copy() else null
          (0 until ub).iterator.collect {
            case i if reArr(i) > ls =>
              numOutputRows += 1
              resultProj(joined(lCopy, pArr(i)))
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastIntervalJoinExec =
    copy(left = newLeft, right = newRight)
}

object IntervalJoin {
  /** DataFrame face of the interval overlap join. Half-open `[s, e)`
    * semantics; NULL start/end are open bounds (SCD2 current rows join
    * without sentinel coalescing). Bounds must be LongType (engine ns
    * convention). Right payload names must not collide with left
    * columns; include the right bounds in `payloadCols` (aliased) if
    * the caller needs the overlap span.
    */
  def intervalJoinExec(left: DataFrame, right: DataFrame, key: String,
      startCol: String, endCol: String, payloadCols: Seq[String],
      broadcast: Option[Boolean] = None): DataFrame = {
    val dup = payloadCols.toSet.intersect(left.columns.toSet)
    require(dup.isEmpty,
      s"intervalJoinExec: payload columns collide with left columns: ${dup.mkString(", ")}")
    val rCols = (Seq(key, startCol, endCol) ++ payloadCols).distinct
    val rProj = right.select(rCols.map(c => col(c).as(c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rProj.queryExecution.analyzed
    def attrOf(out: Seq[Attribute], n: String, side: String): Attribute =
      out.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"intervalJoinExec: no column '$n' on the $side side"))
    val bounds = Seq(
      "left start" -> attrOf(lPlan.output, startCol, "left"),
      "left end" -> attrOf(lPlan.output, endCol, "left"),
      "right start" -> attrOf(rPlan.output, startCol, "right"),
      "right end" -> attrOf(rPlan.output, endCol, "right"))
    bounds.foreach { case (what, a) =>
      require(a.dataType == LongType,
        s"intervalJoinExec: $what must be LongType (engine ns convention), got ${a.dataType}")
    }
    val lKey = attrOf(lPlan.output, key, "left")
    val rKey = attrOf(rPlan.output, key, "right")
    // mismatched key types would silently produce zero matches in the
    // broadcast form (UnsafeRow byte-equality across different schemas)
    // and undefined comparisons in the merge form — reject loudly
    require(lKey.dataType == rKey.dataType,
      s"intervalJoinExec: key '$key' type mismatch between sides: " +
        s"${lKey.dataType} vs ${rKey.dataType}")
    val node = IntervalJoinPlan(lPlan, rPlan,
      Seq(lKey), Seq(rKey),
      bounds(0)._2, bounds(1)._2, bounds(2)._2, bounds(3)._2,
      payloadCols.map(attrOf(rPlan.output, _, "right")), broadcast)
    org.apache.spark.sql.graft.PlanBridge.ofRows(left.sparkSession, node)
  }
}
