package graft.streaming

import graft.operators.Sketches
import org.apache.spark.sql.DataFrame

/** Approximate-distinct maintained over a STREAM: the linear-counting
  * occupancy bitmap driven by foreachBatch — each micro-batch is hashed
  * and distinct'd alone (one map-side-combined pass over the batch,
  * never the history) and OR-merged into the kept state.
  *
  * This is the streaming twin of ext_sketch_lincount's sketch side.
  * Because the merge is an IDEMPOTENT set union — state(A) ⊕ state(B) ≡
  * state(A ∪ B) for any split, including overlapping/replayed rows —
  * micro-batch boundaries and redelivery are semantically invisible:
  * StreamingSpec replays the same keys across batches and asserts the
  * folded estimate equals the one-shot batch sketch. An ADDITIVE merge
  * (count sums) would overcount exactly there; the bitmap cannot.
  *
  * State is fixed-cardinality (≤ groups × buckets rows) — the reason a
  * 100 TB pipeline keeps THIS and drops the exact distinct: the state
  * never grows with the key universe. Mechanics follow
  * MetricsStream.MetricsState (localCheckpoint per fold, superseded
  * snapshot released after the new one materializes).
  */
object SketchStream {

  final class LincountState(initial: DataFrame, keyCol: String,
      groupCol: String, buckets: Int) {
    @volatile var state: DataFrame =
      Sketches.lincountState(initial, keyCol, groupCol, buckets)
        .localCheckpoint()

    def sink(batch: DataFrame, batchId: Long): Unit = {
      val old = state
      state = Sketches.mergeLincountStates(old,
          Sketches.lincountState(batch, keyCol, groupCol, buckets))
        .localCheckpoint()
      Scd2Stream.releaseSnapshot(old)
    }

    /** Current estimate per group off the folded occupancy state. */
    def estimate(): DataFrame =
      Sketches.lincountEstimate(state, groupCol, buckets)

    /** Pairwise overlap estimates off the SAME folded state — the
      * audience-overlap readout costs nothing extra to maintain: the
      * OR-merge makes the streamed state identical to the one-shot
      * bitmap, so these match the batch audit's estimates exactly
      * (spec-asserted).
      */
    def overlap(): DataFrame =
      Sketches.lincountOverlapEstimate(state, groupCol, buckets)
  }

  /** ADDITIVE sketch state under redelivery — the fixed-edge histogram
    * ([[Sketches.fixedHistState]]) folded over foreachBatch with the
    * IDEMPOTENT-SINK pattern: vector-ADD is exact for disjoint batches
    * but double-counts a replay (SketchSpec proves it), and Structured
    * Streaming's foreachBatch contract is AT-LEAST-once per batchId —
    * the same (batchId, data) pair may be re-delivered after a failure.
    * The canonical fix is the batchId ledger: a sink that records which
    * epochs it has applied and no-ops on re-delivery, turning
    * at-least-once delivery into exactly-once STATE. (In a durable
    * deployment the ledger is a transactional write of state + max
    * batchId together; here it is the in-memory set the spec attacks by
    * calling the sink twice with the same id.) This is the half of the
    * exactly-once story the OR-bitmap never needed — pairing the two
    * states makes the merge-algebra distinction operational, not just
    * documented.
    */
  final class HistState(initial: DataFrame, valCol: String,
      groupCol: String, lo: Double, hi: Double, bins: Int) {
    @volatile var state: DataFrame =
      Sketches.fixedHistState(initial, valCol, groupCol, lo, hi, bins)
        .localCheckpoint()
    private val applied = scala.collection.mutable.Set.empty[Long]

    def sink(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (!applied.add(batchId)) return // replayed epoch: already folded
      val old = state
      state = Sketches.mergeHistStates(old,
          Sketches.fixedHistState(batch, valCol, groupCol, lo, hi, bins))
        .localCheckpoint()
      Scd2Stream.releaseSnapshot(old)
    }

    /** Quantile estimates off the folded histogram state. */
    def quantiles(qs: Seq[Double]): DataFrame =
      Sketches.fixedHistQuantiles(state, groupCol, lo, hi, bins, qs)
  }
}
