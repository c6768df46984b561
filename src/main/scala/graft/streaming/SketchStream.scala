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
  }
}
