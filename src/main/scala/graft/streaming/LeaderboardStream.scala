package graft.streaming

import org.apache.spark.sql.DataFrame

/** STREAMING LEADERBOARD — the foreachBatch shape of ext_incr_topk:
  * each micro-batch reduces to its own per-group top-K
  * ([[graft.operators.Incremental.topKState]], a (group)-window over
  * the BATCH only) and folds into the carried K-row-per-group state by
  * union + re-cut. The bounded-semilattice law proved by
  * IncrementalSpec (merge of any split ≡ one-shot cut, precondition:
  * immutable per-item scores) is exactly what makes the stream correct
  * under any batch boundary placement; the batchId ledger makes the
  * fold replay-safe. State is K·|groups| rows forever.
  */
object LeaderboardStream {

  final class TopKState(initial: DataFrame, k: Int) {
    @volatile var state: DataFrame =
      graft.operators.Incremental.topKState(initial, k).localCheckpoint()
    private val applied = scala.collection.mutable.Set.empty[Long]

    def sink(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (!applied.add(batchId)) return // replayed epoch: already folded
      val old = state
      state = graft.operators.Incremental.mergeTopK(old,
          graft.operators.Incremental.topKState(batch, k), k)
        .localCheckpoint()
      Scd2Stream.releaseSnapshot(old)
    }
  }
}
