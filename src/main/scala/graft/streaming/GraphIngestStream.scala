package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame

/** STREAMING ANN ADMISSION — the foreachBatch shape of
  * ext_ann_hnsw_append: the FIRST micro-batch builds the persisted
  * graph index (and with it the quantizer — centroids are picked once
  * and never re-picked, the serving-geometry contract), every later
  * batch admits through [[Similarity.appendToGraphIndex]]. The
  * batch-split invariance proved by SimilaritySpec (any partition of
  * the ingest into batch sequences lands the identical index, because
  * every append ranks against the same stored quantizer and the edge
  * merge is a semilattice fold under immutable pair scores) is exactly
  * what makes the stream correct under any micro-batch boundary
  * placement; the batchId ledger makes a replayed epoch a no-op.
  *
  * State is the ON-DISK index — the stream carries no in-memory frame
  * at all, so a driver restart resumes from the persisted files plus
  * the sink's own checkpointed ledger (the IVF/minhash incremental
  * index discipline, on the graph structure).
  */
object GraphIngestStream {

  final class GraphState(idCol: String, vecCol: String,
      centroidEvery: Int, m: Int, val path: String) {
    private val applied = scala.collection.mutable.Set.empty[Long]
    // resume-aware: after a driver restart a FRESH GraphState must not
    // rebuild-and-overwrite (that would re-pick the quantizer from one
    // arbitrary batch and drop everything admitted so far) — an index
    // already on disk means every future batch is an admission. The
    // in-memory ledger is per-incarnation; across restarts the sink's
    // own streaming checkpoint is what prevents epoch re-delivery.
    @volatile private var built = false

    private def indexOnDisk(batch: DataFrame): Boolean = {
      val p = new org.apache.hadoop.fs.Path(s"$path/cents")
      p.getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
        .exists(p)
    }

    def sink(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (!applied.add(batchId)) return // replayed epoch: already admitted
      if (batch.isEmpty) return
      if (!built && !indexOnDisk(batch)) {
        Similarity.writeGraphIndex(batch, idCol, vecCol,
          centroidEvery, m, path)
        built = true
      } else {
        built = true
        Similarity.appendToGraphIndex(batch, idCol, vecCol, m, path)
      }
    }

    /** Serve top-k off the index as folded so far. */
    def probe(queries: DataFrame, k: Int, entryEvery: Int, beam: Int,
        rounds: Int): DataFrame =
      Similarity.probeGraphIndex(path, queries, idCol, vecCol, k,
        entryEvery, beam, rounds)
  }
}
