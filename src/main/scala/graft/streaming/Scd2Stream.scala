package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 maintenance as a STREAM: the reference's flagship composite
  * (expire superseded rows, insert new current rows — dm:185-232) applied
  * per micro-batch of arriving updates via foreachBatch.
  *
  * Shape: the dimension snapshot is the fold state; each micro-batch
  * joins against the CURRENT slice only (history rows pass through
  * untouched), so per-batch work scales with |batch| + |current keys|,
  * never with accumulated history. foreachBatch delivers at-least-once;
  * `applyBatch` is deterministic in (dim, batch), so a replayed batch
  * folds to the identical snapshot — production sinks additionally key
  * writes on batchId for idempotence.
  *
  * Dimension schema: (keyCol, valueCol, effective_from, effective_to,
  * is_current) with Long event-time stamps (`effective_to` null on the
  * open row). Update schema: (keyCol, valueCol, tsCol).
  */
object Scd2Stream {

  /** Fold ONE batch of updates into the dimension snapshot:
    *  - several updates for a key in one batch collapse to the latest
    *    (by ts, value tiebreak — a total order, G6 discipline);
    *  - a no-op update (same value as current) leaves the dimension
    *    untouched — no spurious version churn;
    *  - a changed/new value expires the open row at the update's ts and
    *    opens a new current row from it.
    */
  def applyBatch(dim: DataFrame, updates: DataFrame, keyCol: String,
      valueCol: String, tsCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).desc, col(valueCol).desc)
    val latest = updates.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    val cur = dim.where(col("is_current") === 1)
    val hist = dim.where(col("is_current") === 0)
    val changed = latest
      .join(cur.select(col(keyCol), col(valueCol).as("__cur_v")), Seq(keyCol), "left")
      .where(col("__cur_v").isNull || col("__cur_v") =!= col(valueCol))
      .select(col(keyCol), col(valueCol), col(tsCol))
    val newCurrent = changed.select(col(keyCol), col(valueCol),
      col(tsCol).as("effective_from"),
      lit(null).cast("long").as("effective_to"),
      lit(1).as("is_current"))
    val expired = cur
      .join(changed.select(col(keyCol), col(tsCol).as("__new_from")), Seq(keyCol))
      .select(col(keyCol), col(valueCol), col("effective_from"),
        col("__new_from").as("effective_to"), lit(0).as("is_current"))
    val untouched = cur.join(changed.select(keyCol), Seq(keyCol), "left_anti")
    hist.unionByName(expired).unionByName(untouched).unionByName(newCurrent)
  }

  /** foreachBatch fold state: each batch replaces the snapshot with the
    * folded one. localCheckpoint per batch keeps the snapshot's plan O(1)
    * instead of embedding every prior batch's lineage (the same
    * iterative-algorithm rule as connectedComponents).
    */
  final class DimState(initial: DataFrame, keyCol: String,
      valueCol: String, tsCol: String) {
    @volatile var dim: DataFrame = initial.localCheckpoint()
    def sink(batch: DataFrame, batchId: Long): Unit =
      dim = applyBatch(dim, batch, keyCol, valueCol, tsCol).localCheckpoint()
  }
}
