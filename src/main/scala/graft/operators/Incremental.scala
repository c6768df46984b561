package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view pattern that
  * makes per-key metrics affordable at 100 TB: keep a compact per-key
  * STATE table of mergeable partial aggregates (count / sum / max), and
  * on each new batch aggregate ONLY the delta and merge it into the
  * state, instead of rescanning the full history. This is exactly the
  * partial/final split Spark's HashAggregateExec performs within one
  * query, lifted across queries: `merge(state(A), state(B)) ≡
  * state(A ∪ B)` for any split, because every kept statistic is a
  * commutative monoid (counts and sums add, max takes greatest). Derived
  * non-mergeable metrics (averages, rates) are computed FROM the merged
  * state, never stored in it.
  *
  * The reference's closest shape is its SCD2 upsert of dwd_customer
  * (/root/reference/dmCustomerProc.py:185-232) — maintain a keyed table
  * against a daily delta rather than rebuilding it; here the maintained
  * object is an aggregate instead of a dimension row.
  *
  * Determinism: money-like doubles are quantized to integer cents
  * (`round(value*100)` as BIGINT) before summing, so state sums are
  * exact and order-free across any partitioning — and bit-identical in
  * the DuckDB oracle.
  *
  * Scale shape: `eventState` is one map-side-combinable aggregate over
  * the delta only; `mergeStates` is one key-equi full-outer join. With
  * the state table bucketed/co-partitioned on the key (Sources'
  * bucketed-write path), the merge is shuffle-free on the state side —
  * only the (small) delta state moves.
  */
object Incremental {

  /** Value quantized to exact integer cents. */
  private val cents = round(col("value") * 100, 0).cast("long")

  /** Mergeable per-user state over an event batch: additive count and
    * cent-sum plus a max — each a commutative monoid, so states built
    * from any partition of the data merge to the same result.
    */
  def eventState(events: DataFrame): DataFrame =
    events.groupBy("user_id").agg(
      count(lit(1)).as("n_events"),
      sum(cents).as("total_cents"),
      max(cents).as("max_cents"))

  /** Merge two per-user states: full-outer on the key, monoid-combine
    * each statistic (missing side = identity element).
    */
  def mergeStates(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.select(col("user_id"), col("n_events").as("__ln"),
      col("total_cents").as("__lt"), col("max_cents").as("__lm"))
    val r = b.select(col("user_id"), col("n_events").as("__rn"),
      col("total_cents").as("__rt"), col("max_cents").as("__rm"))
    l.join(r, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        (coalesce(col("__ln"), lit(0L)) + coalesce(col("__rn"), lit(0L))).as("n_events"),
        (coalesce(col("__lt"), lit(0L)) + coalesce(col("__rt"), lit(0L))).as("total_cents"),
        greatest(coalesce(col("__lm"), lit(Long.MinValue)),
          coalesce(col("__rm"), lit(Long.MinValue))).as("max_cents"))
  }

  /** Derived metrics from a state — computed after the merge (an average
    * is not a monoid; its numerator and denominator are).
    */
  def withDerived(state: DataFrame): DataFrame =
    state.withColumn("avg_value",
      round(col("total_cents") / 100.0 / col("n_events"), 6))

  /** Mergeable TOP-K state (leaderboard maintenance): per group, the K
    * best (score, id) entries; merging two states is union + re-cut,
    * and `mergeTopK(topK(A), topK(B)) ≡ topK(A ∪ B)` for any split —
    * a bounded semilattice, so daily partial leaderboards fold into
    * the global one without rescanning history.
    *
    * THE PRECONDITION IS IMMUTABLE PER-ITEM SCORES. Top-k over scores
    * that themselves accumulate across batches (a user's running
    * total) is NOT mergeable: an entity below the cut in every batch
    * can be above it in the union (IncrementalSpec constructs the
    * counterexample). The incremental form of that problem is
    * [[eventState]] (keep the FULL per-key monoid state) followed by a
    * final top-k over the merged state.
    *
    * Scale shape: the per-batch cut is a (group)-partitioned window
    * over the batch only, and every merge runs on ≤ 2K rows per group.
    */
  def topKCut(state: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("cents").desc, col("event_id").asc)
    state.withColumn("__rn", row_number().over(w)).where(col("__rn") <= k)
      .select("event_type", "event_id", "cents")
  }

  /** Per-group top-K single events (exact cents, total (score, id)
    * tiebreak) over one batch.
    */
  def topKState(events: DataFrame, k: Int): DataFrame =
    topKCut(events.select(col("event_type"), col("event_id"),
      cents.as("cents")), k)

  /** Merge two top-K states: union then re-cut. */
  def mergeTopK(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    topKCut(a.unionByName(b), k)
}
