package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Value-grid coarsening for DISTINCT-value rank frames.
  *
  * The tie-coherent quantile/Pareto family (ext_events_rfm,
  * ext_events_pareto, ext_corpus_gini) deliberately windows over the
  * DISTINCT values of a metric instead of the user universe — bounded by
  * |days| or |counts| for recency/frequency, but for monetary cents an
  * adversarial near-unique revenue distribution makes |distinct values|
  * approach |users| and the single-partition value window becomes the
  * 100 TB straggler. `step` is the documented knob: snapping values onto
  * an equal-width grid bounds the ordered frame to ≤ range/step rows at
  * ANY distribution, at the cost of score/cut granularity — users inside
  * one grid cell become interchangeable (which is exactly what a
  * quartile score treats them as anyway). step = 1 is the identity: the
  * grid IS the value set and results are bit-identical to the exact
  * form (both grid queries' oracles pin this family's semantics at
  * step > 1 too — the knob is oracle-gated, not a trust-me fallback).
  *
  * All arithmetic is BIGINT; metrics are non-negative by contract
  * (counts, day-distances, cent totals), so truncating div IS floor and
  * both engines agree without a sign case.
  */
object ValueGrid {

  /** Snap a non-negative BIGINT value onto the `step`-width grid
    * (identity when step ≤ 1). */
  def snap(c: Column, step: Long): Column =
    // c - (c % step) ≡ (c div step)·step for the non-negative BIGINTs this
    // family carries — stays in integer arithmetic (Column./ is a double
    // division and would lose exactness past 2^53)
    if (step <= 1L) c else c - (c % step)

  /** Tie-coherent q-quantile scores (1..q, 1 = first in `asc` order) of
    * `metric` off its distinct-GRID-value frame: the score of a value is
    * the quantile of its first position, (q · values_strictly_better)
    * div n + 1, so equal (snapped) values always share a score and the
    * cut never depends on engine-internal tie order. Returns the
    * (\_\_k_metric, metric_score) lookup keyed by the SNAPPED value —
    * broadcast-join it back via [[snap]] of the metric.
    *
    * `base` must carry `metric` and an `n_users` total column. The
    * window orders ≤ range/step rows — the bounded frame this knob
    * exists to guarantee.
    */
  def quantileScores(base: DataFrame, metric: String, q: Int,
      asc: Boolean, step: Long): DataFrame = {
    val vals = base.groupBy(snap(col(metric), step).as("__vg"), col("n_users"))
      .agg(count(lit(1)).as("m"))
    val w = Window.orderBy(if (asc) col("__vg").asc else col("__vg").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    vals.withColumn("cb", coalesce(sum(col("m")).over(w), lit(0L)))
      .select(col("__vg").as(s"__k_$metric"),
        (expr(s"(cb * $q) div n_users") + 1).as(s"${metric}_score"))
  }

  /** Top-k% concentration shares (Pareto/Lorenz points) of a per-user
    * (user, cents) frame over the distinct-GRID-value frame: whole grid
    * cells below the boundary contribute their exact mass, the
    * straddling cell contributes mass·take div m (users inside a cell
    * are interchangeable — the take is mass-proportional and exact
    * BIGINT). Totals are the TRUE sums (the grid coarsens only the
    * ordering, never the revenue), so shares stay anchored to real
    * mass; step = 1 reproduces the exact per-value computation
    * bit-for-bit (mass = cents·m within a cell of one value).
    */
  def paretoShares(uv: DataFrame, ks: Seq[Int], step: Long): DataFrame = {
    val vc = uv.groupBy(snap(col("cents"), step).as("__vg"))
      .agg(count(lit(1)).as("m"), sum(col("cents")).as("mass"))
    val w = Window.orderBy(col("__vg").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = uv.agg(count(lit(1)).as("n_users"),
      sum(col("cents")).as("total_rev_cents"))
    vc.withColumn("cb", coalesce(sum(col("m")).over(w), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("k_pct", explode(array(ks.map(lit): _*)))
      .withColumn("n_top", expr("(n_users * k_pct) div 100"))
      .withColumn("__take",
        greatest(lit(0L), least(col("m"), expr("n_top - cb"))))
      .groupBy("k_pct", "n_users", "total_rev_cents")
      .agg(max(expr("n_top")).as("n_top_users"),
        sum(expr("(mass * __take) div m")).as("top_rev_cents"))
      .select(col("k_pct"), col("n_top_users"), col("top_rev_cents"),
        col("total_rev_cents"),
        round(col("top_rev_cents") / col("total_rev_cents"), 6).as("share"))
  }
}
