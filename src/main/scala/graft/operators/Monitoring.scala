package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sign-symmetric truncating integer division, spelled explicitly for
  * each engine: Spark's `div` truncates toward zero while DuckDB's `//`
  * floors, so any grid arithmetic that can go negative (PCA matvec,
  * noise grids) must pin ONE semantics on both sides. Non-negative
  * operands need none of this (trunc ≡ floor).
  */
object IntMath {
  def truncDivSpark(a: String, b: String): String =
    s"CASE WHEN ($a) < 0 THEN -CAST((-($a)) div ($b) AS BIGINT)" +
      s" ELSE CAST(($a) div ($b) AS BIGINT) END"

  def truncDivDuck(a: String, b: String): String =
    s"CASE WHEN ($a) < 0 THEN -CAST((-($a)) // ($b) AS BIGINT)" +
      s" ELSE CAST(($a) // ($b) AS BIGINT) END"
}

/** Pipeline-health statistics shared by the batch queries and their
  * streaming twins (a monitor that can only run in the nightly batch is
  * not a monitor).
  */
object Monitoring {

  /** Zero-fill a (groupCols..., day, y) daily frame onto the dense
    * [min, max] day spine — every day-series statistic (ACF, CUSUM,
    * forecast backtest, seasonality) needs the regular series, and a
    * missing day IS a zero, not an absent observation. Bounds are
    * GLOBAL so groups share one spine (comparable windows).
    */
  def dailySpine(d0: DataFrame, groupCols: Seq[String]): DataFrame = {
    val bounds = d0.agg(min("day").as("lo"), max("day").as("hi"))
    val spine =
      if (groupCols.isEmpty)
        bounds.select(explode(expr("sequence(lo, hi)")).as("day"))
      else d0.select(groupCols.map(col): _*).distinct()
        .crossJoin(broadcast(bounds))
        .select(groupCols.map(col) :+
          explode(expr("sequence(lo, hi)")).as("day"): _*)
    spine.join(d0, groupCols :+ "day", "left").na.fill(0L, Seq("y"))
  }

  /** AUTOCORRELATION at lags 1..maxLag over a dense (day, y) daily
    * frame: residual r_t = n·y_t − S is exact (the n² factors cancel
    * between numerator and denominator), acf_l = Σ r_t·r_{t+l} / Σ r_t²
    * is one rounded division per lag. `wide = true` is the documented
    * 64-bit headroom swap: the residual PRODUCTS run in DECIMAL(38,0)
    * (r up to ~9·10^18 squares past BIGINT once daily counts reach
    * n·y ~ 10^13 — the 100 TB telemetry case); the shape is unchanged
    * and the quotient is computed exact-integer → nearest-double in
    * both engines (identical IEEE value), so wide-vs-narrow is
    * bit-identical wherever narrow doesn't overflow.
    *
    * Scale shape: callers reduce the corpus to the |days| frame first;
    * everything here runs on ≤ |days| rows.
    */
  def acfFromDaily(daily0: DataFrame, maxLag: Int,
      wide: Boolean = true): DataFrame = {
    val daily = daily0.localCheckpoint()
    val tot = daily.agg(count(lit(1)).as("n"), sum("y").as("sm"))
    val r = daily.crossJoin(broadcast(tot))
      .select(col("day"), (col("n") * col("y") - col("sm")).as("r"))
      .localCheckpoint()
    def prod(a: Column, b: Column): Column =
      if (wide)
        a.cast(org.apache.spark.sql.types.DecimalType(19, 0)) *
          b.cast(org.apache.spark.sql.types.DecimalType(19, 0))
      else a * b
    val den = r.agg(sum(prod(col("r"), col("r"))).as("den"))
    val shifted = r.select(col("day").as("sday"), col("r").as("r2"))
    r.withColumn("lag",
        explode(array((1 to maxLag).map(l => lit(l.toLong)): _*)))
      .join(shifted, col("day") + col("lag") === col("sday"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"), sum(prod(col("r"), col("r2"))).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        when(col("den") =!= 0,
          round(col("num").cast("double") / col("den").cast("double"), 6))
          .as("acf"))
  }

  /** TIME-DECAYED ACTIVITY MASS per group over a (group, k) frame of
    * capped decay exponents (k = age div half-life, capped at
    * scaleBits): Σ 2^(scaleBits − k) summed exactly and divided by
    * 2^scaleBits exactly once — bit-reproducible at any partitioning,
    * unlike a float pow() sum. `wide = true` sums in DECIMAL(38,0):
    * BIGINT holds only ~2^63/2^scaleBits rows per group (8·10^9 at the
    * default 30 bits — past that, or at higher precision scaleBits,
    * this is the documented swap). Output is (group, n_events,
    * decayed_mass); the scaled integer stays internal in the wide form
    * because it no longer fits a BIGINT column by construction.
    */
  def decayMass(kFrame: DataFrame, groupCol: String, scaleBits: Int,
      wide: Boolean): DataFrame = {
    val w = expr(s"shiftleft(CAST(1 AS BIGINT), CAST($scaleBits - k AS INT))")
    val summed =
      if (wide) sum(w.cast(org.apache.spark.sql.types.DecimalType(38, 0)))
      else sum(w)
    kFrame.groupBy(groupCol)
      .agg(count(lit(1)).as("n_events"), summed.as("__scaled"))
      .select(col(groupCol), col("n_events"),
        round(col("__scaled").cast("double") / math.pow(2.0, scaleBits), 6)
          .as("decayed_mass"))
  }

  /** CUSUM level-shift changepoint per group over a (group, day, y)
    * daily-count frame: zero-fill onto the dense [min, max] day spine,
    * drift D_t = n·P_t − t·S (exact BIGINT — n² × the centered
    * prefix), argmax on the (|D| desc, day asc) total order, plus
    * normalized drift and before/after means (the only float ops,
    * final divisions). Every window partitions by group over ≤ |days|
    * rows; callers reduce the corpus to the daily frame first.
    */
  def cusumFromDaily(d0: DataFrame, groupCol: String): DataFrame = {
    val f = dailySpine(d0, Seq(groupCol))
    val w = Window.partitionBy(groupCol).orderBy("day")
    val tot = f.groupBy(groupCol)
      .agg(count(lit(1)).as("n"), sum("y").as("sm"))
    val pre = f
      .withColumn("p", sum(col("y")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("t", row_number().over(w).cast("long"))
      .join(broadcast(tot), Seq(groupCol))
      .withColumn("drift", col("n") * col("p") - col("t") * col("sm"))
    val rank = Window.partitionBy(groupCol)
      .orderBy(abs(col("drift")).desc, col("day").asc)
    pre.withColumn("rn", row_number().over(rank)).where(col("rn") === 1)
      .select(col(groupCol), col("n").as("n_days"),
        col("day").as("cp_day"), col("t").as("cp_index"), col("drift"),
        when(col("sm") =!= 0,
          round(col("drift") / (col("n") * col("sm")), 6)).as("drift_norm"),
        round(col("p") / col("t"), 6).as("mean_before"),
        when(col("t") < col("n"),
          round((col("sm") - col("p")) / (col("n") - col("t")), 6))
          .as("mean_after"))
  }
}
