package graft.operators

import org.apache.spark.sql.DataFrame
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
