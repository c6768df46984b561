package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gates for plans.TsNanosPushdown: event-time predicates on the
  * ns-normalized `ts` column must (a) keep exact boundary semantics —
  * the rounding direction of the ns→µs bound is the part a bug would
  * silently get wrong — and (b) reach the parquet scan as a PushedFilter
  * on the raw timestamp column, which is what buys row-group pruning at
  * 100 TB.
  */
class TsNanosPushdownSpec extends SparkSpec {
  import spark.implicits._

  /** micros {-1, 0, 1, 2} as an NTZ-vintage frame → ns {-1000, 0, 1000, 2000}. */
  private def ntzFrame: DataFrame =
    Tables.tsToNanos(Seq(-1L, 0L, 1L, 2L).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")))

  private def ltzFrame: DataFrame =
    Tables.tsToNanos(Seq(-1L, 0L, 1L, 2L).toDF("us")
      .select(timestamp_micros(col("us")).as("ts")))

  test("boundary semantics survive the rewrite on both timestamp vintages") {
    for (df <- Seq(ntzFrame, ltzFrame)) {
      val ns = Seq(-1000L, 0L, 1000L, 2000L)
      def n(cond: org.apache.spark.sql.Column): Long = df.where(cond).count()
      assert(n(col("ts") < 1500L) == ns.count(_ < 1500L))    // ceil path
      assert(n(col("ts") < 1000L) == ns.count(_ < 1000L))    // exact bound
      assert(n(col("ts") <= 1000L) == ns.count(_ <= 1000L))  // floor path
      assert(n(col("ts") > 1000L) == ns.count(_ > 1000L))
      assert(n(col("ts") >= 1001L) == ns.count(_ >= 1001L))  // rounds up to 2µs
      assert(n(col("ts") === 1000L) == 1)
      assert(n(col("ts") === 1500L) == 0)                    // non-µs-aligned → false
      assert(n(col("ts") < -999L) == ns.count(_ < -999L))    // negative ceil
      assert(n(lit(999L) < col("ts")) == ns.count(999L < _)) // mirrored orientation
    }
  }

  test("ts cutoff reaches the events parquet scan as a PushedFilter") {
    val cutoffNs = 1705363200000000000L // the ext_incr_agg split point
    val filtered = Tables.events(spark, sf0001).where(col("ts") < cutoffNs)
    val plan = filtered.queryExecution.executedPlan.toString
    // non-vacuous: a ts comparison must appear INSIDE the PushedFilters
    // bracket — without the rule the filter is an un-translatable
    // expression and the bracket holds at most IsNotNull
    assert("PushedFilters: \\[[^\\]]*LessThan\\(ts".r.findFirstIn(plan).isDefined,
      s"expected LessThan(ts…) inside PushedFilters in:\n$plan")
    // and the rewrite changes no rows vs. the unfiltered frame's own count
    val expected = Tables.events(spark, sf0001)
      .collect().count(_.getAs[Long]("ts") < cutoffNs)
    assert(filtered.count() == expected)
  }

  test("null ts rows drop identically through the rewrite") {
    val df = Tables.tsToNanos(
      Seq(Some(1L), None, Some(2L)).toDF("us")
        .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")))
    assert(df.where(col("ts") < 1500L).count() == 1)
    assert(df.where(col("ts") >= 0L).count() == 2)
    assert(df.where(col("ts") === 1500L).count() == 0)
  }

  test("non-aligned equality under NOT keeps null-drop semantics (no false fold)") {
    val df = Tables.tsToNanos(
      Seq(Some(1L), None, Some(2L)).toDF("us")
        .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")))
    // null row: NOT(null === c) is null → dropped by the original; a
    // false-fold applied under NOT would give NOT(false) = true and
    // wrongly keep it. Both negation spellings must count only the two
    // non-null rows.
    assert(df.where(!(col("ts") === 1500L)).count() == 2)
    assert(df.where(col("ts") =!= 1500L).count() == 2)
    // conjunct positions still fold to false (and still drop everything)
    assert(df.where(col("ts") === 1500L && col("ts") >= 0L).count() == 0)
    // OR position: null row kept via the other branch, identically with
    // or without the (skipped) fold
    assert(df.where(col("ts") === 1500L || col("ts").isNull).count() == 1)
  }
}
