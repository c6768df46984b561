package graft

import graft.plans.{BroadcastIntervalJoinExec, IntervalJoin, IntervalJoinExec}
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** The interval overlap join (plans/IntervalJoin.scala): half-open
  * semantics and open null bounds pinned by hand fixtures; both
  * physical forms pinned equal to the naive theta join on real
  * event-derived validity chains; plan shapes pinned.
  */
class IntervalExecSpec extends SparkSpec {
  import spark.implicits._

  private val L = Long.box _

  test("overlap semantics: half-open [s,e), touching edges do NOT join, null bounds are open") {
    val left = Seq(
      (1L, L(100L), L(200L), "base"),
      (1L, L(250L), L(260L), "gap"),     // falls in no right interval
      (1L, null, L(50L), "open_past"),   // [-inf, 50)
      (2L, L(100L), null, "open_future"),// [100, +inf)
      (3L, L(0L), L(10L), "other_key"),
      (1L, L(160L), L(160L), "l_empty") // empty LEFT interval: never joins
    ).toDF("k", "vfrom", "vto", "lv")
    val right = Seq(
      (1L, L(150L), L(300L), "r_overlap"),   // ∩ base=[150,200), gap=[250,260)
      (1L, L(200L), L(240L), "r_touching"),  // starts exactly at base's end: NO join with base
      (1L, L(40L), L(60L), "r_early"),       // ∩ open_past=[40,50)
      (2L, L(500L), L(600L), "r_late"),      // ∩ open_future
      (2L, L(0L), L(100L), "r_before"),      // ends exactly at open_future's start: NO
      (1L, L(400L), L(400L), "r_empty"),     // empty interval: never joins
      (1L, L(150L), L(150L), "r_empty_in")   // empty, STRICTLY INSIDE base:
        // still never joins — both physical forms must drop it (the
        // shuffled sweep used to buffer+emit this shape)
    ).toDF("k", "vfrom", "vto", "pv")
    for (form <- Seq(Some(false), Some(true))) {
      val got = IntervalJoin
        .intervalJoinExec(left, right, "k", "vfrom", "vto", Seq("pv"), form)
        .select("k", "lv", "pv").as[(Long, String, String)].collect()
      assert(got.length == got.toSet.size, s"duplicate pairs ($form)")
      assert(got.toSet == Set(
        (1L, "base", "r_overlap"),
        (1L, "gap", "r_overlap"),
        (1L, "open_past", "r_early"),
        (2L, "open_future", "r_late")), s"wrong pair set for form=$form")
    }
  }

  test("both physical forms ≡ naive theta join on event-derived validity chains") {
    val ev = Tables.events(spark, sf0001)
    // per-user validity chains: each event's value holds until the next
    // event of the same type; the last version is open-ended (null vto)
    def chain(t: String) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("vfrom"), col("event_id"))
      ev.where(col("event_type") === t)
        .select(col("user_id"), col("ts").as("vfrom"), col("event_id"))
        .withColumn("vto", lead(col("vfrom"), 1).over(w))
    }
    val clicks = chain("click").withColumnRenamed("event_id", "l_id")
    val views = chain("view")
      .select(col("user_id"), col("vfrom"), col("vto"),
        col("event_id").as("r_id"))
    val naive = clicks.alias("l").join(views.alias("r"),
      col("l.user_id") === col("r.user_id") &&
        col("l.vfrom") < coalesce(col("r.vto"), lit(Long.MaxValue)) &&
        col("r.vfrom") < coalesce(col("l.vto"), lit(Long.MaxValue)) &&
        // empty intervals (duplicate-ts chains) intersect nothing
        col("l.vfrom") < coalesce(col("l.vto"), lit(Long.MaxValue)) &&
        col("r.vfrom") < coalesce(col("r.vto"), lit(Long.MaxValue)),
      "inner").select(col("l.user_id"), col("l_id"), col("r_id"))
    assert(naive.count() > clicks.count(),
      "vacuous: chains must actually fan out")
    for (form <- Seq(Some(false), Some(true))) {
      val got = IntervalJoin
        .intervalJoinExec(clicks, views, "user_id", "vfrom", "vto",
          Seq("r_id"), form)
        .select(col("user_id"), col("l_id"), col("r_id"))
      assert(got.exceptAll(naive).count() == 0 &&
        naive.exceptAll(got).count() == 0,
        s"theta-join divergence for form=$form")
    }
  }

  test("plan shapes: merge form clusters+sorts per side; broadcast form leaves the fact side untouched") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val left = (1 to 900).map(i => ((i % 9).toLong, i.toLong * 5, i.toLong * 5 + 30, i.toLong))
        .toDF("k", "vfrom", "vto", "lv")
      val right = (1 to 90).map(i => ((i % 9).toLong, i.toLong * 40, i.toLong * 40 + 80, i.toLong))
        .toDF("k", "vfrom", "vto", "pv")
      val merged = IntervalJoin.intervalJoinExec(left, right, "k",
        "vfrom", "vto", Seq("pv"), Some(false))
      assert(merged.count() > 0)
      val mPlan = merged.queryExecution.executedPlan
      assert(mPlan.collectWithSubqueries { case e: IntervalJoinExec => e }.nonEmpty)
      assert(mPlan.collectWithSubqueries { case s: ShuffleExchangeExec => s }.size == 2)
      assert(mPlan.collectWithSubqueries { case s: SortExec => s }
        .forall(!_.global), "interval merge must only sort locally")
      val bcast = IntervalJoin.intervalJoinExec(left, right, "k",
        "vfrom", "vto", Seq("pv"), Some(true))
      assert(bcast.count() > 0)
      val bPlan = bcast.queryExecution.executedPlan
      assert(bPlan.collectWithSubqueries { case e: BroadcastIntervalJoinExec => e }.nonEmpty)
      assert(bPlan.collectWithSubqueries { case s: ShuffleExchangeExec => s }.isEmpty &&
        bPlan.collectWithSubqueries { case s: SortExec => s }.isEmpty,
        s"broadcast interval join must not shuffle or sort:\n$bPlan")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }
}
