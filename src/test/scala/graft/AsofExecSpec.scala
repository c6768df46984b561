package graft

import graft.operators.Relational
import graft.plans.{AsofJoin, AsofJoinExec, BroadcastAsofJoinExec}
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** The physical as-of join (plans/AsofJoin.scala): semantics pinned
  * against hand fixtures AND the composed union+window operator, plan
  * shape pinned to the merge exec (no window, one exchange + one local
  * sort per side).
  */
class AsofExecSpec extends SparkSpec {
  import spark.implicits._

  private def execAsof(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame) =
    AsofJoin.asofJoinExec(left, right, "k", "ts", "tie", Seq("pv"))

  test("as-of semantics: latest at-or-before per key, ties -> max tiebreak, no cross-key leak") {
    val left = Seq(
      (1L, 100L, "a"), (1L, 200L, "b"), (1L, 50L, "c"),
      (2L, 100L, "d"), // key 2 has only future right rows -> null
      (3L, 100L, "e")  // key 3 has no right rows at all -> null (and key 1's
                       // candidate must not leak forward across the key change)
    ).toDF("k", "ts", "lv")
    val right = Seq(
      (1L, 100L, 1L, "r_at_100_t1"), (1L, 100L, 2L, "r_at_100_t2"), // tie on ts
      (1L, 150L, 3L, "r_at_150"), (1L, 300L, 4L, "r_future"),
      (2L, 500L, 5L, "r2_future")
    ).toDF("k", "ts", "tie", "pv")
    val got = execAsof(left, right)
      .select("k", "lv", "pv").as[(Long, String, String)].collect().toSet
    assert(got == Set(
      (1L, "a", "r_at_100_t2"), // inclusive at equal ts; max tie wins
      (1L, "b", "r_at_150"),    // latest at-or-before, not just any earlier
      (1L, "c", null),          // before every right row
      (2L, "d", null),          // only future right rows
      (3L, "e", null)))         // no right rows for the key
  }

  test("forward direction: earliest at-or-after per key, ties -> min tiebreak, tolerance nulls out") {
    val left = Seq(
      (1L, 100L, "a"), (1L, 100L, "a2"), // same (key, ts): both match the same head
      (1L, 400L, "b"),                   // only past right rows -> null
      (2L, 100L, "c")                    // match at distance 150, killed by tolerance
    ).toDF("k", "ts", "lv")
    val right = Seq(
      (1L, 50L, 1L, "r_past"),
      (1L, 100L, 2L, "r_at_100_t2"), (1L, 100L, 3L, "r_at_100_t3"), // tie on ts
      (1L, 300L, 4L, "r_at_300"),
      (2L, 250L, 5L, "r2_at_250")
    ).toDF("k", "ts", "tie", "pv")
    val got = AsofJoin
      .asofJoinExec(left, right, "k", "ts", "tie", Seq("pv"), "forward",
        toleranceNs = Some(100L))
      .select("k", "lv", "pv").as[(Long, String, String)].collect().toSet
    assert(got == Set(
      (1L, "a", "r_at_100_t2"),  // inclusive at equal ts; MIN tie wins forward
      (1L, "a2", "r_at_100_t2"),
      (1L, "b", null),           // nothing at-or-after
      (2L, "c", null)))          // 250-100 > tolerance 100
  }

  test("nearest direction: closer of backward/forward, equal distance -> backward") {
    val left = Seq(
      (1L, 100L, "back_closer"),  // back at 90 (d=10) vs fwd at 150 (d=50)
      (1L, 200L, "fwd_closer"),   // back at 150 (d=50) vs fwd at 210 (d=10)
      (1L, 180L, "tie_backward"), // back at 150 (d=30) vs fwd at 210 (d=30) -> backward
      (2L, 500L, "only_back"),
      (3L, 500L, "none")
    ).toDF("k", "ts", "lv")
    val right = Seq(
      (1L, 90L, 1L, "r_90"), (1L, 150L, 2L, "r_150"), (1L, 210L, 3L, "r_210"),
      (2L, 10L, 4L, "r2_10")
    ).toDF("k", "ts", "tie", "pv")
    val got = AsofJoin
      .asofJoinExec(left, right, "k", "ts", "tie", Seq("pv"), "nearest")
      .select("k", "lv", "pv").as[(Long, String, String)].collect().toSet
    assert(got == Set(
      (1L, "back_closer", "r_90"),
      (1L, "fwd_closer", "r_210"),
      (1L, "tie_backward", "r_150"), // the documented fixed tie rule
      (2L, "only_back", "r2_10"),
      (3L, "none", null)))
  }

  test("backward tolerance: stale matches become null payload, rows survive") {
    val left = Seq((1L, 100L, "fresh"), (1L, 1000L, "stale")).toDF("k", "ts", "lv")
    val right = Seq((1L, 80L, 1L, "r_80")).toDF("k", "ts", "tie", "pv")
    val got = AsofJoin
      .asofJoinExec(left, right, "k", "ts", "tie", Seq("pv"), "backward",
        toleranceNs = Some(50L))
      .select("k", "lv", "pv").as[(Long, String, String)].collect().toSet
    assert(got == Set((1L, "fresh", "r_80"), (1L, "stale", null)))
  }

  test("plan shape: AsofJoinExec with one exchange + one local sort per side, no WindowExec") {
    val left = (1 to 500).map(i => ((i % 7).toLong, i.toLong * 10, i.toLong))
      .toDF("k", "ts", "lv")
    val right = (1 to 300).map(i => ((i % 5).toLong, i.toLong * 13, i.toLong))
      .toDF("k", "ts", "tie").withColumn("pv", col("tie") * 2)
    // AQE wraps stages as leaf nodes (collect can't descend), so pin the
    // static shape with AQE off here; execution UNDER AQE (including
    // consistent two-sided AQEShuffleRead coalescing) is exercised by the
    // other tests in this suite, which run with the session default.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // force the shuffled merge: at test scale the stats check would
      // (correctly) broadcast this right side — that path has its own pin
      val df = AsofJoin.asofJoinExec(left, right, "k", "ts", "tie", Seq("pv"),
        broadcast = Some(false))
      assert(df.collect().length == 500) // exactly one output row per left row
      val plan = df.queryExecution.executedPlan
      assert(plan.collectWithSubqueries { case e: AsofJoinExec => e }.nonEmpty,
        s"expected AsofJoinExec in:\n$plan")
      assert(plan.collectWithSubqueries { case w: WindowExec => w }.isEmpty,
        s"merge exec must not plan a window:\n$plan")
      val shuffles = plan.collectWithSubqueries { case s: ShuffleExchangeExec => s }
      assert(shuffles.size == 2, s"expected 2 exchanges (one per side), got ${shuffles.size}")
      val sorts = plan.collectWithSubqueries { case s: SortExec => s }
      assert(sorts.size == 2 && sorts.forall(!_.global),
        s"expected 2 LOCAL sorts, got ${sorts.map(s => s"global=${s.global}")}")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("broadcast ≡ shuffled merge for all three directions on real events") {
    val ev = Tables.events(spark, sf0001)
    val facts = ev.where(col("event_type") =!= "signup")
      .select(col("user_id"), col("ts"), col("event_id"))
    val dim = ev.where(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_id").as("dim_id"), col("value").as("dim_value"))
    for (dirn <- Seq("backward", "forward", "nearest");
         tol <- Seq(None, Some(24L * 3600L * 1000000000L))) {
      val shuffled = AsofJoin.asofJoinExec(facts, dim, "user_id", "ts",
        "event_id", Seq("dim_id", "dim_value"), dirn, tol, Some(false))
      val bcast = AsofJoin.asofJoinExec(facts, dim, "user_id", "ts",
        "event_id", Seq("dim_id", "dim_value"), dirn, tol, Some(true))
      assert(bcast.exceptAll(shuffled).count() == 0 &&
        shuffled.exceptAll(bcast).count() == 0,
        s"broadcast/shuffled divergence for direction=$dirn tol=$tol")
    }
  }

  test("broadcast plan: stats pick BroadcastAsofJoinExec, fact side has zero exchange and zero sort") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val left = (1 to 2000).map(i => ((i % 40).toLong, i.toLong * 7, i.toLong))
        .toDF("k", "ts", "lv")
      val dim = (1 to 80).map(i => ((i % 40).toLong, i.toLong * 100, i.toLong))
        .toDF("k", "ts", "tie").withColumn("pv", col("tie") * 10)
      // auto (no hint): tiny dimension stats -> broadcast form
      val auto = AsofJoin.asofJoinExec(left, dim, "k", "ts", "tie", Seq("pv"))
      assert(auto.collect().length == 2000)
      val plan = auto.queryExecution.executedPlan
      assert(plan.collectWithSubqueries { case e: BroadcastAsofJoinExec => e }.nonEmpty,
        s"expected BroadcastAsofJoinExec in:\n$plan")
      assert(plan.collectWithSubqueries { case s: ShuffleExchangeExec => s }.isEmpty,
        s"broadcast as-of must not shuffle either side:\n$plan")
      assert(plan.collectWithSubqueries { case s: SortExec => s }.isEmpty,
        s"broadcast as-of must not sort the fact side:\n$plan")
      // threshold off: the same call degrades to the shuffled merge
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val deg = AsofJoin.asofJoinExec(left, dim, "k", "ts", "tie", Seq("pv"))
        assert(deg.queryExecution.executedPlan
          .collectWithSubqueries { case e: AsofJoinExec => e }.nonEmpty,
          "threshold -1 must fall back to the shuffled merge exec")
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("parity with the composed union+window asofJoin on real events (self-as-of)") {
    val ev = Tables.events(spark, sf0001)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    def clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_id").as("click_id"), col("value").as("click_value"))
    val composed = Relational
      .asofJoin(purchases, clicks, "user_id", "ts", "event_id",
        Seq("click_id", "click_value"))
      .select("event_id", "user_id", "click_id", "click_value")
    val exec = AsofJoin
      .asofJoinExec(purchases, clicks, "user_id", "ts", "event_id",
        Seq("click_id", "click_value"))
      .select("event_id", "user_id", "click_id", "click_value")
    assert(exec.count() == purchases.count())
    assert(exec.exceptAll(composed).count() == 0)
    assert(composed.exceptAll(exec).count() == 0)
  }

  test("chained execs reuse the fact-side exchange: asof -> interval -> agg = 3 shuffles total") {
    // the ext_temporal_pipeline shape: because AsofJoinExec DECLARES
    // outputPartitioning = left partitioning, the downstream
    // IntervalJoinExec's ClusteredDistribution(user_id) and the final
    // per-user aggregate are both already satisfied — the purchase side
    // shuffles ONCE for the whole 3-operator chain (purchases + clicks
    // + views = 3 exchanges, nothing else)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = graft.queries.ExtQueries.queries
        .find(_.name == "ext_temporal_pipeline").get.fn(spark, sf0001)
      assert(df.count() > 0)
      val shuffles = df.queryExecution.executedPlan.collectWithSubqueries {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
      }
      assert(shuffles.size == 3,
        s"asof->interval->agg must reuse the fact-side exchange, got ${shuffles.size}:\n${df.queryExecution.executedPlan}")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("builder contract: LongType ts enforced, payload/left collisions rejected") {
    val l = Seq((1L, 100L, "x")).toDF("k", "ts", "lv")
    val rBadTs = Seq((1L, "2024-01-01", 1L, "p")).toDF("k", "ts", "tie", "pv")
    val eTs = intercept[IllegalArgumentException] {
      AsofJoin.asofJoinExec(l, rBadTs, "k", "ts", "tie", Seq("pv"))
    }
    assert(eTs.getMessage.contains("LongType"))
    val rCollide = Seq((1L, 90L, 1L, "p")).toDF("k", "ts", "tie", "lv")
    val eCol = intercept[IllegalArgumentException] {
      AsofJoin.asofJoinExec(l, rCollide, "k", "ts", "tie", Seq("lv"))
    }
    assert(eCol.getMessage.contains("collide"))
  }
}
