package graft

import graft.operators.Incremental
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: the whole point is the monoid law
  * merge(state(A), state(B)) == state(A ∪ B) for ANY split — asserted
  * against real fixture data over several unrelated split predicates,
  * plus identity/edge behavior on crafted states.
  */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def ev = Tables.events(spark, sf0001)

  test("merge of any split ≡ full recompute (monoid law on fixture data)") {
    val full = Incremental.eventState(ev)
    for (m <- Seq(2L, 3L, 7L)) {
      val a = Incremental.eventState(ev.where(col("event_id") % m === 0))
      val b = Incremental.eventState(ev.where(col("event_id") % m =!= 0))
      val merged = Incremental.mergeStates(a, b)
      assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty,
        s"split by event_id % $m diverged from the full recompute")
    }
  }

  test("three-way split re-merges associatively") {
    val parts = (0L to 2L).map(i =>
      Incremental.eventState(ev.where(col("event_id") % 3 === i)))
    val leftFold = Incremental.mergeStates(
      Incremental.mergeStates(parts(0), parts(1)), parts(2))
    val rightFold = Incremental.mergeStates(
      parts(0), Incremental.mergeStates(parts(1), parts(2)))
    assert(leftFold.exceptAll(rightFold).isEmpty &&
      rightFold.exceptAll(leftFold).isEmpty)
  }

  test("disjoint keys pass through via identity elements") {
    val a = Seq((1L, 2L, 100L, 60L))
      .toDF("user_id", "n_events", "total_cents", "max_cents")
    val b = Seq((2L, 1L, 50L, 50L))
      .toDF("user_id", "n_events", "total_cents", "max_cents")
    val got = Incremental.mergeStates(a, b)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 100L, 60L), (2L, 1L, 50L, 50L)))
  }

  test("overlapping key combines; derived avg computed from merged state") {
    val a = Seq((7L, 2L, 100L, 60L))
      .toDF("user_id", "n_events", "total_cents", "max_cents")
    val b = Seq((7L, 1L, 50L, 50L))
      .toDF("user_id", "n_events", "total_cents", "max_cents")
    val got = Incremental.withDerived(Incremental.mergeStates(a, b))
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got == Set((7L, 3L, 150L, 60L, 0.5))) // 150 cents / 3 events
  }

  test("topK: any split merges to the one-shot cut; three-way fold associative") {
    val k = 5
    val full = Incremental.topKState(ev, k)
    for (m <- Seq(2L, 3L)) {
      val merged = Incremental.mergeTopK(
        Incremental.topKState(ev.where(col("event_id") % m === 0), k),
        Incremental.topKState(ev.where(col("event_id") % m =!= 0), k), k)
      assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty,
        s"top-$k split by event_id % $m diverged from the one-shot cut")
    }
    val parts = (0L to 2L).map(i =>
      Incremental.topKState(ev.where(col("event_id") % 3 === i), k))
    val lf = Incremental.mergeTopK(
      Incremental.mergeTopK(parts(0), parts(1), k), parts(2), k)
    val rf = Incremental.mergeTopK(
      parts(0), Incremental.mergeTopK(parts(1), parts(2), k), k)
    assert(lf.exceptAll(rf).isEmpty && rf.exceptAll(lf).isEmpty)
  }

  test("topK precondition: ACCUMULATING scores are not mergeable (counterexample)") {
    // whale w has one 100-cent purchase per batch; user u has 60+60 split
    // across batches. Per-batch top-1 of user TOTALS keeps w both times
    // (60 < 100), but the true union total ranks u (120) above w (100+100
    // is wrong too — w totals 200; make w batch-local): w1/w2 are
    // DIFFERENT whales, so each batch's top-1 is a whale, yet u's union
    // total (120) beats each whale's 100.
    val b1 = Seq(("purchase", 1L, 1.00, 10L), ("purchase", 2L, 0.60, 77L))
      .toDF("event_type", "event_id", "value", "user_id")
    val b2 = Seq(("purchase", 3L, 1.00, 11L), ("purchase", 4L, 0.60, 77L))
      .toDF("event_type", "event_id", "value", "user_id")
    def userTotals(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("event_type", "user_id")
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
        .withColumnRenamed("user_id", "event_id") // reuse the (score,id) cut
    val naive = Incremental.mergeTopK(
      Incremental.topKCut(userTotals(b1), 1),
      Incremental.topKCut(userTotals(b2), 1), 1)
      .select("event_id").as[Long].collect().toSet
    val truth = Incremental.topKCut(userTotals(b1.unionByName(b2)), 1)
      .select("event_id").as[Long].collect().toSet
    assert(truth == Set(77L), "union totals rank u first")
    assert(naive != truth,
      "per-batch top-k of accumulating totals MUST miss u — the documented " +
        "precondition; the correct incremental form is eventState + final cut")
    // and the correct incremental form gets it right
    val viaState = Incremental.topKCut(
      Incremental.mergeStates(
        Incremental.eventState(b1), Incremental.eventState(b2))
        .select(lit("purchase").as("event_type"),
          col("user_id").as("event_id"), col("total_cents").as("cents")), 1)
      .select("event_id").as[Long].collect().toSet
    assert(viaState == Set(77L))
  }
}
