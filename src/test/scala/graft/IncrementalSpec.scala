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
}
