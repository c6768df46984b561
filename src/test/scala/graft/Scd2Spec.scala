package graft

import graft.operators.Scd2
import graft.queries.RefQueries
import org.apache.spark.sql.functions._

/** SCD2 operator unit tests (keyed-upsert / anti-insert / change-detect,
  * SURVEY G5 canonicalization) plus end-to-end invariants of the flagship
  * delta on sf0.001.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  test("keyedUpsert: source value wins when present, else target kept") {
    val target = Seq((1L, "a", "OLD"), (2L, "b", "KEEP")).toDF("id", "name", "seg")
    val source = Seq((1L, "NEW")).toDF("id", "seg_new")
    val got = Scd2.keyedUpsert(target, source, Seq("id"), Map("seg" -> "seg_new"))
      .select("id", "seg").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "NEW", 2L -> "KEEP"))
  }

  test("antiInsert: keeps only keys absent from target") {
    val src = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "v")
    val tgt = Seq(2L).toDF("id")
    val got = Scd2.antiInsert(src, tgt, Seq("id")).select("id")
      .as[Long].collect().toSet
    assert(got == Set(1L, 3L))
  }

  test("changedRows: multiset difference on compared columns") {
    val oldS = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val newS = Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "v")
    val got = Scd2.changedRows(newS, oldS, Seq("id", "v"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((2L, "B"), (3L, "c")))
  }

  test("asOf: crafted history resolves to exactly one version per key at any T") {
    import spark.implicits._
    // key 1: v1 [10, 20), v2 [20, null); key 2: v1 [15, null)
    val hist = Seq(
      (1L, "v1", Some(10L), Some(20L)),
      (1L, "v2", Some(20L), None),
      (2L, "v1", Some(15L), None)
    ).toDF("k", "v", "from_ts", "to_ts")
    def at(t: Long) = graft.operators.Scd2
      .asOf(hist, "from_ts", "to_ts", lit(t))
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(at(5L) == Set.empty)                           // before history
    assert(at(12L) == Set((1L, "v1")))                    // only key 1 alive
    assert(at(17L) == Set((1L, "v1"), (2L, "v1")))        // mixed versions
    assert(at(20L) == Set((1L, "v2"), (2L, "v1")))        // boundary: successor wins
    assert(at(99L) == Set((1L, "v2"), (2L, "v1")))        // open rows persist
    // never more than one row per key, at every probe point
    for (t <- Seq(5L, 12L, 17L, 20L, 99L))
      assert(at(t).groupBy(_._1).values.forall(_.size == 1))
  }

  test("flagship delta invariants: expired/new pairs per changed key") {
    val delta = RefQueries.q17(spark, sf0001).cache()
    assert(delta.count() > 0)
    // every changed key contributes exactly one expired + one new-current row
    val perKey = delta.groupBy("cust_id")
      .agg(sum(col("is_current_record")).as("cur"), count(lit(1)).as("n"))
    assert(perKey.where(col("cur") =!= 1 || col("n") =!= 2).count() == 0)
    // new-current rows have open effective_to_date; expired rows closed
    assert(delta.where(col("is_current_record") === 1 &&
      col("effective_to_date").isNotNull).count() == 0)
    assert(delta.where(col("is_current_record") === 0 &&
      col("effective_to_date").isNull).count() == 0)
    delta.unpersist()
  }
}
