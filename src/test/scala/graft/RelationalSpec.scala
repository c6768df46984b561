package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Literal-frame unit tests for the pandas-semantics bridges (SURVEY §7.1
  * gaps G1/G2/G6/G7) — the null/duplicate edge cases the star-schema
  * testdata doesn't exercise.
  */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("groupCount drops null keys like pandas groupby (G2)") {
    val df = Seq(Some(1L), Some(1L), None, Some(2L)).toDF("k")
    val got = Relational.groupCount(df, "k", "n")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 1L))
  }

  test("latestPerKey keeps ties (dense_rank fan-out, dm:65-67)") {
    val df = Seq((1L, 10L, "a"), (1L, 10L, "b"), (1L, 5L, "c"), (2L, 7L, "d"))
      .toDF("k", "ord", "v")
    val got = Relational.latestPerKey(df, "k", "ord")
      .select("v").as[String].collect().toSet
    assert(got == Set("a", "b", "d"))
  }

  test("dedupeByKey is deterministic: keeps min tiebreak (G6)") {
    val df = Seq((1L, 30L), (1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "tb")
    val got = Relational.dedupeByKey(df, "k", "tb")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 10L, 2L -> 5L))
  }

  test("neqNullPasses: NULL passes != like numpy NaN (G1)") {
    val df = Seq(Some(" "), Some("x"), None).toDF("c")
    val got = df.where(Relational.neqNullPasses(col("c"), " "))
      .collect().map(r => Option(r.getString(0))).toSet
    assert(got == Set(Some("x"), None))
  }

  test("semiFlag: 0/1 indicator, no fan-out on duplicated right keys") {
    val left = Seq(1L, 2L, 3L).toDF("id")
    val right = Seq(1L, 1L, 1L, 3L).toDF("rid") // dup keys must not fan out
    val got = Relational.semiFlag(left, "id", right, "rid", "f")
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 1, 2L -> 0, 3L -> 1))
  }

  test("rangeFlag: null -> 0 like numpy chained comparison (dm:182)") {
    val df = Seq(Some(175L), Some(10L), None).toDF("st")
    val got = df.select(Relational.rangeFlag(col("st"), 174, 178).as("f"))
      .as[Int].collect().toSeq
    assert(got == Seq(1, 0, 0))
  }

  test("zValue: hand-checked interleave; buckets are axis-aligned rectangles") {
    import graft.operators.Layout
    // a=3 (011), b=5 (101): bits -> 1 + 2 + 4 + 32 = 39
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L)).toDF("a", "b")
      .select(Layout.zValue("a", "b").as("z")).as[Long].collect().toSeq
    assert(got == Seq(0L, 1L, 2L, 39L))
    // the defining property on real data: fixing z's bits above 2k (the
    // 2^10 bucket) confines EACH dim to one aligned 2^5-value window
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
    val audit = Layout.zOrderAudit(ev, "user_id", "day").collect()
    assert(audit.nonEmpty)
    audit.foreach { r =>
      val (aMin, aMax) = (r.getLong(2), r.getLong(3))
      val (bMin, bMax) = (r.getLong(4), r.getLong(5))
      assert(aMin / 32 == aMax / 32 && bMin / 32 == bMax / 32,
        s"bucket ${r.getLong(0)} is not an aligned 32x32 rectangle: " +
          s"a [$aMin,$aMax] b [$bMin,$bMax]")
    }
    // zValue itself is a zero-exchange projection
    val plan = ev.select(Layout.zValue("user_id", "day"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("withHilbert: a true Hilbert curve — bijection + unit-step adjacency on the full grid") {
    import graft.operators.Layout
    // every (x, y) of the 8x8 grid (bits = 3)
    val grid = (for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y))
      .toDF("a", "b")
    val got = Layout.withHilbert(grid, "a", "b", bits = 3)
      .select("hv", "a", "b").as[(Long, Long, Long)].collect()
    // bijection onto [0, 64)
    assert(got.map(_._1).sorted.toSeq == (0L until 64L))
    // THE Hilbert property Morton lacks: consecutive curve values are
    // always Manhattan-distance-1 grid neighbors
    val byD = got.map(r => r._1 -> (r._2, r._3)).toMap
    (0L until 63L).foreach { d =>
      val (x1, y1) = byD(d)
      val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"d=$d: ($x1,$y1) -> ($x2,$y2) is not a unit step")
    }
    // curve start pinned (canonical orientation)
    assert(byD(0L) == (0L, 0L))
    // zero-exchange projection, like zValue
    val plan = Layout.withHilbert(grid, "a", "b", bits = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("zoneManifest: both layouts conserve rows; skippable ≡ stats-rectangle miss") {
    import graft.operators.Layout
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
    val n = ev.count()
    val d0 = ev.agg(min("day")).as[Long].head()
    val rows = Layout.zoneManifest(ev, "user_id", "day", 16, 1024L, 4L, 2L, 5L, 8L)
      .as[(String, Long, Long, Long, Long, Long, Long, Boolean)].collect()
    // every row lands in exactly one file under EACH layout
    Seq("zorder", "natural").foreach { l =>
      assert(rows.filter(_._1 == l).map(_._3).sum == n, s"layout $l drops rows")
    }
    // the flag is exactly the rectangle miss recomputed from the stats
    rows.foreach { case (_, fid, _, aMin, aMax, bMin, bMax, skip) =>
      val expect = aMax < 2 || aMin > 5 || bMin > d0 + 7 || bMax < d0
      assert(skip == expect, s"file $fid flag $skip != $expect")
    }
    // natural files bound day only: each spans one 4-day window
    rows.filter(_._1 == "natural").foreach { case (_, fid, _, _, _, bMin, bMax, _) =>
      assert(bMin / 4 == fid && bMax / 4 == fid)
    }
  }

  test("shardAudit: total mass conserved, ratios average to 1, content-addressed") {
    import graft.operators.Layout
    val docs = Tables.documents(spark, sf0001)
    val n = docs.count()
    val mass = docs.agg(sum("n_chars")).as[Long].head()
    val audit = Layout.shardAudit(docs, "text", "n_chars", 16)
      .as[(Long, Long, Long, Double, Double)].collect()
    // every document lands in exactly one shard; nothing dropped
    assert(audit.map(_._2).sum == n && audit.map(_._3).sum == mass)
    assert(audit.forall(r => r._1 >= 0 && r._1 < 16))
    // balance ratios are normalized: they average to 1 over the shards
    // (weighted by the shard count actually present)
    val avgDoc = audit.map(_._4).sum / audit.length
    assert(math.abs(avgDoc - 1.0) < 0.01, s"doc_balance avg $avgDoc")
    // content-addressed: an exact duplicate text maps to the same shard
    // as its original, no matter its id
    val dup = docs.limit(1).withColumn("doc_id", col("doc_id") + 1000000L)
    val two = Layout.shardAudit(docs.limit(1).union(dup), "text", "n_chars", 16)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(two.length == 1 && two.head._2 == 2L)
  }

  test("compactionPlan: hand-checked next-fit bins; spans contiguous; mass conserved") {
    import graft.operators.Layout
    val docs = Seq(
      ("a", "x", 5L), ("a", "x", 5L), // cell a/x mass 10 -> fills bin 0 exactly
      ("a", "y", 12L),                // oversize cell: overflows its own bin 1
      ("b", "x", 3L), ("b", "y", 4L), ("c", "x", 2L)) // tail -> bin 2, underfull
      .toDF("source", "lang", "n_chars")
    val plan = Layout.compactionPlan(docs, Seq("source", "lang"),
        col("n_chars"), 10L)
      .orderBy("bin")
      .as[(Long, String, String, Long, Long, Long, Double)].collect()
    assert(plan.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(plan(0) == ((0L, "a/x", "a/x", 1L, 2L, 10L, 1.0)))
    assert(plan(1) == ((1L, "a/y", "a/y", 1L, 1L, 12L, 1.2)))
    assert(plan(2) == ((2L, "b/x", "c/x", 3L, 3L, 9L, 0.9)))
    // conservation + contiguity on real data
    val real = Tables.documents(spark, sf0001)
    val rp = Layout.compactionPlan(real, Seq("source", "lang"),
        col("n_chars"), 5000L)
      .orderBy("bin")
      .as[(Long, String, String, Long, Long, Long, Double)].collect()
    assert(rp.map(_._5).sum == real.count())
    assert(rp.map(_._6).sum == real.agg(sum("n_chars")).as[Long].head())
    // bins are consecutive integers from 0 and spans chain: each bin's
    // first cell follows the previous bin's last in (source,lang) order
    assert(rp.map(_._1).toSeq == rp.indices.map(_.toLong))
    rp.sliding(2).foreach {
      case Array(p, q) => assert(p._3 <= q._2)
      case _ =>
    }
  }
}
