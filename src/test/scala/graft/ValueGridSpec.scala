package graft

import org.apache.spark.sql.functions._
import graft.operators.ValueGrid

/** The ValueGrid coarsening knob: on an ADVERSARIAL near-unique revenue
  * distribution (every user a distinct cent total — the case where the
  * distinct-value rank frame degenerates to the user universe and the
  * single-partition value window becomes the 100 TB straggler), the
  * grid must bound the ordered frame while keeping the semantics the
  * quantile/Pareto family promises.
  */
class ValueGridSpec extends SparkSpec {
  import spark.implicits._

  private val NUsers = 1000
  // near-unique: 1000 users, 1000 distinct cent totals (10000 + 7i)
  private lazy val uv = (0 until NUsers)
    .map(i => (i.toLong, 10000L + 7L * i))
    .toDF("user_id", "cents")

  test("snap bounds the distinct-value frame on near-unique values; step=1 is the identity") {
    assert(uv.select("cents").distinct().count() == NUsers)
    val step = 500L
    val snapped = uv.select(ValueGrid.snap(col("cents"), step).as("vg"))
      .distinct().collect().map(_.getLong(0))
    // range is 7·999 ≈ 6993 cents -> at most range/step + 1 = 15 cells,
    // vs 1000 rows without the grid — THE bounded frame the knob buys
    assert(snapped.length <= 6993 / step + 1,
      s"grid frame has ${snapped.length} cells")
    assert(snapped.forall(_ % step == 0), "cells must sit on the grid")
    // identity at step <= 1
    val id = uv.select(ValueGrid.snap(col("cents"), 1L).as("v")).collect()
    assert(id.map(_.getLong(0)).sorted.sameElements(
      uv.collect().map(_.getLong(1)).sorted))
  }

  test("quantileScores: tie-coherent at step=1; grid cells share scores and stay monotone") {
    val base = uv.crossJoin(broadcast(uv.agg(count(lit(1)).as("n_users"))))
    // exact (step=1) scores: distinct values -> score = 4*rank_before/n + 1
    val exact = base
      .withColumn("__k_cents", ValueGrid.snap(col("cents"), 1L))
      .join(broadcast(ValueGrid.quantileScores(base, "cents", 4, asc = false, 1L)),
        Seq("__k_cents"))
      .select("user_id", "cents", "cents_score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // all-distinct values desc: user with i-th largest cents has
    // cb = i, score = 4i div 1000 + 1 -> exactly 250 users per quartile
    val perScore = exact.groupBy(_._3).view.mapValues(_.size).toMap
    assert(perScore == Map(1L -> 250, 2L -> 250, 3L -> 250, 4L -> 250))
    // larger cents -> better (smaller) score, strictly tie-coherent
    val byCents = exact.sortBy(-_._2).map(_._3)
    assert(byCents.zip(byCents.tail).forall { case (a, b) => a <= b })

    val step = 500L
    val grid = base
      .withColumn("__k_cents", ValueGrid.snap(col("cents"), step))
      .join(broadcast(ValueGrid.quantileScores(base, "cents", 4, asc = false, step)),
        Seq("__k_cents"))
      .select("user_id", "cents", "cents_score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(grid.size == NUsers, "every user must receive a score")
    assert(grid.forall(r => r._3 >= 1 && r._3 <= 4))
    // users inside one grid cell are interchangeable: same cell -> same score
    val cellScores = grid.groupBy(r => r._2 - (r._2 % step)).values
    assert(cellScores.forall(_.map(_._3).distinct.size == 1))
    // monotone across cells too
    val gByCents = grid.sortBy(-_._2).map(_._3)
    assert(gByCents.zip(gByCents.tail).forall { case (a, b) => a <= b })
    // and the coarse score never drifts more than one quartile from exact
    // (cell width 500 spans at most ~72 of the 1000 ranks here)
    val exactByUser = exact.map(r => r._1 -> r._3).toMap
    assert(grid.forall(r => math.abs(r._3 - exactByUser(r._1)) <= 1))
  }

  test("paretoShares: step=1 is exact; grid keeps true totals and near-exact shares") {
    val ks = Seq(1, 5, 10, 25, 50)
    val exact = ValueGrid.paretoShares(uv, ks, 1L)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).sortBy(_._1)
    val totalCents = (0 until NUsers).map(i => 10000L + 7L * i).sum
    assert(exact.forall(_._4 == totalCents))
    // all-distinct values: top-k% = the k% largest cents exactly
    val sortedDesc = (0 until NUsers).map(i => 10000L + 7L * i).sorted.reverse
    ks.zip(exact).foreach { case (k, row) =>
      val nTop = NUsers * k / 100
      assert(row._2 == nTop)
      assert(row._3 == sortedDesc.take(nTop).sum,
        s"k=$k exact top revenue mismatch")
    }

    val grid = ValueGrid.paretoShares(uv, ks, 500L)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).sortBy(_._1)
    // totals are TRUE sums — the grid coarsens only the ordering
    assert(grid.forall(_._4 == totalCents))
    assert(grid.map(_._2).sameElements(exact.map(_._2)))
    // shares stay within one cell's mass of exact and monotone in k
    grid.zip(exact).foreach { case (g, e) =>
      assert(math.abs(g._5 - e._5) < 0.01,
        s"k=${g._1}: grid share ${g._5} vs exact ${e._5}")
    }
    val shares = grid.map(_._5)
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
  }
}
