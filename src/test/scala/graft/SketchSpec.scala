package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Deterministic-sketch invariants on crafted frames where the exact
  * answers (and in the collision-free regimes, the sketch answers too)
  * are known by hand.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("HLL++ windowed distinct stays within its error contract vs exact") {
    // the engine-specific flavor the ext_stream_approx gate replaced
    // (registered output now estimates via the engine-independent
    // lincount sketch): HLL++ register values can never value-match
    // another engine, so its accuracy contract is asserted HERE —
    // |hll − exact| ≤ max(2, 15% · exact) on every tumbling window
    // (rsd 0.05 default, 3σ)
    val wNs = graft.streaming.EventsStream.WindowSeconds * 1000000000L
    val agg = Tables.events(spark, sf0001)
      .withColumn("window_start", expr(s"ts div $wNs"))
      .groupBy("window_start", "event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"),
        approx_count_distinct(col("user_id")).as("n_hll"))
    assert(agg.count() > 0)
    val bad = agg.where(abs(col("n_hll") - col("n_exact")) >
      greatest(lit(2.0), col("n_exact") * 0.15)).count()
    assert(bad == 0, "HLL++ outside its error contract")
  }

  test("linearCountDistinct: exact counts, occupancy bound, closed-form estimate") {
    val rows = (1L to 300L).map(k => ("g1", k)) ++
      (1L to 5L).map(k => ("g2", k * 1000L)) ++
      (1L to 5L).map(k => ("g2", k * 1000L)) // duplicates collapse
    val got = Sketches.linearCountDistinct(
        rows.toDF("grp", "k"), "k", "grp", buckets = 1024)
      .collect().map(r => r.getString(0) -> r).toMap

    val g1 = got("g1")
    assert(g1.getLong(1) == 300L)                 // n_exact
    val m1 = g1.getLong(2)                        // n_occupied
    assert(m1 <= 300L && m1 > 0L)
    val expectedEst =
      BigDecimal(1024.0 * math.log(1024.0 / (1024.0 - m1)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(g1.getDouble(3) == expectedEst)        // est matches closed form
    assert(math.abs(g1.getDouble(3) - 300.0) / 300.0 < 0.25) // sane accuracy

    val g2 = got("g2")
    assert(g2.getLong(1) == 5L)
    // 5 keys into 1024 buckets: collision-free with this hash fixture
    assert(g2.getLong(2) == 5L)
  }

  test("linearCountDistinct: saturated bitmap yields NULL estimate") {
    val rows = (1L to 64L).map(k => ("g", k))
    // 2 buckets, 64 keys: both buckets occupied -> est must be NULL,
    // never a division by zero or an Infinity leaking through round()
    val r = Sketches.linearCountDistinct(rows.toDF("grp", "k"), "k", "grp", 2)
      .collect().head
    assert(r.getLong(1) == 64L && r.getLong(2) == 2L)
    assert(r.isNullAt(3) && r.isNullAt(4))
  }

  test("countMinAudit: estimates are exact in a collision-free grid") {
    val docs = Seq(
      (1L, "a a a b b c"),
      (2L, "a b c d")
    ).toDF("doc_id", "text")
    // width 4096 >> 9 distinct hash targets: no collisions, so every
    // row of the sketch holds the true count and overcount == 0
    val got = Sketches.countMinAudit(docs, "doc_id", "text",
        width = 4096, depth = 3, topK = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 4)
    val byWord = got.map(t => t._1 -> t._2).toMap
    assert(byWord == Map("a" -> 4L, "b" -> 3L, "c" -> 2L, "d" -> 1L))
    assert(got.forall(t => t._3 == t._2 && t._4 == 0L))
  }

  test("histogramQuantiles: hand-computed grid estimate on 1..100") {
    val rows = (1 to 100).map(v => ("g", v.toDouble)).toDF("grp", "v")
    val got = Sketches.histogramQuantiles(rows, "v", "grp",
        bins = 10, qs = Seq(0.5))
      .collect().head
    // lo=1, hi=100, w=9.9; the 50th value (=50) sits in bin
    // floor(49/9.9)=4, and cum(bin 4)=50 >= ceil(0.5*100) -> qbin=4;
    // est = 1 + 4.5*9.9 = 45.55; exact interpolated P50 = 50.5
    assert(got.getAs[Double]("est") == 45.55)
    assert(got.getAs[Double]("exact") == 50.5)
    assert(got.getAs[Double]("abs_err") == 4.95)
  }

  test("histogramQuantiles: degenerate single-value group (hi == lo)") {
    val rows = Seq(("g", 7.0), ("g", 7.0), ("g", 7.0)).toDF("grp", "v")
    val got = Sketches.histogramQuantiles(rows, "v", "grp", 10, Seq(0.5, 0.99))
      .collect()
    assert(got.length == 2)
    // every value in bin 0 of a zero-width grid: est = lo + 0.5*0 = 7
    assert(got.forall(r => r.getAs[Double]("est") == 7.0))
    assert(got.forall(r => r.getAs[Double]("exact") == 7.0))
    assert(got.forall(r => r.getAs[Double]("abs_err") == 0.0))
  }

  test("countMinAudit: overcount is non-negative under forced collisions") {
    val docs = Seq(
      (1L, (1 to 40).map(i => s"w$i").mkString(" ")),
      (2L, "w1 w1 w1 w2 w2 w3")
    ).toDF("doc_id", "text")
    // width 4: heavy collisions guaranteed; CMS may only OVERcount
    val got = Sketches.countMinAudit(docs, "doc_id", "text",
        width = 4, depth = 3, topK = 10)
      .collect()
    assert(got.nonEmpty)
    assert(got.forall(r => r.getLong(2) >= r.getLong(1))) // n_est >= n_exact
    assert(got.forall(r => r.getLong(3) == r.getLong(2) - r.getLong(1)))
  }

  test("joinSizeAudit: exact in a collision-free grid, overcount >= 0 under collisions") {
    // keys 1..6: A-side counts 2 each for 1..4; B-side counts 3 each for
    // 3..6 -> exact join size = keys {3,4} x 2*3 = 12
    val rows =
      (1L to 4L).flatMap(k => Seq.fill(2)((k, "a"))) ++
      (3L to 6L).flatMap(k => Seq.fill(3)((k, "b")))
    val df = rows.toDF("k", "side")
    val wide = Sketches.joinSizeAudit(df, "k",
      col("side") === "a", col("side") === "b", width = 4096, depth = 3)
      .collect().head
    assert(wide.getLong(0) == 12L) // n_exact
    // 6 keys into width 4096: collision-free -> inner product is exact
    assert(wide.getLong(1) == 12L && wide.getLong(2) == 0L)

    // width 2: forced collisions -> the estimate may only OVERcount
    val tight = Sketches.joinSizeAudit(df, "k",
      col("side") === "a", col("side") === "b", width = 2, depth = 3)
      .collect().head
    assert(tight.getLong(0) == 12L)
    assert(tight.getLong(1) >= 12L && tight.getLong(2) == tight.getLong(1) - 12L)

    // Disjoint grids (one side empty -> the per-row inner-product join is
    // empty for EVERY depth row): the depth spine must coalesce each row's
    // estimate to 0 — one result row, n_est = 0, overcount = 0 — not a NULL
    // n_est (and not a 0-row divergence against the oracle's GROUP BY form).
    val empty = Sketches.joinSizeAudit(df, "k",
      col("side") === "a", col("side") === "z", width = 16, depth = 3)
      .collect()
    assert(empty.length == 1)
    assert(!empty.head.isNullAt(1) && empty.head.getLong(1) == 0L)
    assert(empty.head.getLong(0) == 0L && empty.head.getLong(2) == 0L)
  }

  test("fixedHistState: disjoint-split ADD-merge ≡ one-shot; replay double-counts") {
    val rows = (1 to 100).map(i => ("g", i.toDouble, i % 2))
    val df = rows.toDF("grp", "v", "day")
    val oneShot = Sketches.fixedHistState(df, "v", "grp", 0.0, 128.0, 64)
    val a = Sketches.fixedHistState(df.where(col("day") === 0), "v", "grp", 0.0, 128.0, 64)
    val b = Sketches.fixedHistState(df.where(col("day") === 1), "v", "grp", 0.0, 128.0, 64)
    val merged = Sketches.mergeHistStates(a, b)
    // disjoint batches: vector ADD reproduces the one-shot state exactly
    assert(merged.exceptAll(oneShot).count() == 0 &&
      oneShot.exceptAll(merged).count() == 0)
    // NON-idempotence (the algebra lincount's OR does NOT share): merging
    // a batch with itself doubles every count — the reason this state
    // demands exactly-once delivery
    val doubled = Sketches.mergeHistStates(a, a)
    assert(doubled.agg(sum(col("cnt"))).collect().head.getLong(0) ==
      2 * a.agg(sum(col("cnt"))).collect().head.getLong(0))
    // estimates off the merged state: monotone in q, inside the grid
    val est = Sketches.fixedHistQuantiles(merged, "grp", 0.0, 128.0, 64,
        Seq(0.5, 0.9)).orderBy("qi")
      .select("est").as[Double].collect()
    assert(est.length == 2 && est(0) <= est(1))
    // 100 uniform values 1..100, bin width 2: P50 lands in bin 24/25
    assert(math.abs(est(0) - 50.0) <= 2.0)
  }

  test("lincount rollup ≡ one-shot: day-sliced states OR-merge to the exact bitmap") {
    // same keys scattered across 3 "days": the union of per-day
    // occupancy states must equal the one-shot state bit for bit, so
    // the rolled-up estimate is EXACTLY the one-shot estimate
    val rows = (1L to 200L).map(k => (k % 3L, k, "g"))
    val df = rows.toDF("day", "k", "grp")
    val oneShot = Sketches.linearCountDistinct(df, "k", "grp", 1024)
      .collect().head
    val perDay = df.select(col("grp"), col("day"),
        Sketches.bucketOf(col("k"), 1024, 7L).as("bucket"))
      .distinct()
    val rolled = perDay.groupBy("grp")
      .agg(countDistinct(col("bucket")).as("n_occupied"))
      .collect().head
    assert(rolled.getLong(1) == oneShot.getLong(2),
      "OR-merged day states must reproduce the one-shot occupancy")
  }

  test("lincountOverlapAudit: exact overlaps, inclusion-exclusion off rounded ests") {
    // a = {1..20}, b = {11..30}, c = {1000}: a∩b = 10, a∩c = b∩c = ∅
    val rows = (1L to 20L).map(k => ("a", k)) ++
      (11L to 30L).map(k => ("b", k)) ++ Seq(("c", 1000L))
    val got = Sketches.lincountOverlapAudit(
        rows.toDF("grp", "k"), "k", "grp", 4096)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")),
      "every unordered group pair must appear, including zero-overlap ones")

    val ab = got(("a", "b"))
    assert(ab.getAs[Long]("n_exact_overlap") == 10L)
    // 31 keys into 4096 buckets: collision-free with this hash fixture,
    // so occupancies are the set sizes and shared bits = exact overlap
    assert(ab.getAs[Long]("occ_a") == 20L && ab.getAs[Long]("occ_b") == 20L)
    assert(ab.getAs[Long]("n_shared") == 10L)
    assert(math.abs(ab.getAs[Double]("est_overlap") - 10.0) < 1.0)
    // the overlap estimate must be derived from the ROUNDED per-set
    // estimates (the oracle-parity quantization chain)
    val recomposed = BigDecimal(ab.getAs[Double]("est_a")
        + ab.getAs[Double]("est_b") - ab.getAs[Double]("est_union"))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(ab.getAs[Double]("est_overlap") == recomposed)

    val ac = got(("a", "c"))
    assert(ac.getAs[Long]("n_exact_overlap") == 0L)
    assert(ac.getAs[Long]("n_shared") == 0L)
    assert(math.abs(ac.getAs[Double]("est_overlap")) < 0.5)
  }

  test("lincountOverlapAudit: saturation nulls the estimate chain, never divides by zero") {
    // 2 buckets, both groups saturate: est_a/est_b/est_union/est_overlap
    // must all be NULL (the widen-B signal), with counts still exact
    val rows = (1L to 64L).map(k => ("a", k)) ++ (33L to 96L).map(k => ("b", k))
    val r = Sketches.lincountOverlapAudit(rows.toDF("grp", "k"), "k", "grp", 2)
      .collect().head
    assert(r.getAs[Long]("n_exact_overlap") == 32L)
    assert(r.getAs[Long]("occ_a") == 2L && r.getAs[Long]("occ_b") == 2L)
    assert(r.isNullAt(r.fieldIndex("est_a")))
    assert(r.isNullAt(r.fieldIndex("est_union")))
    assert(r.isNullAt(r.fieldIndex("est_overlap")))
    assert(r.isNullAt(r.fieldIndex("err")))
  }
}
