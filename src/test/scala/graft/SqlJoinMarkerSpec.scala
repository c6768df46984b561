package graft

import graft.plans.{AsofJoinExec, BroadcastAsofJoinExec, BroadcastIntervalJoinExec, IntervalJoinExec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The SQL surface of the whole-operator joins (plans/MarkerJoins.scala):
  * `graft_asof` / `graft_overlaps` ON-clause markers rewritten by
  * MarkerJoinRewrite into AsofJoinPlan / IntervalJoinPlan. Pins
  *  - row parity between the SQL text and the DataFrame face,
  *  - the custom exec in the SQL query's physical plan (MERGE hint →
  *    shuffled merge, BROADCAST hint → broadcast form),
  *  - direction/tolerance literals riding through the SQL arg list,
  *  - every refusal lane: wrong join type, plain `=` keys, markers
  *    outside a join, zero markers' keys, non-foldable direction —
  *    loud errors, never silently different semantics.
  */
class SqlJoinMarkerSpec extends SparkSpec {
  import spark.implicits._

  /** AQE wraps stages as leaf nodes (collect can't descend), so the plan
    * pins run with AQE off — execution under AQE is exercised by the
    * semantics tests, which keep the session default.
    */
  private def withAqeOff[A](body: => A): A = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  private def regViews(): Unit = {
    Seq((1L, 100L, 11L), (1L, 200L, 12L), (2L, 150L, 21L), (3L, 100L, 31L))
      .toDF("k", "ts", "l_id").createOrReplaceTempView("mk_left")
    Seq((1L, 90L, 1L, "a"), (1L, 180L, 2L, "b"), (2L, 400L, 3L, "c"))
      .toDF("k", "ts", "tie", "pv").createOrReplaceTempView("mk_right")
  }

  private def asofSql(hint: String, extra: String = ""): DataFrame =
    spark.sql(
      s"""SELECT /*+ $hint(r) */ l.k, l.l_id, r.pv
          FROM mk_left l LEFT JOIN mk_right r
            ON l.k <=> r.k AND graft_asof(l.ts, r.ts, r.tie$extra)""")

  test("graft_asof SQL: backward semantics match the DataFrame exec, merge form pinned") {
    regViews()
    withAqeOff {
      val plan = asofSql("MERGE").queryExecution.executedPlan
      assert(plan.collectWithSubqueries { case e: AsofJoinExec => e }.nonEmpty,
        s"MERGE-hinted marker join must plan as AsofJoinExec:\n$plan")
    }
    val rows = asofSql("MERGE").as[(Long, Long, String)].collect().toSet
    assert(rows == Set(
      (1L, 11L, "a"),   // latest at-or-before 100 is ts=90
      (1L, 12L, "b"),   // latest at-or-before 200 is ts=180
      (2L, 21L, null),  // key 2's only right row is in the future
      (3L, 31L, null))) // key 3 has no right rows
  }

  test("graft_asof SQL: BROADCAST hint → broadcast exec, same rows") {
    regViews()
    withAqeOff {
      assert(asofSql("BROADCAST").queryExecution.executedPlan
        .collectWithSubqueries { case e: BroadcastAsofJoinExec => e }.nonEmpty)
    }
    val bc = asofSql("BROADCAST")
    val mg = asofSql("MERGE")
    assert(bc.exceptAll(mg).count() == 0 && mg.exceptAll(bc).count() == 0)
  }

  test("graft_asof SQL: direction + tolerance literals ride the arg list") {
    regViews()
    val fwd = asofSql("MERGE", ", 'forward'").as[(Long, Long, String)]
      .collect().toSet
    assert(fwd == Set(
      (1L, 11L, "b"),   // earliest at-or-after 100 is ts=180
      (1L, 12L, null),  // nothing at-or-after 200
      (2L, 21L, "c"),   // 400 >= 150
      (3L, 31L, null)))
    val tol = asofSql("MERGE", ", 'forward', 100L").as[(Long, Long, String)]
      .collect().toSet
    assert(tol == Set(
      (1L, 11L, "b"),   // distance 80 <= 100
      (1L, 12L, null),
      (2L, 21L, null),  // distance 250 > 100: tolerance nulls it out
      (3L, 31L, null)))
  }

  test("registered faces: ext_asof_sql ≡ ext_asof_exec, ext_interval_sql ≡ ext_interval_exec") {
    def face(n: String) = graft.queries.ExtQueries.queries
      .find(_.name == n).get.fn(spark, sf0001)
    Seq("ext_asof_sql" -> "ext_asof_exec",
        "ext_interval_sql" -> "ext_interval_exec").foreach {
      case (sqlName, dfName) =>
        val viaSql = face(sqlName)
        val viaDf = face(dfName).select(viaSql.columns.map(col): _*)
        assert(viaSql.count() > 0, s"$sqlName returned no rows")
        assert(viaSql.exceptAll(viaDf).count() == 0 &&
          viaDf.exceptAll(viaSql).count() == 0,
          s"$sqlName must be row-identical to $dfName")
    }
  }

  test("graft_overlaps SQL: overlap pairs + open intervals, execs pinned for both hints") {
    Seq((1L, 100L, 200L, 11L), (1L, 250L, 300L, 12L), (2L, 0L, 10L, 21L))
      .toDF("k", "s", "e", "l_id").createOrReplaceTempView("mk_iv_left")
    // r2 open-ended (null end = open future), r3 touches l11 only at the
    // boundary 200 — half-open [s, e) semantics EXCLUDE it
    Seq((1L, 150L, 260L, 1L), (1L, 280L, -1L, 2L), (1L, 200L, 210L, 3L),
        (9L, 0L, 999L, 4L))
      .toDF("k", "s", "e0", "r_id")
      .withColumn("e", when(col("e0") < 0L, lit(null).cast("long"))
        .otherwise(col("e0")))
      .createOrReplaceTempView("mk_iv_right")
    def q(hint: String) = spark.sql(
      s"""SELECT /*+ $hint(r) */ l.k, l.l_id, r.r_id
          FROM mk_iv_left l JOIN mk_iv_right r
            ON l.k <=> r.k AND graft_overlaps(l.s, l.e, r.s, r.e)""")
    withAqeOff {
      assert(q("MERGE").queryExecution.executedPlan
        .collectWithSubqueries { case e: IntervalJoinExec => e }.nonEmpty)
      assert(q("BROADCAST").queryExecution.executedPlan
        .collectWithSubqueries { case e: BroadcastIntervalJoinExec => e }.nonEmpty)
    }
    val merged = q("MERGE")
    val bc = q("BROADCAST")
    val want = Set(
      (1L, 11L, 1L),  // [100,200) x [150,260)
      (1L, 12L, 1L),  // [250,300) x [150,260)
      (1L, 12L, 2L))  // [250,300) x [280, open) — and NOT (11,3):
                      // the boundary touch at 200 is out under [s, e)
    assert(merged.as[(Long, Long, Long)].collect().toSet == want)
    assert(bc.as[(Long, Long, Long)].collect().toSet == want)
  }

  test("inner overlaps: cross-side WHERE predicates survive the rewrite as a post-join Filter") {
    // PushPredicateThroughJoin runs in the same fixedPoint batch as
    // MarkerJoinRewrite and pushes a cross-side WHERE conjunct INTO an
    // inner join's condition before the rewrite fires — the documented
    // usage ("apply residual predicates as WHERE filters") must WORK,
    // carried out as a Filter over IntervalJoinPlan, not be rejected.
    Seq((1L, 100L, 200L, 11L), (1L, 250L, 300L, 12L), (2L, 0L, 10L, 21L))
      .toDF("k", "s", "e", "l_id").createOrReplaceTempView("mk_rf_left")
    Seq((1L, 150L, 260L, 1L), (1L, 280L, 400L, 2L), (2L, 5L, 9L, 3L))
      .toDF("k", "s", "e", "r_id").createOrReplaceTempView("mk_rf_right")
    val got = spark.sql(
      """SELECT /*+ MERGE(r) */ l.k, l.l_id, r.r_id
         FROM mk_rf_left l JOIN mk_rf_right r
           ON l.k <=> r.k AND graft_overlaps(l.s, l.e, r.s, r.e)
         WHERE l.l_id + r.r_id > 13""")
    assert(got.as[(Long, Long, Long)].collect().toSet == Set(
      (1L, 12L, 2L),   // 12+2 > 13
      (2L, 21L, 3L)))  // 21+3 > 13; (11,1) and (12,1) filtered (<= 13)
    withAqeOff {
      assert(got.queryExecution.executedPlan
        .collectWithSubqueries { case e: IntervalJoinExec => e }.nonEmpty,
        "residual-filtered marker join must still plan the custom exec")
    }
  }

  test("left-outer asof: WHERE on the right side stays a post-join filter (never pushed into ON)") {
    regViews()
    val got = spark.sql(
      """SELECT /*+ MERGE(r) */ l.k, l.l_id, r.pv
         FROM mk_left l LEFT JOIN mk_right r
           ON l.k <=> r.k AND graft_asof(l.ts, r.ts, r.tie)
         WHERE r.pv IS NOT NULL""")
    assert(got.as[(Long, Long, String)].collect().toSet ==
      Set((1L, 11L, "a"), (1L, 12L, "b")))
  }

  test("GraftJoinPushdown: safe pushdown + pruning through the opaque custom nodes") {
    import graft.plans.{AsofJoinPlan, IntervalJoinPlan}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, Project => LProject}
    regViews()
    // (1) left-only WHERE pushes BELOW the as-of node (commutes: each
    // output row depends on one left row + the whole right side)...
    val lhs = spark.sql(
      """SELECT l.k, l.l_id, r.pv
         FROM mk_left l LEFT JOIN mk_right r
           ON l.k <=> r.k AND graft_asof(l.ts, r.ts, r.tie)
         WHERE l.l_id > 11""").queryExecution.optimizedPlan
    val asof = lhs.collect { case a: AsofJoinPlan => a }
    assert(asof.nonEmpty, s"as-of node lost:\n$lhs")
    assert(asof.head.left.collectFirst { case f: LFilter => f }.nonEmpty ||
      asof.head.left.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      s"left-only predicate must push below the as-of join:\n$lhs")
    assert(lhs.collectFirst { case f: LFilter if f.child.isInstanceOf[AsofJoinPlan] => f }.isEmpty,
      s"no residual filter should remain above the as-of join:\n$lhs")
    // ...(2) but a right-side WHERE does NOT push (it would change which
    // right row is latest-at-or-before) — it stays above the node
    val rhs = spark.sql(
      """SELECT l.k, l.l_id, r.pv
         FROM mk_left l LEFT JOIN mk_right r
           ON l.k <=> r.k AND graft_asof(l.ts, r.ts, r.tie)
         WHERE r.pv IS NOT NULL""").queryExecution.optimizedPlan
    val rhsAsof = rhs.collect { case a: AsofJoinPlan => a }
    assert(rhsAsof.nonEmpty)
    assert(rhs.exists {
      case LFilter(_, _: AsofJoinPlan) => true
      case _ => false
    }, s"right-side predicate must stay ABOVE the as-of join:\n$rhs")
    assert(rhsAsof.head.right.collectFirst { case f: LFilter => f }.isEmpty,
      s"right-side predicate must never reach the right child:\n$rhs")
    // (3) payload pruning: a narrow SELECT cuts unreferenced payload
    // columns out of the node (the SQL surface defaults to full right
    // output) and inserts a pruning Project on the right child
    assert(asof.head.rightPayload.map(_.name).toSet == Set("pv"),
      s"payload must prune to the referenced columns, got ${asof.head.rightPayload}")
    // (4) interval join: BOTH sides' predicates push (row-wise theta)
    Seq((1L, 100L, 200L, 11L), (2L, 0L, 10L, 21L))
      .toDF("k", "s", "e", "l_id").createOrReplaceTempView("mk_pd_left")
    Seq((1L, 150L, 260L, 1L), (2L, 5L, 9L, 3L))
      .toDF("k", "s", "e", "r_id").createOrReplaceTempView("mk_pd_right")
    val iv = spark.sql(
      """SELECT l.k, l.l_id, r.r_id
         FROM mk_pd_left l JOIN mk_pd_right r
           ON l.k <=> r.k AND graft_overlaps(l.s, l.e, r.s, r.e)
         WHERE l.l_id > 11 AND r.r_id < 3""").queryExecution.optimizedPlan
    val ivNode = iv.collect { case i: IntervalJoinPlan => i }
    assert(ivNode.nonEmpty, s"interval node lost:\n$iv")
    assert(iv.collectFirst { case f: LFilter if f.child.isInstanceOf[IntervalJoinPlan] => f }.isEmpty,
      s"both single-side predicates must push through the interval join:\n$iv")
    // semantics still correct post-pushdown
    assert(spark.sql(
      """SELECT l.k, l.l_id, r.r_id
         FROM mk_pd_left l JOIN mk_pd_right r
           ON l.k <=> r.k AND graft_overlaps(l.s, l.e, r.s, r.e)
         WHERE l.l_id > 11 AND r.r_id < 3""").as[(Long, Long, Long)]
      .collect().toSet == Set())
    val ivAll = spark.sql(
      """SELECT l.k, l.l_id, r.r_id
         FROM mk_pd_left l JOIN mk_pd_right r
           ON l.k <=> r.k AND graft_overlaps(l.s, l.e, r.s, r.e)
         WHERE l.l_id > 1 AND r.r_id < 3""").as[(Long, Long, Long)]
      .collect().toSet
    assert(ivAll == Set((1L, 11L, 1L)))
  }

  test("graft_range SQL: binned equi-join plan, rows ≡ naive theta; graft_salted ≡ plain join with salt shear") {
    Seq((1L, 100L, 11L), (1L, 500L, 12L), (2L, 150L, 21L))
      .toDF("k", "ts", "l_id").createOrReplaceTempView("mk_rg_left")
    Seq((1L, 80L, 1L), (1L, 95L, 2L), (1L, 400L, 3L), (2L, 149L, 4L),
        (2L, 250L, 5L), (3L, 100L, 6L))
      .toDF("k", "ts2", "r_id").createOrReplaceTempView("mk_rg_right")
    // right rows with l.ts - 30 <= r.ts2 <= l.ts: hand-checked pairs
    val got = spark.sql(
      """SELECT l.l_id, r.r_id FROM mk_rg_left l JOIN mk_rg_right r
           ON l.k = r.k AND graft_range(l.ts, r.ts2, -30L, 0L)""")
    assert(got.as[(Long, Long)].collect().toSet == Set(
      (11L, 1L),   // 80 in [70, 100]
      (11L, 2L),   // 95 in [70, 100]
      (21L, 4L)))  // 149 in [120, 150]; 400 not in [470,500]; key 3 never
    // the plan is the BINNED equi-join: hash keys carry the bin column,
    // no BroadcastNestedLoop / cartesian in sight
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = got.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_bin") && !plan.contains("NestedLoop") &&
        !plan.contains("Cartesian"),
        s"graft_range must plan as the binned equi-join:\n$plan")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
    // salted: rows identical to the plain equi-join, salt visible in plan
    Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)).toDF("k", "v")
      .createOrReplaceTempView("mk_sa_left")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "seg")
      .createOrReplaceTempView("mk_sa_right")
    val salted = spark.sql(
      """SELECT l.k, l.v, r.seg FROM mk_sa_left l JOIN mk_sa_right r
           ON l.k = r.k AND graft_salted(4)""")
    val plain = spark.sql(
      """SELECT l.k, l.v, r.seg FROM mk_sa_left l JOIN mk_sa_right r
           ON l.k = r.k""")
    assert(salted.exceptAll(plain).count() == 0 &&
      plain.exceptAll(salted).count() == 0)
    assert(salted.queryExecution.optimizedPlan.toString.contains("__graft_salt"),
      "salt machinery must be in the optimized plan")
    // registered faces ≡ their operator twins
    def face(n: String) = graft.queries.ExtQueries.queries
      .find(_.name == n).get.fn(spark, sf0001)
    Seq("ext_range_sql" -> "ext_range_join",
        "ext_skew_sql" -> "ext_skew_salted").foreach { case (sqlName, dfName) =>
      val viaSql = face(sqlName)
      val viaDf = face(dfName).select(viaSql.columns.map(col): _*)
      assert(viaSql.count() > 0, s"$sqlName returned no rows")
      assert(viaSql.exceptAll(viaDf).count() == 0 &&
        viaDf.exceptAll(viaSql).count() == 0,
        s"$sqlName must be row-identical to $dfName")
    }
  }

  test("graft_range / graft_salted refusal lanes") {
    Seq((1L, 100L, 11L)).toDF("k", "ts", "l_id")
      .createOrReplaceTempView("mk_rf2_l")
    Seq((1L, 90L, 1L)).toDF("k", "ts2", "r_id")
      .createOrReplaceTempView("mk_rf2_r")
    def err(sql: String): String =
      intercept[Exception](spark.sql(sql).collect()).getMessage
    // wrong join type
    assert(err("""SELECT l.k FROM mk_rf2_l l LEFT JOIN mk_rf2_r r
                   ON l.k = r.k AND graft_range(l.ts, r.ts2, -30L, 0L)""")
      .contains("INNER"))
    // empty window
    assert(err("""SELECT l.k FROM mk_rf2_l l JOIN mk_rf2_r r
                   ON l.k = r.k AND graft_range(l.ts, r.ts2, 30L, 30L)""")
      .contains("empty window"))
    // unkeyed range join
    assert(err("""SELECT l.k FROM mk_rf2_l l JOIN mk_rf2_r r
                   ON graft_range(l.ts, r.ts2, -30L, 0L)""")
      .contains("key conjunct"))
    // salted without an equi key
    assert(err("""SELECT l.k FROM mk_rf2_l l JOIN mk_rf2_r r
                   ON l.ts < r.ts2 AND graft_salted(4)""")
      .contains("equi-join key"))
    // salts bounds
    assert(err("""SELECT l.k FROM mk_rf2_l l JOIN mk_rf2_r r
                   ON l.k = r.k AND graft_salted(1)""")
      .contains("[2, 4096]"))
    // non-foldable bound
    assert(err("""SELECT l.k FROM mk_rf2_l l JOIN mk_rf2_r r
                   ON l.k = r.k AND graft_range(l.ts, r.ts2, l.ts, 0L)""")
      .contains("foldable"))
  }

  test("marker joins inside subqueries rewrite too (EXISTS over graft_overlaps)") {
    Seq((1L, 100L, 200L), (2L, 0L, 10L), (3L, 50L, 60L))
      .toDF("k", "s", "e").createOrReplaceTempView("mk_sq_left")
    Seq((1L, 150L, 260L), (3L, 70L, 80L))
      .toDF("k", "s", "e").createOrReplaceTempView("mk_sq_right")
    // keys with at least one overlapping right interval — the marker
    // join lives INSIDE the EXISTS subquery plan
    val got = spark.sql(
      """SELECT k FROM mk_sq_left o
         WHERE EXISTS (
           SELECT 1 FROM mk_sq_left l JOIN mk_sq_right r
             ON l.k <=> r.k AND graft_overlaps(l.s, l.e, r.s, r.e)
           WHERE l.k = o.k)""")
    assert(got.as[Long].collect().toSet == Set(1L),
      "key 1 overlaps [150,260); key 3's [50,60) misses [70,80); key 2 has no right row")
  }

  test("refusal lanes: every misuse fails loudly with the reason") {
    regViews()
    def err(sql: String): String =
      intercept[Exception](spark.sql(sql).collect()).getMessage
    // asof on the wrong join type
    assert(err("""SELECT l.k FROM mk_left l JOIN mk_right r
                   ON l.k <=> r.k AND graft_asof(l.ts, r.ts, r.tie)""")
      .contains("LEFT OUTER"))
    // overlaps on the wrong join type
    assert(err("""SELECT l.k FROM mk_left l LEFT JOIN mk_right r
                   ON l.k <=> r.k AND graft_overlaps(l.ts, l.ts, r.ts, r.ts)""")
      .contains("INNER"))
    // plain `=` key is a semantics change the operator does not implement
    assert(err("""SELECT l.k FROM mk_left l LEFT JOIN mk_right r
                   ON l.k = r.k AND graft_asof(l.ts, r.ts, r.tie)""")
      .contains("null-safe"))
    // no key equality at all
    assert(err("""SELECT l.k FROM mk_left l LEFT JOIN mk_right r
                   ON graft_asof(l.ts, r.ts, r.tie)""")
      .contains("at least one"))
    // marker outside a join condition (WHERE) is misuse, not a fallback
    assert(err("""SELECT * FROM mk_left l
                   WHERE graft_asof(l.ts, l.ts, l.l_id)""")
      .contains("only legal"))
    // non-foldable direction: physical plan is picked at planning time
    assert(err("""SELECT l.k FROM mk_left l LEFT JOIN mk_right r
                   ON l.k <=> r.k AND graft_asof(l.ts, r.ts, r.tie, r.pv)""")
      .contains("foldable"))
    // wrong-typed timestamp: the ns-convention gate
    assert(err("""SELECT l.k FROM mk_left l LEFT JOIN mk_right r
                   ON l.k <=> r.k AND graft_asof(CAST(l.ts AS INT), r.ts, r.tie)""")
      .contains("BIGINT"))
  }
}
