package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** As-of join and sessionization edge cases on literal frames. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin: latest at-or-before match; null when no prior right row") {
    val left = Seq((1L, 100L, 10L), (1L, 50L, 11L), (2L, 100L, 12L))
      .toDF("k", "ts", "lid")
    val right = Seq((1L, 60L, 20L, "a"), (1L, 100L, 21L, "b"), (2L, 200L, 22L, "c"))
      .toDF("k", "ts", "rid", "payload")
    val got = Relational.asofJoin(left, right, "k", "ts", "rid", Seq("payload"))
      .select("lid", "payload").as[(Long, Option[String])].collect().toMap
    assert(got(10L).contains("b")) // ts=100: same-instant right row included
    assert(got(11L).isEmpty)       // ts=50: no right row at-or-before
    assert(got(12L).isEmpty)       // right exists only after left
  }

  test("sessionize: exact-gap events stay in one session, beyond-gap split") {
    val df = Seq((1L, 0L), (1L, 100L), (1L, 201L), (2L, 0L))
      .toDF("k", "ts")
    val got = Relational.sessionize(df, "k", "ts", gapNanos = 100L)
      .select("k", "ts", "session_id").as[(Long, Long, Long)].collect().toSet
    // gap of exactly 100 does NOT split (strict >); 101 does
    assert(got == Set((1L, 0L, 1L), (1L, 100L, 1L), (1L, 201L, 2L), (2L, 0L, 1L)))
  }

  test("novelty monitor: day-1 rate is 1.0, rates bounded, new-key mass conserved") {
    val got = SparkEntry.queries("ext_events_novelty")(spark, sf0001)
      .orderBy("day").collect()
    assert(got.nonEmpty)
    // the first observed day: every active key is first-seen
    assert(got.head.getDouble(3) == 1.0)
    got.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getLong(2) <= r.getLong(1), "new keys cannot exceed active keys")
    }
    // sum of per-day new keys == total distinct keys in the corpus
    val totalNew = got.map(_.getLong(2)).sum
    val distinctKeys = Tables.events(spark, sf0001)
      .select("user_id", "event_type").distinct().count()
    assert(totalNew == distinctKeys)
  }

  test("MAD monitor: med/mad are real counts, flag is |n-med| > 3*mad") {
    val got = SparkEntry.queries("ext_events_mad")(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Int)].collect()
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (_, rows) =>
      val ns = rows.map(_._3).toSet
      val med = rows.head._4
      val mad = rows.head._5
      // lower medians are order statistics — actual members, never midpoints
      assert(rows.forall(_._4 == med) && ns.contains(med))
      assert(rows.map(r => math.abs(r._3 - r._4)).toSet.contains(mad))
      rows.foreach { r =>
        assert((r._6 == 1) == (math.abs(r._3 - med) > 3 * mad))
      }
      // a lower median leaves at least half the days at-or-below it
      assert(rows.count(_._3 <= med) * 2 >= rows.size)
    }
  }

  test("resampleDailyFfill: dense spine, zero-filled counts, forward-filled values") {
    // group A observed on days 10 and 13 (gap 11-12); group B only on 12
    val df = Seq(
      ("A", 10L, 100L), ("A", 10L, 50L), ("A", 13L, 70L),
      ("B", 12L, 30L)
    ).toDF("grp", "day_in", "v")
    val got = Relational.resampleDailyFfill(df, "grp", col("day_in"),
        Seq(sum(col("v")).as("day_v")), Seq("day_v"))
      .select("grp", "day", "n_rows", "day_v", "day_v_ffill")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)),
         if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .toMap

    // spine is dense over the GLOBAL [10, 13] window for BOTH groups
    assert(got.keySet == (for (g <- Seq("A", "B"); d <- 10L to 13L) yield (g, d)).toSet)
    assert(got(("A", 10L)) == ((2L, Some(150L), Some(150L))))
    assert(got(("A", 11L)) == ((0L, None, Some(150L)))) // gap: ffill carries
    assert(got(("A", 12L)) == ((0L, None, Some(150L))))
    assert(got(("A", 13L)) == ((1L, Some(70L), Some(70L))))
    assert(got(("B", 10L)) == ((0L, None, None)))       // before first obs: null
    assert(got(("B", 12L)) == ((1L, Some(30L), Some(30L))))
    assert(got(("B", 13L)) == ((0L, None, Some(30L))))
  }

  test("session_window ≡ sessionize at the exact-gap boundary (both inclusive)") {
    // events at 0, 100ms, 201ms. Empirically pinned: session_window
    // MERGES an exactly-gap-later event (split iff diff > gap) — the
    // same ≤-gap rule as the hand-rolled sessionize, so the native
    // operator is a drop-in and the ext_sessionize_native oracle's
    // `diff > gap` split rule is the correct encoding.
    val df = Seq((1L, 0L), (1L, 100000000L), (1L, 201000000L))
      .toDF("k", "ts") // nanos: 0, 100ms, 201ms
    val handRolled = graft.operators.Relational
      .sessionize(df, "k", "ts", gapNanos = 100000000L)
      .select("session_id").distinct().count()
    assert(handRolled == 2) // {0, 100ms} merge (diff == gap); 201ms splits
    def nativeSessions(gap: String): Long = df
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .groupBy(col("k"), session_window(col("event_time"), gap))
      .agg(count(lit(1)).as("n")).count()
    // inclusive boundary: diff == gap merges, diff 101ms > gap splits
    assert(nativeSessions("100 milliseconds") == 2)
    // one unit under the first diff: everything splits (strict > rule)
    assert(nativeSessions("99 milliseconds") == 3)
    // at the widest diff: everything merges
    assert(nativeSessions("101 milliseconds") == 1)
  }

  test("ext_events_decay: dyadic weights sum exactly, scaled sum reconciles") {
    val rows = SparkEntry.queries("ext_events_decay")(spark, sf0001)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, scaled, mass) =>
      // every weight is 2^(30-k) with k in [0,30]: the scaled sum is
      // bounded by n*2^30 (full freshness) and >= n (stalest cap)
      assert(scaled >= n && scaled <= n * (1L << 30))
      // the emitted mass is exactly the scaled sum / 2^30 rounded at 6dp
      val expected = BigDecimal(scaled) / BigDecimal(1L << 30)
      assert(math.abs(mass - expected.toDouble) < 5e-7)
    }
  }

  test("ext_privacy_erasure and ext_label_kappa: accounting invariants hold") {
    val er = SparkEntry.queries("ext_privacy_erasure")(spark, sf0001)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(er.keySet == Set("events", "documents"))
    er.values.foreach { case (_, before, deleted, after) =>
      assert(before == deleted + after && deleted > 0 && after > 0)
    }
    val k = SparkEntry.queries("ext_label_kappa")(spark, sf0001)
      .collect().head
    val (n, agree) = (k.getLong(0), k.getLong(1))
    val (po, pe, kappa) = (k.getDouble(2), k.getDouble(3), k.getDouble(4))
    assert(agree <= n && po >= 0 && po <= 1 && pe > 0 && pe < 1)
    // chance-corrected: kappa below raw agreement, and consistent with
    // (po-pe)/(1-pe) at the emitted rounding
    assert(kappa <= po + 1e-6)
    assert(math.abs(kappa - (po - pe) / (1 - pe)) < 1e-4)
  }

  test("ext_events_winsor: clipped mass bounded by the percentile mass, mean inside bounds") {
    val rows = SparkEntry.queries("ext_events_winsor")(spark, sf0001)
      .as[(String, Long, Double, Double, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, p05, p95, clipLo, clipHi, _, meanW) =>
      assert(p05 <= p95)
      // interpolated p05/p95 bound the strictly-outside mass at 5% + 1
      assert(clipLo <= n * 0.05 + 1, s"$clipLo of $n below p05")
      assert(clipHi <= n * 0.05 + 1, s"$clipHi of $n above p95")
      // every winsorized value lies in [p05, p95], so the mean must too
      // (half-cent slack for the cent-grid quantization of the mean)
      assert(meanW >= p05 - 0.005 && meanW <= p95 + 0.005)
    }
  }

  test("ext_privacy_tclose: sweep monotone in t, tv bounded by 1, counts consistent") {
    val rows = SparkEntry.queries("ext_privacy_tclose")(spark, sf0001)
      .as[(Double, Long, Long, Long, Double, Double)].collect()
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0.2, 0.3, 0.5))
    // total-variation distance is bounded by 1 and shared across rows
    assert(rows.map(_._6).distinct.size == 1)
    assert(rows.forall(r => r._6 >= 0.0 && r._6 <= 1.0))
    rows.foreach { case (_, nGroups, violG, violRows, violFrac, _) =>
      assert(violG <= nGroups && violFrac >= 0.0 && violFrac <= 1.0)
      assert((violG == 0) == (violRows == 0L))
    }
    // raising t can only shrink the violating set
    assert(rows.map(_._3).sliding(2).forall(p => p.head >= p.last))
  }

  test("ext_events_markov: transition mass conserves, rows normalize to 1") {
    val rows = SparkEntry.queries("ext_events_markov")(spark, sf0001)
      .as[(String, String, Long, Double)].collect()
    assert(rows.nonEmpty)
    // every user with n events contributes exactly n-1 transitions
    val ev = Tables.events(spark, sf0001)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_._3).sum == expected,
      s"transition mass must be N - U, got ${rows.map(_._3).sum} vs $expected")
    rows.groupBy(_._1).foreach { case (from, ts) =>
      val probSum = ts.map(_._4).sum
      assert(math.abs(probSum - 1.0) < 1e-4, s"$from rows sum to $probSum")
      ts.foreach(t => assert(t._4 > 0.0 && t._4 <= 1.0))
    }
  }

  test("ext_events_attrib: attribution bounded by purchases, latency within lookback") {
    val rows = SparkEntry.queries("ext_events_attrib")(spark, sf0001)
      .as[(Long, Long, Long, Double, Option[Double])].collect()
    assert(rows.nonEmpty)
    val totalPurch = Tables.events(spark, sf0001)
      .where(col("event_type") === "purchase").count()
    assert(rows.map(_._2).sum == totalPurch,
      "every purchase lands in exactly one day bucket")
    rows.foreach { case (_, n, attr, rate, lat) =>
      assert(attr <= n && rate >= 0.0 && rate <= 1.0)
      // an attributed click is at most 24h back -> mean in (0, 1440] min
      lat.foreach(m => assert(m > 0.0 && m <= 1440.0))
      assert((attr == 0L) == lat.isEmpty)
    }
  }

  test("ext_events_anomaly: warm-up days flagged NULL, integer rules consistent") {
    val rows = SparkEntry.queries("ext_events_anomaly")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getInt(4)),
        if (r.isNullAt(5)) None else Some(r.getInt(5))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, ts) =>
      val sorted = ts.sortBy(_._2)
      // first three days per type have no 3-day history
      sorted.take(3).foreach(r => assert(r._4.isEmpty && r._5.isEmpty && r._6.isEmpty))
      sorted.drop(3).foreach { case (_, _, cnt, s3, spike, drop) =>
        assert(s3.nonEmpty && spike.nonEmpty && drop.nonEmpty)
        assert((spike.get == 1) == (cnt * 3 > s3.get * 2))
        assert((drop.get == 1) == (cnt * 6 < s3.get))
      }
    }
  }

  test("ext_stats_analyze: one fused scan, stats agree with direct per-column queries") {
    val df = SparkEntry.queries("ext_stats_analyze")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      "every column's stats must ride ONE fused orders scan")
    val got = df.collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("o_orderkey", "o_custkey", "o_totalprice",
      "o_orderstatus", "o_orderpriority"))
    val ord = Tables.orders(spark, sf0001)
    val n = ord.count()
    got.values.foreach { r =>
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("ndv") <= n - r.getAs[Long]("n_null"))
    }
    assert(got("o_orderkey").getAs[Long]("ndv") ==
      ord.select("o_orderkey").distinct().count())
    assert(got("o_orderstatus").getAs[String]("min_str") != null &&
      got("o_orderstatus").getAs[Any]("min_num") == null)
  }

  test("ext_events_ltv: triangle accumulates exactly, per-user value consistent") {
    val rows = SparkEntry.queries("ext_events_ltv")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, cells) =>
      val sorted = cells.sortBy(_._2)
      // one cohort size per cohort; cumulative = running sum of cells
      assert(sorted.map(_._3).distinct.size == 1)
      var run = 0L
      sorted.foreach { case (_, _, nUsers, _, rev, cum, ltv) =>
        run += rev
        assert(cum == run, "cumulative revenue must prefix-sum the cells")
        val expected = BigDecimal(cum / 100.0 / nUsers)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(ltv - expected) < 1e-9)
      }
    }
    // attribution to cohorts never invents purchases
    val totalPurch = Tables.events(spark, sf0001)
      .where(col("event_type") === "purchase").count()
    assert(rows.map(_._4).sum <= totalPurch)
  }

  test("ext_events_pareto: shares match a direct sorted recompute, monotone in k") {
    val rows = SparkEntry.queries("ext_events_pareto")(spark, sf0001)
      .as[(Int, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 5, 10, 25, 50))
    // direct recompute: per-user cents desc, take floor(N*k/100)
    val cents = Tables.events(spark, sf0001)
      .where(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("c"))
      .select("c").as[Long].collect().sorted(Ordering[Long].reverse)
    val total = cents.sum
    rows.foreach { case (k, nTop, topRev, tot, share) =>
      assert(tot == total)
      val expTop = (cents.length.toLong * k) / 100
      assert(nTop == expTop)
      assert(topRev == cents.take(expTop.toInt).sum,
        s"k=$k: partial-value arithmetic must equal the sorted take")
      assert(share >= 0.0 && share <= 1.0)
    }
    assert(rows.map(_._5).sliding(2).forall(p => p.head <= p.last),
      "a larger top slice can only carry more revenue share")
  }

  test("ext_sessions_stats: bounce bounded, averages consistent with sessionize") {
    val rows = SparkEntry.queries("ext_sessions_stats")(spark, sf0001)
      .as[(Long, Long, Long, Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, bounce, rate, avgEv, avgDur, p50) =>
      assert(bounce <= n && rate >= 0.0 && rate <= 1.0)
      assert(avgEv >= 1.0)
      assert(avgDur >= 0.0 && p50 >= 0.0)
    }
    // session mass conserves: events = sum over days of session events
    val totalSessions = graft.operators.Relational
      .sessionize(Tables.events(spark, sf0001), "user_id", "ts",
        30L * 60 * 1000000000L)
      .select("user_id", "session_id").distinct().count()
    assert(rows.map(_._2).sum == totalSessions)
  }

  test("ext_events_touchpoints ≡ ext_events_attrib on attribution counts") {
    val tp = SparkEntry.queries("ext_events_touchpoints")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val at = SparkEntry.queries("ext_events_attrib")(spark, sf0001)
      .as[(Long, Long, Long, Double, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(tp.keySet == at.keySet)
    tp.foreach { case (day, (_, n, zero, one, multi, maxPath, _)) =>
      assert(zero + one + multi == n, "touch buckets must partition purchases")
      // a purchase is ATTRIBUTED exactly when it has >= 1 touch in the
      // same inclusive 24h window — two independent formulations (range
      // join vs union-and-window) must agree per day
      assert(at(day)._3 == n - zero,
        s"day $day: attribution ($at) vs touchpoints disagree")
      assert((maxPath == 0L) == (one + multi == 0L))
    }
  }

  test("ext_corpus_gini: matches the direct sorted-rank formula per source") {
    val got = SparkEntry.queries("ext_corpus_gini")(spark, sf0001)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val docs = Tables.documents(spark, sf0001)
      .select("source", "n_chars").as[(String, Long)].collect()
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sorted }
    assert(got.keySet == docs.keySet)
    docs.foreach { case (s, xs) =>
      val n = xs.length.toLong
      val tot = xs.sum
      val s1 = xs.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
      val gini = BigDecimal((2L * s1 - (n + 1) * tot).toDouble / (n * tot))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (_, gn, gt, gg) = got(s)
      assert(gn == n && gt == tot)
      assert(math.abs(gg - gini) < 2e-6, s"source $s: $gg vs $gini")
      assert(gg >= 0.0 && gg < 1.0)
    }
  }

  test("ext_ts_acf: matches a driver-side exact recompute on the zero-filled series") {
    val got = SparkEntry.queries("ext_ts_acf")(spark, sf0001)
      .as[(Long, Long, Option[Double])].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == (1L to 7L).toSet)
    val dayNs = 86400000000000L
    val byDay = Tables.events(spark, sf0001)
      .groupBy(expr(s"ts div $dayNs").as("d"))
      .agg(count(lit(1)).as("y")).as[(Long, Long)].collect().toMap
    val (lo, hi) = (byDay.keys.min, byDay.keys.max)
    val y = (lo to hi).map(d => byDay.getOrElse(d, 0L)).toArray
    val n = y.length.toLong
    val s = y.sum
    val r = y.map(v => n * v - s)
    val den = r.map(v => v * v).sum
    got.foreach { case (lag, (_, nPairs, acf)) =>
      assert(nPairs == n - lag, "one pair per day with a lag-shifted partner")
      val num = (0 until (n - lag).toInt).map(t => r(t) * r(t + lag.toInt)).sum
      val expected = BigDecimal(num.toDouble / den.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(acf.get - expected) < 1e-9, s"lag $lag: $acf vs $expected")
      assert(acf.get >= -1.0 - 1e-9 && acf.get <= 1.0 + 1e-9)
    }
  }

  test("ext_ts_forecast: skill consistent with the two MAEs, eval window sized right") {
    val rows = SparkEntry.queries("ext_ts_forecast")(spark, sf0001)
      .as[(String, Long, Double, Double, Option[Double])].collect()
    assert(rows.nonEmpty)
    val nDays = {
      val d = Tables.events(spark, sf0001)
        .select(expr("ts div 86400000000000").as("d"))
        .agg(max("d") - min("d")).as[Long].collect().head
      d + 1
    }
    rows.foreach { case (t, nEval, mae7, mae1, skill) =>
      assert(nEval == nDays - 7, s"$t: eval window must be the spine minus warm-up")
      assert(mae7 >= 0.0 && mae1 >= 0.0)
      skill.foreach { sk =>
        // skill = 1 − e7/e1 from the integer sums; recompute from the MAEs
        // (same denominator cancels) within rounding slack
        assert(math.abs(sk - (1.0 - mae7 / mae1)) < 1e-4, s"$t: $sk")
        assert(sk <= 1.0 + 1e-9)
      }
    }
  }

  test("ext_events_cusum: argmax drift matches a driver recompute per type") {
    val got = SparkEntry.queries("ext_events_cusum")(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Option[Double], Double, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val dayNs = 86400000000000L
    val raw = Tables.events(spark, sf0001)
      .groupBy(col("event_type"), expr(s"ts div $dayNs").as("d"))
      .agg(count(lit(1)).as("y"))
      .as[(String, Long, Long)].collect()
    val lo = raw.map(_._2).min
    val hi = raw.map(_._2).max
    assert(got.keySet == raw.map(_._1).toSet)
    raw.groupBy(_._1).foreach { case (t, xs) =>
      val byDay = xs.map(r => r._2 -> r._3).toMap
      val y = (lo to hi).map(d => byDay.getOrElse(d, 0L)).toArray
      val n = y.length.toLong
      val s = y.sum
      var p = 0L
      val drifts = y.zipWithIndex.map { case (v, i) =>
        p += v; (lo + i, (i + 1).toLong, n * p - (i + 1) * s)
      }
      val (cpDay, cpIdx, dMax) =
        drifts.minBy { case (day, _, dr) => (-math.abs(dr), day) }
      val (gN, gDay, gIdx, gDrift) =
        (got(t)._2, got(t)._3, got(t)._4, got(t)._5)
      assert(gN == n && gDay == cpDay && gIdx == cpIdx && gDrift == dMax,
        s"$t: got (${gDay},${gIdx},${gDrift}) want ($cpDay,$cpIdx,$dMax)")
      // mean before/after consistency with the integer prefix at the cut
      val pAtCp = y.take(cpIdx.toInt).sum
      val expBefore = BigDecimal(pAtCp.toDouble / cpIdx)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got(t)._7 - expBefore) < 1e-9)
      if (cpIdx < n) {
        val expAfter = BigDecimal((s - pAtCp).toDouble / (n - cpIdx))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(got(t)._8.get - expAfter) < 1e-9)
      }
    }
  }

  test("ext_ts_dow: eta2 matches a driver variance decomposition, bounded [0,1]") {
    val got = SparkEntry.queries("ext_ts_dow")(spark, sf0001)
      .as[(Long, Long, Long, Double, Option[Double])].collect()
    assert(got.map(_._1).sorted.toSeq == (0L to 6L))
    val dayNs = 86400000000000L
    val byDay = Tables.events(spark, sf0001)
      .groupBy(expr(s"ts div $dayNs").as("d"))
      .agg(count(lit(1)).as("y")).as[(Long, Long)].collect().toMap
    val (lo, hi) = (byDay.keys.min, byDay.keys.max)
    val days = (lo to hi).map(d => (d % 7, byDay.getOrElse(d, 0L)))
    val n = days.length.toLong
    val sm = days.map(_._2).sum
    val sst = days.map { case (_, y) => val r = n * y - sm; r * r }.sum
    val ssbGrid = days.groupBy(_._1).map { case (_, xs) =>
      val ng = xs.length.toLong
      val sg = xs.map(_._2).sum
      val b = n * sg - ng * sm
      b * b * 1000000L / ng
    }.sum
    val expEta = BigDecimal(ssbGrid / 1e6 / sst)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (dow, nDays, nEv, mean, eta) =>
      assert(nDays == days.count(_._1 == dow))
      assert(nEv == days.filter(_._1 == dow).map(_._2).sum)
      assert(math.abs(mean - BigDecimal(nEv.toDouble / nDays).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      assert(math.abs(eta.get - expEta) < 1e-9, s"dow $dow: $eta vs $expEta")
      assert(eta.get >= 0.0 && eta.get <= 1.0 + 1e-9)
    }
  }

  test("ext_privacy_dp: noise matches the inverse-CDF recompute from the group hash") {
    val got = SparkEntry.queries("ext_privacy_dp")(spark, sf0001)
      .as[(String, Long, Double, Long)].collect()
    assert(got.nonEmpty)
    val mod = graft.operators.Dedup.MinhashMod
    got.foreach { case (lang, n, noise, noised) =>
      // scalar replay of the polyHash fold and the Laplace inverse CDF
      val h = (lang + "|graft-dp-eps").foldLeft(0L)((a, c) => (a * 31 + c) % mod)
      val u = h % 2000001L - 1000000L
      val raw = math.log(1.0 - math.abs(u).toDouble / 1000001.0)
      val grid = math.round((if (u < 0) 2.0 * raw else -2.0 * raw) * 1e6)
      val expNoise = BigDecimal(grid / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(noise - expNoise) < 1e-9, s"$lang: $noise vs $expNoise")
      val trunc = if (grid < 0) -((-grid) / 1000000L) else grid / 1000000L
      assert(noised == n + trunc, s"$lang: noised count must add the grid noise")
    }
  }

  test("ext_events_rfm: scores in 1..4, tie-coherent, cells conserve users and cents") {
    val rows = SparkEntry.queries("ext_events_rfm")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (rs, fs, ms, _, _, _, _) =>
      assert(rs >= 1 && rs <= 4 && fs >= 1 && fs <= 4 && ms >= 1 && ms <= 4)
    }
    val u = Tables.events(spark, sf0001)
      .where(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("c"))
      .as[(Long, Long)].collect()
    assert(rows.map(_._4).sum == u.length, "cells must partition the purchasers")
    assert(rows.map(_._6).sum == u.map(_._2).sum, "cells must conserve revenue")
    // tie-coherence on the monetary axis: equal cent totals can never land
    // in different m_scores, so distinct m_scores <= distinct cent values
    assert(rows.map(_._3).distinct.length <= u.map(_._2).distinct.length)
    rows.foreach { case (_, _, _, nu, _, cents, avg) =>
      val expected = (cents * 100 / nu) / 10000.0
      assert(math.abs(avg - BigDecimal(expected).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("acfFromDaily wide: correct at residual magnitudes where BIGINT products overflow") {
    import graft.operators.Monitoring
    // daily counts ~4e9: residual r = n*y - S ~ 1e10-4e10, so r*r ~ 1e20-1e21
    // >> Long.MaxValue (9.2e18) — the 100 TB telemetry magnitude the
    // DECIMAL(38,0) swap exists for
    val ys = Seq(4000000000L, 100L, 3900000000L, 200L, 4100000000L,
      50L, 4000000123L, 7L, 3999999999L, 42L)
    val daily = ys.zipWithIndex.map { case (y, i) => (i.toLong, y) }
      .toDF("day", "y")
    val got = Monitoring.acfFromDaily(daily, maxLag = 2, wide = true)
      .orderBy("lag").collect()
    // exact expectation via BigInt
    val n = BigInt(ys.size); val sm = ys.map(BigInt(_)).sum
    val r = ys.map(y => n * y - sm)
    val den = r.map(x => x * x).sum
    def acf(l: Int): Double = {
      val num = (0 until ys.size - l).map(i => r(i) * r(i + l)).sum
      (BigDecimal(num) / BigDecimal(den)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.length == 2)
    got.foreach { row =>
      val l = row.getLong(0).toInt
      assert(row.getLong(1) == ys.size - l)
      // strongly alternating series: the value is far from 0, so a silent
      // BIGINT wraparound could not accidentally land near the right answer
      assert(math.abs(row.getDouble(2) - acf(l)) < 2e-6,
        s"lag $l: got ${row.getDouble(2)}, want ${acf(l)}")
    }
    assert(math.abs(got.head.getDouble(2) - (-0.9)) < 0.2,
      "lag-1 ACF of an alternating series must be strongly negative")
  }

  test("decayMass wide: exact where the BIGINT sum would overflow (scaleBits=62)") {
    import graft.operators.Monitoring
    // 4 rows at k=0 with 62-bit scale: sum = 4 * 2^62 = 2^64 — two rows
    // already exceed Long.MaxValue; DECIMAL(38,0) carries it exactly
    val k = Seq(("a", 0L), ("a", 0L), ("a", 0L), ("a", 0L),
      ("b", 1L), ("b", 62L)).toDF("g", "k")
    val got = Monitoring.decayMass(k, "g", scaleBits = 62, wide = true)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got("a") == ((4L, 4.0)), s"got ${got("a")}")
    // b: 2^61/2^62 + 2^0/2^62 = 0.5 + ~2e-19 -> rounds to 0.5
    assert(got("b") == ((2L, 0.5)))
    // and the narrow form at the default 30 bits agrees with wide on
    // non-overflowing input (bit-identical where both are exact)
    val small = Seq(("x", 0L), ("x", 3L), ("y", 30L)).toDF("g", "k")
    val wideR = Monitoring.decayMass(small, "g", 30, wide = true)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val narrowR = Monitoring.decayMass(small, "g", 30, wide = false)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(wideR == narrowR)
    assert(wideR("x") == 1.125)
  }
}
