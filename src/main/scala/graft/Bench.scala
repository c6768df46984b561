package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** (name, coldSec, warmSec, succeeded) per query. */
  type Result = (String, Double, Double, Boolean)

  /** Cumulative shuffle/spill byte counters across all tasks — snapshotted
    * around each query so a bench line carries the work a query MOVED, not
    * just how long it took. Contention-vs-regression adjudication (needed
    * in rounds 3 and 5) becomes mechanical: same shuffle bytes + slower
    * wall-clock = machine contention; more bytes = a real plan change.
    * Listener delivery is async, so per-query attribution can lag a few
    * tasks into the next query's window — MB-scale reading only.
    */
  private final class ShuffleTally extends org.apache.spark.scheduler.SparkListener {
    val write = new java.util.concurrent.atomic.AtomicLong
    val read = new java.util.concurrent.atomic.AtomicLong
    val spill = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        spill.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
      }
    }
    def snapshot: (Long, Long, Long) = (write.get, read.get, spill.get)
  }

  private def fmt(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
  private def fmt2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
  private def toJson(vs: Seq[(String, Double)], f: Double => String = fmt) =
    vs.map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")

  /** Deterministic short keys for the per-query map: first segment's
    * first 3 chars + 2-char initials of the remaining segments, then
    * de-collided by a numeric suffix in sorted-name order. ~10 chars vs
    * ~18 for full names — the step that keeps per-query values on the
    * canonical line out to ~110 queries.
    */
  private[graft] def abbrev(names: Seq[String]): Map[String, String] = {
    val used = scala.collection.mutable.Set[String]()
    names.sorted.map { n =>
      val segs = n.split('_')
      val a = segs.head.take(3) + segs.tail.map(_.take(2)).mkString
      var cand = a; var i = 1
      while (used(cand)) { cand = a + i; i += 1 }
      used += cand
      n -> cand
    }.toMap
  }

  /** Canonical-line builder, exposed for BenchLineSpec. The driver keeps
    * only the final ~2000 chars of process output and json-parses the
    * LAST line, so this must stay under 1900 chars (round-1 lesson).
    * Degrade ladder, richest representation that fits:
    *   1. full query names + q_shuffle_mb for the 16 slowest;
    *   2. abbreviated query names (see [[abbrev]]) at 2-decimal values
    *      (10 ms grain — ample for per-query comparisons; bench_detail
    *      keeps full names at 3 decimals) + q_shuffle_mb;
    *   3. the TOP-N-SLOWEST queries (N adaptive: 80, 72, … 24), plus a
    *      `q_omitted` count, keeping FULL telemetry — the fast tail is
    *      what drops first (those times are on the bench_detail line),
    *      because q_shuffle_mb / q_isolated / q_isolated_prev are the
    *      adjudicators and a 0.7-s tail query's warm time is not;
    *   4. top-80 + q_shuffle_mb + q_isolated + q_isolated_shuffle_mb
    *      without q_isolated_prev;
    *   5. top-80 + q_isolated without q_shuffle_mb (the isolated
    *      shuffle bytes drop with the suite's);
    *   6. top-80 without q_isolated;
    *   7. no per-query map;
    *   8. error list collapsed to a count (unbounded when every query
    *      fails).
    * q_shuffle_mb outranks the fast-tail times on purpose: per-query
    * shuffle bytes are THE contention-vs-regression adjudicator (round-6
    * lesson — the kcore re-run would have been a pure diff had the map
    * survived the driver's 2-line tail), and any query that regresses
    * enters the slowest-80 automatically.
    * q_isolated carries the end-of-run one-at-a-time re-measure of the
    * slowest queries (fresh GC, nothing else in flight): at 200+ queries
    * the in-suite numbers run 1.5-2× above isolated truth from suite
    * contention, and stamping both on the line makes the adjudication a
    * pure diff — suite time >> isolated time with equal shuffle bytes =
    * contention, not a plan regression.
    * q_isolated_prev carries the PRIOR round's isolated numbers for the
    * same roster (parsed from the newest BENCH_r*.json), so the
    * round-over-round isolated diff lives in ONE artifact instead of
    * two BENCH files (round-9 lesson: the append-spike adjudication
    * needed both).
    * cpus/state stamp the protocol: a local[8] or state-dir-reusing run
    * must never be conflated with the driver's local[32] rebuilt-state
    * numbers (round-9 reporting lesson).
    */
  private[graft] def canonicalLine(results: Seq[Result], sfDir: String,
      filteredOf: Option[Int] = None, shuffleMb: Option[Double] = None,
      qShuffleMb: Map[String, Double] = Map.empty,
      qIsolated: Map[String, Double] = Map.empty,
      qIsolatedPrev: Map[String, Double] = Map.empty,
      qIsolatedShuffleMb: Map[String, Double] = Map.empty,
      cpus: Option[String] = None, state: Option[String] = None): String = {
    val warmTotal = results.map(_._3).sum
    val coldTotal = results.map(_._2).sum
    val errs = results.filterNot(_._4).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    // Subset marker: a SPARK_GRAFT_ONLY run must never masquerade as a
    // full-suite total — every ladder rung carries "filtered":"picked/total"
    // so a partial run is visibly partial to anything parsing the line.
    val fmark = filteredOf.map(t => s""","filtered":"${results.size}/$t"""").getOrElse("") +
      shuffleMb.map(v => s""","shuffle_mb":${fmt2(v)}""").getOrElse("") +
      cpus.map(c => s""","cpus":"$c"""").getOrElse("") +
      state.map(s => s""","state":"$s"""").getOrElse("")
    def line(qs: String, errsJson: String, extra: String = "") =
      s"""{"metric":"total","value":${fmt(warmTotal)},"unit":"sec","queries":$qs,"cold_total":${fmt(coldTotal)}$extra$fmark,"errors":$errsJson,"sf":"${sfDir.take(120)}"}"""
    val short = abbrev(results.map(_._1))
    val bySlow = results.sortBy(r => (-r._3, r._1))
    val slowest80 = bySlow.take(80).sortBy(_._1)
    val shuffle16 = bySlow.take(16).map(_._1)
      .filter(qShuffleMb.contains).sorted
    def shuffleJson(key: String => String) =
      if (shuffle16.isEmpty) ""
      else s""","q_shuffle_mb":${toJson(shuffle16.map(n => key(n) -> qShuffleMb(n)), fmt2)}"""
    def isolatedJson(key: String => String) =
      if (qIsolated.isEmpty) ""
      else s""","q_isolated":${toJson(qIsolated.toSeq.sortBy(_._1).map { case (n, v) => key(n) -> v }, fmt2)}"""
    // round-12: isolated reruns carry their OWN shuffle bytes, so the
    // isolated-vs-isolated round diff adjudicates mechanically (same
    // bytes + slower clock = host window), exactly like the suite's —
    // round 11's uniform isolated drift had no bytes to falsify against
    def isoShufJson(key: String => String) =
      if (qIsolatedShuffleMb.isEmpty) ""
      else s""","q_isolated_shuffle_mb":${toJson(qIsolatedShuffleMb.toSeq.sortBy(_._1).map { case (n, v) => key(n) -> v }, fmt2)}"""
    // prior-round isolated numbers resolved for THIS round's roster:
    // prior keys may be full or (rung-2+) abbreviated, so look up both
    val prevPairs = qIsolated.keys.toSeq.sorted.flatMap(n =>
      qIsolatedPrev.get(n).orElse(qIsolatedPrev.get(short(n))).map(n -> _))
    def prevJson(key: String => String) =
      if (prevPairs.isEmpty) ""
      else s""","q_isolated_prev":${toJson(prevPairs.map { case (n, v) => key(n) -> v }, fmt2)}"""
    val omitted = s""","q_omitted":${math.max(0, results.size - 80)}"""
    // adaptive rung 3: shed fast-tail per-query times in steps of 8
    // while FULL telemetry still fits (round-12: the floor dropped
    // 48 → 24 when the third isolated map + 250-query registry pushed
    // the full-telemetry rung past 1900 at 48 — the slowest 24 warm
    // times beat the fast tail's, and every shed time is still on
    // bench_detail)
    val adaptive = Seq(80, 72, 64, 56, 48, 40, 32, 24).map { n =>
      line(toJson(bySlow.take(n).sortBy(_._1).map(r => short(r._1) -> r._3), fmt2),
        errs, s""","q_omitted":${math.max(0, results.size - n)}""" +
          shuffleJson(short) + isolatedJson(short) + isoShufJson(short) +
          prevJson(short))
    }
    (Seq(
      line(toJson(results.map(r => r._1 -> r._3)), errs,
        shuffleJson(identity) + isolatedJson(identity) +
          isoShufJson(identity) + prevJson(identity)),
      line(toJson(results.sortBy(_._1).map(r => short(r._1) -> r._3), fmt2),
        errs, shuffleJson(short) + isolatedJson(short) + isoShufJson(short) +
          prevJson(short))) ++
      adaptive ++ Seq(
      line(toJson(slowest80.map(r => short(r._1) -> r._3), fmt2), errs,
        omitted + shuffleJson(short) + isolatedJson(short) + isoShufJson(short)),
      line(toJson(slowest80.map(r => short(r._1) -> r._3), fmt2), errs,
        omitted + isolatedJson(short)),
      line(toJson(slowest80.map(r => short(r._1) -> r._3), fmt2), errs, omitted),
      line("{}", errs, s""","q_omitted":${results.size}"""),
      line("{}", s"""["${results.count(!_._4)}_queries_failed"]""")))
      .find(_.length <= 1900).get
  }

  /** Extract isolated-re-measure numbers from a prior round's BENCH
    * artifact text. Two fragment kinds exist: bench_detail's
    * `queries_isolated` (FULL query names) and the canonical line's
    * `q_isolated` (keys may be abbreviated on rung-2+ lines). Full-name
    * pairs WIN outright: when any `queries_isolated` pair parses, the
    * abbreviated pairs are dropped — abbreviations shift whenever the
    * roster changes, so a prior round's "extdeca" can silently resolve
    * to a DIFFERENT query under this round's abbrev table (round-10
    * ADVICE). Abbreviated pairs are the fallback only when the detail
    * fragment was truncated out of the artifact tail entirely. Pairs
    * are regex-scavenged, not JSON-parsed (the tail may be cut mid-map);
    * best-effort by design: an unreadable artifact yields an empty map,
    * never a failed bench.
    */
  private[graft] def parsePrevIsolated(text: String): Map[String, Double] = {
    // the artifact embeds the process tail as a JSON string, so quotes
    // arrive backslash-escaped (\"q_isolated\":...) — tolerate both
    val frag = "\\\\?\"(q_isolated|queries_isolated)\\\\?\":\\{([^}]*)".r
    val pair = "\\\\?\"([A-Za-z0-9_]+)\\\\?\":([0-9]+(?:\\.[0-9]+)?)".r
    val byKind = frag.findAllMatchIn(text).toSeq.map(m => m.group(1) ->
      pair.findAllMatchIn(m.group(2)).map(p => p.group(1) -> p.group(2).toDouble).toSeq)
    val full = byKind.filter(_._1 == "queries_isolated").flatMap(_._2)
    if (full.nonEmpty) full.toMap
    else byKind.flatMap(_._2).toMap
  }

  /** Pick the prior round's BENCH artifact from (roundNumber, path)
    * candidates. `currentRound` (parsed from VERDICT.md's "round N"
    * header, + 1) caps the pick: on a SAME-round re-run the newest
    * artifact is this round's OWN output, and q_isolated_prev seeded
    * from it would diff the round against itself (round-10 ADVICE).
    */
  private[graft] def pickPrevBench(candidates: Seq[(Int, String)],
      currentRound: Option[Int]): Option[String] =
    candidates.filter(c => currentRound.forall(c._1 < _))
      .sortBy(-_._1).headOption.map(_._2)

  /** The in-progress round, inferred from the judge's VERDICT.md header
    * ("# VERDICT — round N" describes the PRIOR round, so the current
    * round is N + 1). None when no verdict is readable (round 1, or a
    * stripped checkout) — the cap is then skipped.
    */
  private[graft] def parseVerdictRound(text: String): Option[Int] =
    "VERDICT\\s*[—–-]+\\s*round\\s+(\\d+)".r.findFirstMatchIn(text)
      .map(_.group(1).toInt + 1)

  /** Locate and parse the prior round's BENCH_r*.json (or the
    * SPARK_GRAFT_PREV_BENCH override, which always wins). Best-effort:
    * any failure is an empty map.
    */
  private def prevIsolated(): Map[String, Double] =
    try {
      val file = sys.env.get("SPARK_GRAFT_PREV_BENCH")
        .map(new java.io.File(_))
        .orElse {
          val rx = "BENCH_r(\\d+)\\.json".r
          val round = try {
            val v = new java.io.File("VERDICT.md")
            if (v.isFile) {
              val src = scala.io.Source.fromFile(v, "UTF-8")
              try parseVerdictRound(src.mkString) finally src.close()
            } else None
          } catch { case _: Throwable => None }
          val cands = Option(new java.io.File(".").listFiles())
            .getOrElse(Array.empty).toSeq
            .flatMap(f => f.getName match {
              case rx(n) => Some((n.toInt, f.getPath))
              case _ => None
            })
          pickPrevBench(cands, round).map(new java.io.File(_))
        }
      file.filter(_.isFile).map { f =>
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try parsePrevIsolated(src.mkString) finally src.close()
      }.getOrElse(Map.empty)
    } catch { case _: Throwable => Map.empty }

  /** Validate the SPARK_GRAFT_ONLY subset filter against the live query
    * registry: Right(None) = unset (full suite), Right(Some(names)) = a
    * non-empty, fully-known subset, Left(message) = reject the run.
    */
  private[graft] def resolveFilter(raw: Option[String],
      known: Set[String]): Either[String, Option[Set[String]]] =
    raw match {
      case None => Right(None)
      case Some(s) =>
        val names = s.split(',').map(_.trim).filter(_.nonEmpty).toSet
        val unknown = names -- known
        if (names.isEmpty)
          Left(s"SPARK_GRAFT_ONLY is set but selects no queries: '$s'")
        else if (unknown.nonEmpty)
          Left("SPARK_GRAFT_ONLY names unknown queries: " +
            unknown.toSeq.sorted.mkString(", "))
        else Right(Some(names))
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // dormant compat for TIMESTAMP(NANOS) fixture vintages (see Verify)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Each query runs four times: the first (cold) execution carries
    // one-time whole-stage-codegen compilation + JIT for that plan shape —
    // real, but not steady-state throughput. value/queries are the best of
    // the three warm runs (min damps scheduler/GC jitter); cold numbers
    // ride along on a diagnostic line.
    // (seconds, succeeded) — a query that throws must NOT masquerade as a
    // fast run; it is reported in the errors list
    def timed(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    // Local-iteration filter: SPARK_GRAFT_ONLY=q1,q2 benches a subset
    // (the driver never sets it, so driver runs stay full-suite). A typo'd
    // or empty filter fails LOUDLY — silently benching zero queries would
    // emit a 0.000 total with empty errors, which parses as a pass.
    val only = resolveFilter(sys.env.get("SPARK_GRAFT_ONLY"),
      SparkEntry.queries.keySet) match {
      case Right(o) => o
      case Left(msg) => System.err.println(s"[bench] $msg"); sys.exit(2); None
    }
    val picked = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val tally = new ShuffleTally
    spark.sparkContext.addSparkListener(tally)
    val shuffleMb = scala.collection.mutable.LinkedHashMap[String, Double]()
    val results: Seq[Result] = picked.map { case (name, fn) =>
      val before = tally.snapshot
      val (cold, okCold) = timed(fn)
      val warm = Seq.fill(3)(timed(fn))
      // Isolation breather between queries, OUTSIDE the timed window:
      // localCheckpoint blocks from finished runs are only reclaimed by
      // the ContextCleaner once the owning DataFrames are GC'd, so a
      // ~400-run session otherwise accumulates hundreds of dead blocks in
      // the block manager — measured to inflate later queries several-fold
      // (ensemble: 16.7 s mid-bench vs 3.7-5 s isolated) via memory
      // pressure. An explicit GC per query keeps every measurement
      // near-isolated; steady-state per-query cost is unaffected.
      System.gc()
      // per-execution shuffle write MB (4 runs averaged); the GC pause
      // above doubles as listener-queue drain time
      val after = tally.snapshot
      shuffleMb(name) = (after._1 - before._1) / 4.0 / 1e6
      (name, cold, warm.map(_._1).min, okCold && warm.forall(_._2))
    }
    // End-of-run ISOLATED re-measure of the slowest queries: one at a
    // time, fresh GC before each, nothing else in flight — the number a
    // controlled single-query re-run would produce. The suite numbers
    // above carry accumulated contention (~1.5-2× at 200+ queries even
    // with the per-query GC breathers); stamping both makes the
    // contention-vs-regression adjudication a pure diff on the line.
    val isolatedN = 8
    // Adjudication WATCHLIST: queries flagged same-bytes-slower-clock in
    // a prior round ride the isolated re-measure regardless of their
    // current rank, so consecutive rounds' lines carry a pure isolated
    // diff for them (SPARK_GRAFT_ISOLATE=a,b adds more ad hoc). Standing
    // members: the round-8 trio whose suite times rose with unchanged
    // shuffle bytes, plus the round-9 pair (ext_ann_hnsw_append's 51.8 s
    // driver-run spike vs 8.45 s isolated at EQUAL shuffle bytes — not
    // reproducible at the same protocol and suite position locally, see
    // PLANS.md — and ext_dedup_prf's same-signature wobble).
    // ... plus the round-10 incremental-dedup pair (2.97→3.71 / 2.40→2.77
    // in-suite with no isolated history to adjudicate against — r10
    // verdict watch-nit; their first isolated baseline landed round 11
    // at 1.74/2.10 with in-suite recovery — contention, as the flat
    // shuffle bytes suggested) and ext_ann_recall (4.48→5.61 in-suite at
    // EQUAL 16.6 MB shuffle in round 11 — same signature, first isolated
    // baseline 5.47 stamped; keep it on the roster for the diff)
    // ... plus the round-11 pair the verdict flagged without an isolated
    // baseline to falsify against: ext_dedup_simhash tripled in-suite
    // (1.07→3.52) and ext_layout_zorder_phys drifted 1.8× — both at
    // byte-identical suite shuffle (the contention fingerprint); their
    // isolated numbers land on the line from round 12 on
    // ... plus the round-12 pair flagged >2.5× in-suite with no isolated
    // baseline to falsify against (ext_cc_bfs, ext_dedup_tfidfcos) —
    // first isolated numbers land from round 13 on
    val watchlist = Set("ext_split_leakfree", "ext_dedup_canonical",
      "ext_sketch_quantile", "ext_ann_hnsw_append", "ext_dedup_prf",
      "ext_dedup_incremental", "ext_dedup_incr_persist",
      "ext_ann_recall", "ext_dedup_simhash", "ext_layout_zorder_phys",
      "ext_cc_bfs", "ext_dedup_tfidfcos") ++
      sys.env.get("SPARK_GRAFT_ISOLATE").toSeq
        .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    val roster = (results.filter(_._4).sortBy(r => (-r._3, r._1))
      .take(isolatedN).map(_._1) ++
      results.filter(r => r._4 && watchlist(r._1)).map(_._1)).distinct
    val qIsolated = scala.collection.mutable.LinkedHashMap[String, Double]()
    val qIsolatedShuffleMb = scala.collection.mutable.LinkedHashMap[String, Double]()
    roster.foreach { name =>
      System.gc()
      val before = tally.snapshot
      val runs = Seq.fill(2)(timed(SparkEntry.queries(name)))
      // GC doubles as listener-queue drain before the shuffle snapshot,
      // exactly like the suite loop's per-query accounting
      System.gc()
      val after = tally.snapshot
      if (runs.forall(_._2)) {
        qIsolated(name) = runs.map(_._1).min
        qIsolatedShuffleMb(name) = (after._1 - before._1) / 2.0 / 1e6
      }
    }
    // diagnostic line (may scroll off the tail): cold per-query map with
    // FULL names, plus the error list
    val errs = results.filterNot(_._4).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val totalShuffleMb = shuffleMb.values.sum
    println(s"""{"bench_detail":{"cold_total":${fmt(results.map(_._2).sum)},"queries_cold":${toJson(results.map(r => r._1 -> r._2))},"queries_shuffle_mb":${toJson(shuffleMb.toSeq, fmt2)},"queries_isolated":${toJson(qIsolated.toSeq)},"queries_isolated_shuffle_mb":${toJson(qIsolatedShuffleMb.toSeq, fmt2)},"errors":$errs}}""")
    println(canonicalLine(results, sfDir,
      only.map(_ => SparkEntry.queries.size), Some(totalShuffleMb),
      shuffleMb.toMap, qIsolated.toMap, prevIsolated(),
      qIsolatedShuffleMb.toMap,
      cpus = Some(cpus),
      state = Some(if (sys.env.contains("SPARK_GRAFT_STATE_DIR")) "reused"
        else "rebuilt")))
    spark.stop()
  }
}
