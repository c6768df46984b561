package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DETERMINISTIC cardinality/frequency sketches with built-in accuracy
  * audits — the approximate counters a 100 TB pipeline runs where exact
  * answers would shuffle the key universe, paired here with the exact
  * answer so the estimator error is a measured number, not a trusted
  * claim (the same audit discipline as Dedup.minhashEstimateAudit).
  *
  * Unlike approx_count_distinct / the HLL family — whose register values
  * are engine-specific, so their queries can only be rows-checked — both
  * sketches here are built from the repo's reproducible integer hashes
  * (Knuth multiplicative mix, polynomial character fold mod 2^31-1), so
  * the DuckDB oracle computes bit-identical sketch state and the
  * CORRECTNESS gate hashes estimate columns too.
  *
  * Mirrors the aggregate/summary surface of the reference's groupby-size
  * blocks (/root/reference/dmCustomerProc.py:42-55) at the scale where
  * exact distinct-counting stops being free.
  */
object Sketches {

  /** Knuth multiplicative constant (2^32 · conjugate golden ratio). */
  val KnuthA = 2654435761L
  /** Shared prime modulus (2^31 - 1), same family as Dedup.MinhashMod. */
  val Mod: Long = Dedup.MinhashMod

  /** Integer-key bucket hash: ((k mod P) · A + salt) mod P, then mod B.
    * Max intermediate (P-1)·A < 2^63 — overflow-free BIGINT arithmetic
    * in any engine.
    */
  def bucketOf(key: Column, buckets: Int, salt: Long): Column =
    (((key % Mod) * KnuthA + salt) % Mod) % buckets

  /** LINEAR-COUNTING distinct estimate per group with exact-count audit:
    * hash each key into one of `buckets` slots, count occupied slots m,
    * estimate n̂ = B·ln(B/(B-m)) (Whang et al., the load-factor-corrected
    * occupancy inversion). Scale story: the exact side shuffles every
    * distinct key; the sketch side is a FIXED-width bitmap per group —
    * B·groups bits of state, map-side combinable, mergeable across days
    * by bitwise OR (the streaming twin's state). Emitted per group:
    * n_exact, n_occupied, est (NULL at saturation m = B — the signal to
    * widen B), rel_err vs exact.
    *
    * Determinism: the bucket hash is exact integer arithmetic; ln runs
    * once on the same rational B/(B-m) in both engines (≤1 ulp apart,
    * ~1e-11 absolute here) and the estimate is rounded at 4 dp — seven
    * orders of magnitude above the libm disagreement floor. rel_err is
    * derived from the ROUNDED estimate so the audit chain shares one
    * quantization point.
    */
  def linearCountDistinct(rows: DataFrame, keyCol: String, groupCol: String,
      buckets: Int): DataFrame = {
    val keys = rows.select(col(groupCol), col(keyCol).as("__k")).distinct()
    keys
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_exact"),
        countDistinct(bucketOf(col("__k"), buckets, 7L)).as("n_occupied"))
      .withColumn("est",
        when(col("n_occupied") < buckets, estimateExpr(buckets)))
      .withColumn("rel_err",
        when(col("est").isNotNull,
          round(abs(col("est") - col("n_exact")) / col("n_exact"), 4)))
  }

  private def estimateExpr(buckets: Int): Column =
    round(lit(buckets.toDouble) *
      log(lit(buckets.toDouble) / (lit(buckets) - col("n_occupied"))), 4)

  /** The linear-counting sketch STATE in relational form: the distinct
    * (group, bucket) occupancy set — the bitmap as rows. This is what a
    * streaming/incremental pipeline persists per day: fixed-cardinality
    * (≤ groups × buckets), map-side combinable, and mergeable with
    * [[mergeLincountStates]].
    */
  def lincountState(rows: DataFrame, keyCol: String, groupCol: String,
      buckets: Int): DataFrame =
    rows.select(col(groupCol),
      bucketOf(col(keyCol), buckets, 7L).as("bucket")).distinct()

  /** OR-merge of two occupancy states: union + distinct. IDEMPOTENT —
    * keys seen in both inputs set the same bit once, so re-processed or
    * overlapping batches never inflate the estimate (the property an
    * ADDITIVE sketch merge lacks); state(A) ⊕ state(B) ≡ state(A ∪ B)
    * for ANY split of the rows, which is what makes micro-batch
    * boundaries semantically invisible (spec-asserted in
    * StreamingSpec).
    */
  def mergeLincountStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).distinct()

  /** Read the estimate off a persisted/folded occupancy state. Columns
    * match the audit's sketch side ([[linearCountDistinct]] minus the
    * exact columns the state intentionally does not carry).
    */
  def lincountEstimate(state: DataFrame, groupCol: String,
      buckets: Int): DataFrame =
    state.groupBy(groupCol)
      .agg(count(lit(1)).as("n_occupied"))
      .withColumn("est",
        when(col("n_occupied") < buckets, estimateExpr(buckets)))

  /** PAIRWISE-OVERLAP ESTIMATION from lincount states with exact audit
    * — the audience-overlap / source-intersection statistic
    * (inclusion–exclusion over the occupancy bitmaps): for groups A, B,
    * n̂(A ∩ B) = n̂(A) + n̂(B) − n̂(A ∪ B), where the union estimate reads
    * the OR of the two bitmaps — and the OR needs NO third pass, because
    * |bits(A) ∪ bits(B)| = occA + occB − |bits(A) ∩ bits(B)| and the
    * shared-bit count is an equi-join of the two fixed-width states.
    *
    * Scale story: the exact side self-joins the distinct (group, key)
    * frame on the KEY — for G groups that is G·(G−1)/2 distinct-shuffles
    * over the key universe, the thing that stops being affordable first.
    * The sketch side touches the corpus ONCE (the shared state build,
    * ≤ G·B rows, map-side combinable, the same state the daily lincount
    * loop already persists) and every pair statistic after that reads
    * bitmap-sized frames. Estimates go NULL at saturation (any occupancy
    * = B) — the widen-B signal, not a correctness cliff.
    *
    * Determinism: occupancy/shared-bit/exact counts are exact BIGINTs;
    * each ln-estimate is rounded at 4 dp ([[estimateExpr]]'s
    * quantization point) and the overlap estimate is derived FROM THE
    * ROUNDED per-set estimates, so both engines subtract identical
    * doubles. `err` is signed (inclusion–exclusion can under- or
    * over-shoot) off the same rounded chain.
    */
  def lincountOverlapAudit(rows: DataFrame, keyCol: String, groupCol: String,
      buckets: Int): DataFrame = {
    // ONE corpus scan: the distinct (group, key) reduce is pinned with
    // localCheckpoint so the self-joined audit branches and the state
    // build all re-read it instead of re-scanning the rows (ScaleSpec
    // pins scans == 1); the ≤ G·B-row state is pinned too so the
    // shared-bit self-join reads it twice for free. At 100 TB the audit
    // (and with it the keys frame) is dropped and only the tiny state
    // build remains.
    val keys = rows.select(col(groupCol).as("__g"), col(keyCol).as("__k"))
      .distinct().localCheckpoint()
    val state = keys.select(col("__g"),
      bucketOf(col("__k"), buckets, 7L).as("bucket")).distinct()
      .localCheckpoint()
    val exact = keys.as("ka").join(keys.as("kb"),
        col("ka.__k") === col("kb.__k") && col("ka.__g") < col("kb.__g"))
      .groupBy(col("ka.__g").as("grp_a"), col("kb.__g").as("grp_b"))
      .agg(count(lit(1)).as("n_exact_overlap"))
    pairOverlapFrame(state, buckets)
      .join(exact, Seq("grp_a", "grp_b"), "left")
      .select(col("grp_a"), col("grp_b"),
        coalesce(col("n_exact_overlap"), lit(0L)).as("n_exact_overlap"),
        col("occ_a"), col("occ_b"), col("n_shared"),
        col("est_a"), col("est_b"), col("est_union"), col("est_overlap"))
      .withColumn("err",
        when(col("est_overlap").isNotNull,
          round(col("est_overlap") -
            coalesce(col("n_exact_overlap"), lit(0L)), 4)))
  }

  /** Pairwise overlap estimates read off a (possibly merged / streamed
    * / persisted) occupancy state with columns (`groupCol`, bucket) —
    * [[lincountOverlapAudit]] minus the exact audit a state
    * intentionally cannot provide. Because state(A) ⊕ state(B) ≡
    * state(A ∪ B) (idempotent OR), the estimates off folded daily or
    * micro-batch states are IDENTICAL to the one-shot audit's
    * (spec-asserted in StreamingSpec).
    */
  def lincountOverlapEstimate(state: DataFrame, groupCol: String,
      buckets: Int): DataFrame =
    pairOverlapFrame(
      state.select(col(groupCol).as("__g"), col("bucket")), buckets)

  /** The shared pair-statistics core over a (__g, bucket) state frame:
    * occupancies, shared bits, and the inclusion–exclusion estimate
    * chain (each est rounded at 4 dp BEFORE the subtraction — the
    * oracle-parity quantization discipline).
    */
  private def pairOverlapFrame(state: DataFrame, buckets: Int): DataFrame = {
    val occ = state.groupBy("__g").agg(count(lit(1)).as("occ"))
    // every unordered group pair, from the |G|-sized occupancy frame
    val pairs = occ.select(col("__g").as("grp_a"), col("occ").as("occ_a"))
      .join(occ.select(col("__g").as("grp_b"), col("occ").as("occ_b")),
        col("grp_a") < col("grp_b"))
    val shared = state.as("sa").join(state.as("sb"),
        col("sa.bucket") === col("sb.bucket") && col("sa.__g") < col("sb.__g"))
      .groupBy(col("sa.__g").as("grp_a"), col("sb.__g").as("grp_b"))
      .agg(count(lit(1)).as("n_shared"))
    def est(occCol: Column): Column =
      when(occCol < buckets, round(lit(buckets.toDouble) *
        log(lit(buckets.toDouble) / (lit(buckets) - occCol)), 4))
    pairs
      .join(shared, Seq("grp_a", "grp_b"), "left")
      .na.fill(0L, Seq("n_shared"))
      .withColumn("est_a", est(col("occ_a")))
      .withColumn("est_b", est(col("occ_b")))
      .withColumn("est_union",
        est(col("occ_a") + col("occ_b") - col("n_shared")))
      .withColumn("est_overlap",
        when(col("est_a").isNotNull && col("est_b").isNotNull
            && col("est_union").isNotNull,
          round(col("est_a") + col("est_b") - col("est_union"), 4)))
  }

  /** JOIN-SIZE ESTIMATION from count sketches with exact audit — the
    * AMS/CMS inner-product statistic a query optimizer consults before
    * picking a join strategy: |A ⋈ B| on a key equals Σ_k cntA(k)·cntB(k),
    * and the inner product of the two sides' count-min rows,
    * minimized over depth, upper-bounds it (every colliding key pair
    * adds nonnegative mass, so `overcount` ≥ 0 provably — spec-pinned).
    *
    * Scale shape: ONE corpus scan builds the per-key (cntA, cntB) frame
    * via conditional aggregation (sideA/sideB are predicates over the
    * same rows — the two-vintage / two-day case); the sketches are
    * depth×width integer grids off that frame, and the estimate is a
    * (depth·width)-row join of grid against grid. The exact side is
    * Σ cntA·cntB over the same frame — at 100 TB you keep only the
    * grids (a few KB per side, mergeable by vector ADD across days)
    * and never materialize the per-key frame at all.
    *
    * Determinism: all-BIGINT — key mix, bucket arithmetic, counter
    * sums, inner products. Max intermediate: counter ≤ |rows|,
    * product of two counters ≤ |rows|² — well under 2^63 at any SF
    * this audit would run at (the production path drops the audit).
    */
  def joinSizeAudit(rows: DataFrame, keyCol: String, sideA: Column,
      sideB: Column, width: Int, depth: Int): DataFrame = {
    val kc = rows.groupBy(col(keyCol).as("__k"))
      .agg(sum(when(sideA, 1L).otherwise(0L)).as("ca"),
        sum(when(sideB, 1L).otherwise(0L)).as("cb"))
      .withColumn("__sid", ((col("__k") % Mod) * KnuthA + 7) % Mod)
      .localCheckpoint()
    def grid(cntCol: String, outCol: String): DataFrame = {
      val stackExpr = (0 until depth).map { r =>
        s"$r, ((__sid * ${2L * r + 3L} + ${5L * r + 1L}) % $Mod) % $width"
      }.mkString(", ")
      kc.where(col(cntCol) > 0)
        .selectExpr(cntCol, s"stack($depth, $stackExpr) AS (r, bucket)")
        .groupBy("r", "bucket").agg(sum(col(cntCol)).as(outCol))
    }
    // Per-depth-row inner products, LEFT-joined from a depth spine: a row
    // whose two grids share no bucket has inner product 0 (not an absent
    // row) — without the spine a fully-disjoint pair of sketches would
    // leave the min() over an empty frame (NULL n_est, and a 1-row-vs-0-row
    // divergence against the oracle's GROUP BY form).
    val perRow = grid("ca", "cntA").join(grid("cb", "cntB"), Seq("r", "bucket"))
      .groupBy("r").agg(sum(col("cntA") * col("cntB")).as("__est"))
    val spine = rows.sparkSession.range(depth)
      .select(col("id").cast("int").as("r"))
    val ip = spine.join(perRow, Seq("r"), "left")
      .na.fill(0L, Seq("__est"))
      .agg(min(col("__est")).as("n_est"))
    val exact = kc.agg(sum(col("ca") * col("cb")).as("n_exact"))
    exact.crossJoin(broadcast(ip))
      .select(col("n_exact"), col("n_est"),
        (col("n_est") - col("n_exact")).as("overcount"))
  }

  /** COUNT-MIN frequency sketch with exact-count audit over the word
    * stream: `depth` hash rows × `width` counters, est(w) = min over
    * rows of its counter — always an OVERcount (each counter adds the
    * mass of every colliding word), so `overcount` is provably ≥ 0
    * (spec-pinned). Scale story: the sketch is a fixed depth×width
    * integer grid built by ONE map-side-combinable aggregate over the
    * distinct-word vocabulary WITH COUNTS AS WEIGHTS (the BPE-trainer
    * discipline — raw text is tokenized once, never re-touched);
    * estimates for the audited top-k words come from a k-row broadcast
    * joined against the (depth·width)-row counter table. The exact side
    * is the same vocabulary aggregate the sketch consumed — at 100 TB
    * you drop it and keep only the grid.
    */
  def countMinAudit(docs: DataFrame, idCol: String, textCol: String,
      width: Int, depth: Int, topK: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val vocab = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("__sid", Dedup.polyHash(col("word")))
      .persist()

    def rowBucket(sid: Column, r: Int): Column =
      ((sid * (2L * r + 3L) + (5L * r + 1L)) % Mod) % width

    val stackExpr = (0 until depth).map { r =>
      s"$r, ((__sid * ${2L * r + 3L} + ${5L * r + 1L}) % $Mod) % $width"
    }.mkString(", ")
    val counters = vocab
      .selectExpr("cnt", s"stack($depth, $stackExpr) AS (r, bucket)")
      .groupBy("r", "bucket").agg(sum(col("cnt")).as("counter"))

    val top = vocab
      .orderBy(col("cnt").desc, col("word"))
      .limit(topK)
    val probes = (0 until depth).foldLeft(top) { (df, r) =>
      df.withColumn(s"__b$r", rowBucket(col("__sid"), r))
    }
    val est = (0 until depth).foldLeft(broadcast(probes): DataFrame) { (df, r) =>
      df.join(counters.select(col("r"), col("bucket").as(s"__b$r"),
          col("counter").as(s"__c$r")).where(col("r") === r).drop("r"),
        Seq(s"__b$r"))
    }
    val minEst = (0 until depth).map(r => col(s"__c$r")).reduce(least(_, _))
    val out = est.select(col("word"), col("cnt").as("n_exact"),
        minEst.as("n_est"))
      .withColumn("overcount", col("n_est") - col("n_exact"))
      .localCheckpoint()
    vocab.unpersist()
    out
  }

  /** The FIXED-EDGE histogram sketch STATE in relational form: per
    * (group, bin) counts on a grid declared up front ([lo, hi) split
    * into `bins` equal bands, out-of-range values clamped into the edge
    * bins). Unlike [[histogramQuantiles]]' data-relative grid, fixed
    * edges are what make day states MERGEABLE — two days binned against
    * the same edges combine by vector ADD ([[mergeHistStates]]). This
    * is the quantile analogue of [[lincountState]], with the OPPOSITE
    * merge algebra: counts are additive, NOT idempotent — a replayed
    * batch DOUBLE-COUNTS (where the lincount OR-merge shrugs it off),
    * so the upstream must deliver each batch exactly once (the
    * foreachBatch/epoch-id dedup discipline). State ≤ groups × bins
    * rows regardless of traffic.
    */
  def fixedHistState(rows: DataFrame, valCol: String, groupCol: String,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    val width = (hi - lo) / bins
    val bin = greatest(lit(0L), least(lit(bins - 1L),
      floor((col(valCol) - lo) / width).cast("long")))
    rows.groupBy(col(groupCol), bin.as("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Vector-ADD merge of two fixed-edge histogram states. */
  def mergeHistStates(a: DataFrame, b: DataFrame): DataFrame = {
    val g = a.columns.filterNot(c => c == "bin" || c == "cnt")
    a.unionByName(b)
      .groupBy((g :+ "bin").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Quantile estimates off a (possibly merged) fixed-edge state:
    * est(q) = midpoint of the first bin whose cumulative count reaches
    * ⌈q·n⌉. The window runs over the state frame (≤ groups × bins
    * rows), never the raw values.
    */
  def fixedHistQuantiles(state: DataFrame, groupCol: String, lo: Double,
      hi: Double, bins: Int, qs: Seq[Double]): DataFrame = {
    val width = (hi - lo) / bins
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy("bin")
    val cum = state
      .withColumn("__cum", sum(col("cnt")).over(w))
      .withColumn("__n", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(groupCol)))
    val qDf = state.sparkSession.createDataFrame(
      qs.zipWithIndex.map { case (q, i) => (i, q) }).toDF("qi", "q")
    cum.crossJoin(broadcast(qDf))
      .where(col("__cum") >= ceil(col("q") * col("__n")))
      .groupBy(col(groupCol), col("qi"), col("q"), col("__n"))
      .agg(min(col("bin")).as("__qbin"))
      .select(col(groupCol), col("qi"), col("q"),
        col("__n").as("n_rows"),
        round(lit(lo) + (col("__qbin") + 0.5d) * width, 4).as("est"))
  }

  /** FIXED-GRID HISTOGRAM QUANTILE sketch with exact audit: per group,
    * bin values into `bins` equal-width buckets over the group's own
    * [min, max], estimate quantile q as the midpoint of the first bin
    * whose cumulative count reaches ⌈q·n⌉, and emit it next to the
    * exact interpolated percentile. Scale story: the exact side is a
    * per-group SORT of every value (percentile is an order statistic);
    * the sketch side is a fixed `bins`-row integer histogram per
    * group — map-side combinable, mergeable across days by vector ADD
    * (the t-digest/KLL role, in the deterministic fixed-grid form an
    * oracle can replicate). Estimate error is bounded by the bin width;
    * `abs_err` makes that bound a measured number per quantile.
    *
    * Determinism: lo/hi/width and the bin index derive from the same
    * IEEE doubles in both engines (min, max, one subtraction, one
    * division, one floor); counts and the ⌈q·n⌉ threshold comparison
    * are exact; the only post-integer float work is the midpoint
    * expression, rounded at 4 dp.
    */
  def histogramQuantiles(rows: DataFrame, valCol: String, groupCol: String,
      bins: Int, qs: Seq[Double]): DataFrame = {
    val v = col(valCol)
    // ONE combined per-group aggregate carries lo/hi/n AND the exact
    // percentiles (5 + |qs| tiny columns), broadcast ONCE onto the row
    // stream — a naive stats-frame-per-join formulation re-computes the
    // aggregate (and re-scans the corpus) at every join site, the
    // recomputed-branch defect family; this plan has exactly TWO scans
    // (spec-pinned), and dropping the audit leaves one.
    val exactCols = qs.zipWithIndex.map { case (q, i) =>
      round(expr(s"percentile($valCol, $q)"), 6).as(s"__x$i")
    }
    val statCols = Seq("__lo", "__hi", "__n") ++ qs.indices.map(i => s"__x$i")
    val stats = rows.groupBy(groupCol)
      .agg(min(v).as("__lo"),
        (Seq(max(v).as("__hi"), count(lit(1)).as("__n")) ++ exactCols): _*)
    val width = (col("__hi") - col("__lo")) / bins
    val binIdx = when(col("__hi") === col("__lo"), lit(0L))
      .otherwise(least(lit(bins - 1L), floor((v - col("__lo")) / width).cast("long")))
    // the per-group constants ride the groupBy keys (functionally
    // dependent on the group) so no re-join is ever needed downstream
    val counts = rows.join(broadcast(stats), Seq(groupCol))
      .groupBy(col(groupCol) +: statCols.map(col) :+ binIdx.as("bin"): _*)
      .agg(count(lit(1)).as("__c"))
    val cum = counts.withColumn("__cum",
      sum(col("__c")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(groupCol).orderBy("bin")))
    val qDf = rows.sparkSession.createDataFrame(
      qs.zipWithIndex.map { case (q, i) => (i, q) }).toDF("qi", "q")
    val exactOfQ = qs.indices
      .map(i => when(col("qi") === i, col(s"__x$i")))
      .reduce(coalesce(_, _))
    cum.crossJoin(broadcast(qDf))
      .where(col("__cum") >= ceil(col("q") * col("__n")))
      .groupBy(col(groupCol) +: statCols.map(col) ++: Seq(col("qi"), col("q")): _*)
      .agg(min(col("bin")).as("__qbin"))
      .select(col(groupCol), col("qi"), col("q"),
        round(col("__lo") + (col("__qbin") + 0.5d) *
          ((col("__hi") - col("__lo")) / bins), 4).as("est"),
        exactOfQ.as("exact"))
      .withColumn("abs_err", round(abs(col("est") - col("exact")), 4))
      .select(groupCol, "qi", "q", "est", "exact", "abs_err")
  }
}
