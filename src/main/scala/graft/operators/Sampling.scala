package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data curation.
  *
  * Why not `DataFrame.sample` / `rand(seed)`: those draw from a
  * partition-dependent RNG stream — the selected set changes with
  * partitioning, cluster size, and engine, which is poison for
  * reproducible dataset builds (and for the DuckDB oracle). Here the
  * "random" order is the [[Dedup.polyHash]] char fold of (text + salt):
  * an engine-independent PRNG keyed on content, so a draw reproduces
  * bit-for-bit anywhere, and different salts give independent draws
  * (same trick as ExtQueries' train/val/test split).
  *
  * Scale shape: the rank filter compiles to WindowGroupLimit (Spark 4's
  * rank-limit pushdown — see PLANS.md "Top-k"): every map task keeps at
  * most `quota` rows per stratum BEFORE the shuffle, so the per-stratum
  * reducer receives ≤ quota x mapTasks rows no matter how hot the
  * stratum — stratified sampling of a 100 TB corpus moves only
  * sample-sized data. One exchange total.
  */
object Sampling {

  /** Exact per-stratum quota sample. `quota` is a Column so mixing
    * weights can vary by stratum (e.g. boost an under-represented
    * source); strata smaller than their quota are taken whole. Output =
    * input columns + `smp_rank` (1..quota within the stratum, in the
    * salted-hash draw order; ties on the hash — e.g. exact-duplicate
    * texts — break by `idCol` so the rank is total).
    *
    * The salt is a PREFIX, deliberately: a suffix only adds a constant
    * offset to the char fold (`poly(text||s) = poly(text)*31^|s| +
    * poly(s) mod P`), which preserves the relative ORDER of almost every
    * pair — two "independent" suffix-salted draws select nearly the same
    * rows (spec-caught). A prefix multiplies by 31^|text| per document,
    * scrambling order properly. (The train/val/test split's suffix salt
    * is fine — it consumes the absolute VALUE, which a constant shift
    * does change.)
    *
    * `quotaCap`: the rank-limit pushdown (WindowGroupLimit) only fires
    * on a LITERAL bound — a dynamic per-stratum quota expression alone
    * would shuffle every row of a hot stratum. Pass the maximum quota so
    * the plan carries a constant `smp_rank <= cap` conjunct (map tasks
    * prune to cap rows per stratum pre-shuffle) with the dynamic quota
    * refining after; semantically redundant, physically essential.
    */
  def stratified(df: DataFrame, strataCols: Seq[String], idCol: String,
      textCol: String, quota: Column, salt: String,
      quotaCap: Option[Int] = None): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(Dedup.polyHash(concat(lit(salt), col(textCol))), col(idCol))
    val ranked = df.withColumn("smp_rank", row_number().over(w))
    quotaCap match {
      case Some(cap) => ranked.where(col("smp_rank") <= cap && col("smp_rank") <= quota)
      case None => ranked.where(col("smp_rank") <= quota)
    }
  }

  /** Sequence packing for LLM pretraining: documents are concatenated in
    * a deterministic salted-hash order and chunked into fixed
    * `budget`-sized context windows; each document's PACK id is the
    * window its first unit lands in (`floor(prefix_before / budget)` —
    * the concat-then-chunk pipeline, where a document may span the
    * boundary into the next window; `spans_next` flags those).
    *
    * Packing runs PER STRATUM (e.g. per language), which is both the
    * realistic shape (streams are packed per domain/language, not across
    * a 100 TB global order) and the scale-correct one: the prefix sum is
    * a window over the stratum key, never the single-partition global
    * window PLANS.md bans. Determinism: same salted-hash order as
    * [[stratified]] (prefix salt), integer unit sums only.
    *
    * Output: input columns + `pack_id` (0-based window index within the
    * stratum) + `spans_next` (1 when the document crosses into the next
    * window).
    */
  def packSequences(df: DataFrame, strataCols: Seq[String], idCol: String,
      unitsCol: String, budget: Long, salt: String): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(Dedup.polyHash(concat(lit(salt), col(idCol).cast("string"))), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(unitsCol)).over(w))
      .withColumn("pack_id",
        floor((col("__cum") - col(unitsCol)) / budget).cast("long"))
      .withColumn("spans_next",
        when(floor((col("__cum") - lit(1)) / budget).cast("long") > col("pack_id"), 1)
          .otherwise(0))
      .drop("__cum")
  }

  /** Value-based decile (n-quantile) profile per stratum — the curation
    * threshold primitive ("keep the top 3 quality deciles per
    * language"). Buckets are assigned to VALUES, not rows: every row
    * with score v lands in bucket ceil(nBuckets * cumCount(>=v) /
    * total), so ties share a bucket and a single hot value can leave
    * neighbouring buckets empty — the deterministic reading (row-level
    * NTILE splits ties by arbitrary row identity AND serializes each
    * stratum through one reducer).
    *
    * Scale shape: the raw table is reduced FIRST to a per-(stratum,
    * value) histogram — one map-side-combinable aggregate, output
    * bounded by |distinct scores| (scores are rounded, so this is
    * vocabulary-sized) — and the cumulative window + bucket aggregate
    * run over that tiny histogram. Compare NTILE over the raw rows: a
    * 100 TB stratum would funnel through a single window task. Bucket
    * arithmetic is pure integer math (`(n*cum + total - 1) div total`),
    * exact in any engine.
    *
    * Output: strataCol, decile (1..nBuckets), n_docs, max_q, min_q.
    */
  /** Per-stratum Tukey outlier fences — the robust quality gate
    * ("drop documents whose length sits outside q1/q3 ± k·IQR for their
    * language") — computed ENTIRELY from the per-(stratum, value)
    * histogram: exact type-7 quantiles (the percentile/quantile_cont
    * interpolation) are read off the cumulative counts as order
    * statistics, so nothing ever buffers a stratum's raw values (the
    * builtin `percentile` materializes every value per group — the
    * deciles/NTILE argument again, see [[valueDeciles]]). After the one
    * map-side-combinable histogram aggregate, every further step is
    * histogram-sized, including the outlier counts (summed from the
    * same histogram, not a second corpus scan).
    *
    * Order statistic k (0-indexed, value-ascending) = min v with
    * cum(v) >= k+1; type-7 quantile p = stat(floor(h)) + (h-floor(h)) *
    * (stat(ceil(h)) - stat(floor(h))) with h = (n-1)*p. All arithmetic
    * is exact-input IEEE (h is a multiple of 2^-2 for quartiles), so the
    * DuckDB twin reproduces it bit-for-bit — spec-asserted ≡
    * `percentile(0.25/0.75)`.
    *
    * Output: strataCol, q1, q3, lo_fence, hi_fence (rounded 6),
    * n_low, n_high, n_rows.
    */
  def robustFences(df: DataFrame, strataCol: String, value: Column,
      k: Double = 1.5): DataFrame = {
    val hist = df.groupBy(col(strataCol), value.as("__v"))
      .agg(count(lit(1)).as("__cnt"))
    val ordered = Window.partitionBy(strataCol).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(strataCol)
    val h = hist
      .withColumn("__cum", sum("__cnt").over(ordered))
      .withColumn("__n", sum("__cnt").over(whole))
    def hAt(p: Double) = (col("__n") - 1) * p
    // order statistics AS WINDOWS over the same histogram rows — the old
    // separate-aggregate-then-join-back-to-hist formulation recomputed
    // the histogram branch (and its corpus scan) on both sides of the
    // join; per-stratum windows keep the whole chain ONE pass: hist
    // exchange on (stratum, v), one stratum exchange for the windows,
    // and the final per-stratum aggregate reuses that partitioning
    def stat(target: Column) =
      min(when(col("__cum") >= target + 1, col("__v"))).over(whole)
    val fenced = h
      .withColumn("__q1", stat(floor(hAt(0.25))) +
        (hAt(0.25) - floor(hAt(0.25))) *
          (stat(ceil(hAt(0.25))) - stat(floor(hAt(0.25)))))
      .withColumn("__q3", stat(floor(hAt(0.75))) +
        (hAt(0.75) - floor(hAt(0.75))) *
          (stat(ceil(hAt(0.75))) - stat(floor(hAt(0.75)))))
      .withColumn("__lo", col("__q1") - lit(k) * (col("__q3") - col("__q1")))
      .withColumn("__hi", col("__q3") + lit(k) * (col("__q3") - col("__q1")))
    fenced.groupBy(col(strataCol)).agg(
        round(max(col("__q1")), 6).as("q1"), round(max(col("__q3")), 6).as("q3"),
        round(max(col("__lo")), 6).as("lo_fence"), round(max(col("__hi")), 6).as("hi_fence"),
        sum(when(col("__v") < col("__lo"), col("__cnt")).otherwise(0L)).as("n_low"),
        sum(when(col("__v") > col("__hi"), col("__cnt")).otherwise(0L)).as("n_high"),
        max(col("__n")).as("n_rows"))
      .select(col(strataCol), col("q1"), col("q3"), col("lo_fence"),
        col("hi_fence"), col("n_low"), col("n_high"), col("n_rows"))
  }

  /** SLIDING-WINDOW CHUNKING — the context-budget splitter that runs
    * UPSTREAM of packing: long documents become overlapping
    * `chunkTokens`-token windows advancing by `chunkTokens - overlap`
    * (the overlap preserves cross-boundary context, the standard
    * pretraining/RAG prep). A trailing window is emitted only when it
    * contributes tokens beyond the previous window's overlap (the
    * `i = 0 OR i*stride + overlap < n` rule), so no chunk is a suffix
    * copy of its predecessor.
    *
    * Scale shape: pure per-row projection + explode — no shuffle, no
    * vocabulary, nothing cross-document; fan-out is ~n/stride rows per
    * doc, bounded by the input's own token mass. Deterministic by
    * construction (integer window arithmetic only).
    */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap $overlap must be in [0, chunkTokens=$chunkTokens)")
    val stride = chunkTokens - overlap
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("__w"))
      .withColumn("chunk_id", explode(expr(
        s"filter(sequence(0, size(__w) div $stride + 1), " +
          s"i -> i = 0 OR i * $stride + $overlap < size(__w))")))
      .withColumn("__ck",
        slice(col("__w"), col("chunk_id") * stride + 1, lit(chunkTokens)))
      .select(col("doc_id"),
        // sequence(0, x div y) is LONG-typed; the window index fits int
        col("chunk_id").cast("int").as("chunk_id"),
        size(col("__ck")).as("n_tokens"),
        concat_ws(" ", col("__ck")).as("chunk_text"))
  }

  /** TEMPERATURE-SCALED DOMAIN MIXTURE: the data-mixing step of a
    * training build — per-domain token mass, the raw share p_d, the
    * temperature-flattened share q_d ∝ p_d^(1/2), and the sampling
    * boost q_d/p_d each domain needs to hit its mixed share. α = 1/2 is
    * the published sweet spot family (flatten head domains, lift tail
    * domains) and, deliberately, the one exponent whose power is a
    * CORRECTLY-ROUNDED IEEE op (sqrt) — `pow` is not, so a generic α
    * would not reproduce across engines.
    *
    * Determinism: the cross-domain normalizer runs on an integer grid —
    * s_d = round(sqrt(n_d)·10^6) as BIGINT, Σs exact — so shares are
    * exact-integer divisions, order-free under any partitioning. The
    * per-domain aggregate is the only corpus-sized operation (map-side
    * combinable); the normalizer is an unpartitioned window over the
    * |domains| result rows (dashboard-sized at any corpus scale) — NOT a
    * second aggregate branch, which Spark does not exchange-reuse here
    * and would re-scan the corpus (same defect the ScaleSpec plan audit
    * caught on shardAudit).
    */
  def mixtureWeights(docs: DataFrame, domainCol: String,
      text: Column): DataFrame = {
    val grid = 1000000L
    val w = Window.partitionBy()
    docs
      .groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(text, " ")).cast("long")).as("n_tokens"))
      // floor(x + 0.5), not round(x): integer round() on doubles is the
      // one op the engines disagree on (see Similarity.quantizeInt8)
      .withColumn("__s", floor(sqrt(col("n_tokens")) * grid + 0.5).cast("long"))
      .withColumn("__tot", sum("n_tokens").over(w))
      .withColumn("__stot", sum("__s").over(w))
      .select(col(domainCol), col("n_docs"), col("n_tokens"),
        round(col("n_tokens") / col("__tot"), 6).as("p_raw"),
        round(col("__s") / col("__stot"), 6).as("p_temp"),
        round((col("__s") / col("__stot")) / (col("n_tokens") / col("__tot")), 6)
          .as("boost"))
  }

  /** Epoch / repetition schedule: turn [[mixtureWeights]]' temperature
    * shares into the numbers a training run actually consumes — how many
    * tokens to DRAW from each domain for a total budget of
    * `budgetFactor` x the corpus, and how many passes (epochs) over the
    * domain that implies. Up-weighted small domains repeat
    * (epochs > 1, the multi-epoch regime); down-weighted large
    * ones subsample (repetition < 1). This is the planning step between
    * "we chose a mixture" and "the sampler runs": budgets must be exact
    * integers that sum to <= the global budget, and the whole schedule
    * must be reproducible run-to-run.
    *
    * EXACT-INTEGER evaluation: target_d = B·s_d div Σs with the product
    * in DECIMAL(38,0) (B ~ 10^12 tokens times s_d ~ 10^12 overflows
    * BIGINT; HUGEINT on the oracle side), epochs_d = ceil-div of two
    * BIGINTs — so the schedule is bit-stable under any partitioning, and
    * only the reported `repetition` ratio is a (rounded) float.
    *
    * Scale shape: identical to [[mixtureWeights]] — one map-side
    * combinable corpus aggregate, then unpartitioned windows over the
    * |domains| rows.
    */
  def epochSchedule(docs: DataFrame, domainCol: String, text: Column,
      budgetFactor: Int = 2): DataFrame = {
    val grid = 1000000L
    val w = Window.partitionBy()
    docs
      .groupBy(col(domainCol))
      .agg(sum(size(split(text, " ")).cast("long")).as("n_tokens"))
      .withColumn("__s", floor(sqrt(col("n_tokens")) * grid + 0.5).cast("long"))
      .withColumn("__tot", sum("n_tokens").over(w))
      .withColumn("__stot", sum("__s").over(w))
      .withColumn("target_tokens",
        expr(s"CAST((CAST($budgetFactor AS DECIMAL(38,0)) * __tot * __s)" +
          " div __stot AS BIGINT)"))
      // ceil-div; an empty domain (unsplittable null text) draws nothing
      .withColumn("epochs",
        when(col("n_tokens") === 0L, lit(0L))
          .otherwise(expr("(target_tokens + n_tokens - 1) div n_tokens")))
      .select(col(domainCol), col("n_tokens"), col("target_tokens"),
        col("epochs"),
        when(col("n_tokens") === 0L, lit(0.0d))
          .otherwise(round(col("target_tokens") / col("n_tokens"), 6))
          .as("repetition"))
  }

  /** Per-domain DISTRIBUTION DRIFT: total-variation distance between
    * each domain's unigram distribution p_d and the corpus-wide
    * distribution q — the "does this source look like the rest of the
    * mix" diagnostic that complements [[mixtureWeights]]' size-based
    * shares (a source can be correctly weighted yet lexically alien;
    * TV quantifies that in [0,1]).
    *
    * TV chosen over KL deliberately: with integer counts it is EXACTLY
    * computable — on the common denominator n_d·n,
    *   TV(p_d, q) = [ Σ_{w∈d} |c_dw·n − c_w·n_d|  +  n_d·(n − Σ_{w∈d} c_w) ]
    *                / (2·n_d·n)
    * (the second term covers words absent from d, where the integrand is
    * c_w·n_d). Numerator terms are exact DECIMAL(38,0) products summed
    * order-free; the one float op is the final division. KL would need a
    * float log per term and an order-dependent float sum.
    *
    * Scale shape: one (domain, word) count aggregate; c_w and n_d attach
    * as partitioned windows over that same stream (one word-keyed and
    * one domain-keyed exchange — no recomputed branches); the global
    * token count n is a 1-row broadcast crossJoin built from a second
    * column-pruned corpus scan (the right trade for attaching a scalar
    * to a vocabulary-sized frame — see the PLANS.md sweep rule).
    */
  def domainDivergence(docs: DataFrame, domainCol: String,
      text: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val wc = docs
      .select(col(domainCol), explode(split(text, " ")).as("__word"))
      .groupBy(col(domainCol), col("__word"))
      .agg(count(lit(1)).as("__cs"))
      .withColumn("__c", sum("__cs").over(Window.partitionBy("__word")))
      .withColumn("__ns", sum("__cs").over(Window.partitionBy(domainCol)))
    val nRow = docs.agg(sum(size(split(text, " "))).cast("long").as("__n"))
    wc.crossJoin(broadcast(nRow))
      .groupBy(col(domainCol))
      .agg(max(col("__ns")).as("n_tokens"), max(col("__n")).as("__nn"),
        sum(abs(col("__cs").cast(dec) * col("__n") -
          col("__c").cast(dec) * col("__ns"))).as("__num1"),
        sum(col("__c").cast(dec)).as("__cg"))
      .select(col(domainCol), col("n_tokens"),
        round(
          (col("__num1") + col("n_tokens").cast(dec) *
            (col("__nn").cast(dec) - col("__cg"))).cast("double") /
          (lit(2.0d) * col("n_tokens") * col("__nn")), 6).as("tv_dist"))
  }

  /** CCNet-style perplexity-band corpus filter: score every document
    * with the corpus-model bigram log-prob ([[TextAnalysis.bigramLogProb]]
    * — higher avg_logprob = lower perplexity = more fluent), cut each
    * stratum into perplexity deciles, and keep the MIDDLE band — the
    * CCNet heuristic: the head is boilerplate-like ultra-predictable
    * text, the tail is noise. Emits per (stratum, band) the selection
    * telemetry a curation run must record: kept flag, doc count, token
    * mass, and the band's log-prob range.
    *
    * Decile assignment is HISTOGRAM-based (the [[valueDeciles]]
    * discipline), not a per-doc rank: after the doc-level score the
    * whole chain runs over the (stratum, rounded-logprob) histogram —
    * bounded, ≪ corpus — so there is no corpus-wide sort. Ties (equal
    * rounded scores) land in the same decile by construction, which a
    * row_number ranking would split arbitrarily. Counts and masses are
    * integer sums, band edges are min/max — all order-free, so results
    * are identical at any shuffle width.
    */
  def perplexityBands(docs: DataFrame, strataCol: String, idCol: String,
      textCol: String, keepLo: Int = 4, keepHi: Int = 7): DataFrame = {
    val lp = TextAnalysis.bigramLogProb(docs, idCol, textCol)
    val strata = docs.select(col(idCol).as("doc_id"), col(strataCol))
    val hist = lp.join(strata, Seq("doc_id"))
      .groupBy(col(strataCol), col("avg_logprob").as("__lp"))
      .agg(count(lit(1)).as("__cnt"), sum(col("n_bigrams")).as("__mass"))
    val ordered = Window.partitionBy(strataCol).orderBy(col("__lp").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(strataCol)
    hist
      .withColumn("__cum", sum("__cnt").over(ordered))
      .withColumn("__tot", sum("__cnt").over(whole))
      .withColumn("__dec", expr("CAST((10 * __cum + __tot - 1) DIV __tot AS INT)"))
      .withColumn("band",
        when(col("__dec") < keepLo, lit("head"))
          .when(col("__dec") <= keepHi, lit("middle"))
          .otherwise(lit("tail")))
      .groupBy(col(strataCol), col("band"))
      .agg(sum("__cnt").as("n_docs"),
        sum("__mass").as("mass"),
        min("__lp").as("min_lp"),
        max("__lp").as("max_lp"))
      .withColumn("kept", (col("band") === "middle").cast("int"))
  }

  def valueDeciles(df: DataFrame, strataCol: String, value: Column,
      nBuckets: Int = 10): DataFrame = {
    val hist = df.groupBy(col(strataCol), value.as("__v"))
      .agg(count(lit(1)).as("__cnt"))
    val ordered = Window.partitionBy(strataCol).orderBy(col("__v").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(strataCol)
    hist
      .withColumn("__cum", sum("__cnt").over(ordered))
      .withColumn("__tot", sum("__cnt").over(whole))
      .withColumn("decile",
        expr(s"CAST(($nBuckets * __cum + __tot - 1) DIV __tot AS INT)"))
      .groupBy(col(strataCol), col("decile"))
      .agg(sum("__cnt").as("n_docs"),
        max(col("__v")).as("max_q"),
        min(col("__v")).as("min_q"))
  }

  /** DSIR-style importance scoring (Data Selection via Importance
    * Resampling, Xie et al. 2023): per-document log importance weight
    * log w(x) = Σ_tokens [ln p_target(h(w)) - ln p_corpus(h(w))] over
    * HASHED unigram features (the hashing trick — `buckets` buckets via
    * the engine-independent polyhash, add-one smoothing over the bucket
    * space). Documents scoring > 0 look more like the target domain
    * (here: a language slice) than the corpus average — the resampling
    * weight a targeted-pretraining pipeline draws with.
    *
    * Scale shape: the corpus is touched by ONE explode feeding two
    * map-side-combinable counts (corpus and target bucket histograms —
    * the target count rides the same aggregate via a conditional, not a
    * second scan) plus the per-doc rollup; the per-bucket log-ratio
    * table is `buckets` rows, bounded and BROADCAST back onto the word
    * stream. The per-doc float sum is rounded to 4 decimals — the
    * [[TextAnalysis.bigramLogProb]] precedent: reorder error of a
    * ~100-term double sum is ~1e-13, far under the rounding quantum.
    */
  def dsirScores(docs: DataFrame, idCol: String, textCol: String,
      targetFlag: Column, buckets: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // ONE explode, immediately folded to the compact (doc, bucket) count
    // frame — bounded by |docs| × buckets — which then feeds both the
    // histogram and the per-doc rollup; persisting the compact frame
    // (not the raw word stream) is what keeps the shape 100 TB-safe
    val dw = docs.select(col(idCol), targetFlag.as("__t"),
        explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .withColumn("hb", Dedup.polyHash(col("w")) % buckets)
      .groupBy(col(idCol), col("hb"))
      .agg(count(lit(1)).as("cw"), max(col("__t")).as("__t"))
      .localCheckpoint(eager = false)
    val hist = dw.groupBy("hb").agg(
      sum(col("cw")).as("cc"),
      sum(when(col("__t"), col("cw")).otherwise(0L)).as("ct"))
    val tot = hist.agg(sum(col("cc")).as("nc"), sum(col("ct")).as("nt"))
    val ratios = hist.crossJoin(broadcast(tot))
      .select(col("hb"),
        (log((col("ct") + 1L).cast("double") / (col("nt") + buckets)) -
          log((col("cc") + 1L).cast("double") / (col("nc") + buckets))).as("lr"))
    dw.join(broadcast(ratios), Seq("hb"))
      .groupBy(col(idCol))
      .agg(sum(col("cw")).as("n_feats"),
        round(sum(col("cw") * col("lr")), 4).as("dsir_score"))
  }

  /** CORPUS SNAPSHOT DIFF: reconcile two crawl/ingest snapshots by key,
    * comparing CONTENT HASHES — added / removed / changed / unchanged
    * counts, the day-over-day telemetry an incremental pipeline uses to
    * size its work (changed+added drive re-processing; removed drives
    * tombstones). The hash (the repo's polynomial char fold) is
    * computed BEFORE the join, so the full-outer reconcile ships only
    * (key, 8-byte hash) — never document text — and the join is the
    * single shuffle. Same full-outer discipline as ext_reconcile_full,
    * lifted from value deltas to content identity.
    */
  def snapshotDiff(prev: DataFrame, cur: DataFrame, keyCol: String,
      contentCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(prev.sparkSession)
    def hashed(df: DataFrame, side: String): DataFrame =
      df.select(col(keyCol).as(s"__k$side"),
        Dedup.polyHash(col(contentCol)).as(s"__h$side"))
    val j = hashed(prev, "a").join(hashed(cur, "b"),
      col("__ka") === col("__kb"), "full_outer")
    j.select(
        when(col("__ka").isNull, "added")
          .when(col("__kb").isNull, "removed")
          .when(col("__ha") =!= col("__hb"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("status")
      .agg(count(lit(1)).as("n_docs"))
  }
}
