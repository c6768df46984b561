package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication for LLM training-data pipelines: exact,
  * n-gram-Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design: every variant is inverted-index shaped — candidates come
  * from equi-joins on shingles / LSH buckets / fingerprint bands, never
  * from an all-pairs cross join (the only exception is the brute-force
  * embedding path, kept as the exactness baseline). Shuffles are on
  * shingle/bucket keys, so skew is bounded by the hottest shingle; at
  * 100 TB you'd additionally drop top-frequency shingles (stopword
  * shingles) before the self-join.
  *
  * Determinism: hash mode `PolyHash` (default for oracle parity) derives
  * shingle ids from a polynomial character fold — reproducible anywhere,
  * incl. the DuckDB oracle, with no vocabulary structure at all.
  * `DenseId` ranks the distinct shingle vocabulary lexicographically
  * (also reproducible, but pays a distinct + global sort + join).
  * `XxHash` is the engine-specific fastest path (rows-only check).
  */
object Dedup {

  sealed trait HashMode
  case object DenseId extends HashMode
  case object XxHash extends HashMode
  case object PolyHash extends HashMode

  /** Exact dedup: keep min id per identical text, with multiplicity. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")

  /** Distinct (doc_id, shingle) pairs: word n-gram shingles (n=3), via
    * the native `graft_shingles` Generator — zero-copy byte-slice
    * emission, no intermediate word/index/shingle arrays (see
    * functions/ShingleGenerator.scala; bit-equality with
    * [[shingleEdgesHof]] is spec-asserted).
    */
  def shingleEdges(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // per-document dedupe INSIDE the generator (r13 opt): a doc's
    // shingle set is local to its row, so the distinct variant's
    // per-row hash set replaces the corpus-wide `.distinct()` exchange
    // this function used to pay — the edge list's first shuffle now
    // happens only where a consumer actually needs a new key
    docs.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
      .selectExpr("doc_id",
        s"${graft.functions.GraftFunctions.ShinglesDistinctName}(__t) AS shingle")
  }

  /** Built-in-HOF twin of [[shingleEdges]] (split -> sequence ->
    * transform -> explode) — kept for bit-equality cross-checks of the
    * native generator, mirroring the polyHash / polyHashFold pairing.
    */
  def shingleEdgesHof(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // split once behind a projection boundary, then shingle the array
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("__w"))
      .selectExpr("doc_id",
        """explode(CASE WHEN size(__w) >= 3
             THEN transform(sequence(0, size(__w) - 3),
                  i -> concat_ws(' ', __w[i], __w[i+1], __w[i+2]))
             ELSE CAST(array() AS array<string>) END) AS shingle""")
      .distinct()

  /** Shingle-set sizes per doc. */
  private def shingleSizes(edges: DataFrame): DataFrame =
    edges.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))

  /** Exact Jaccard for candidate pairs (doc_a < doc_b) given the edge
    * list: |A∩B| from a count over the shingle join, |A∪B| = nA+nB-∩.
    */
  private def verifiedJaccard(candidates: DataFrame, edges: DataFrame,
      tau: Double): DataFrame = {
    val sizes = shingleSizes(edges)
    val ea = edges.select(col("doc_id").as("doc_a"), col("shingle"))
    val eb = edges.select(col("doc_id").as("doc_b"), col("shingle"))
    // Kept as ONE fused pipeline of co-partitioned joins on purpose:
    // broadcast-hinting the candidate set (or semi-filtering the edge
    // list by candidate docs) measures SLOWER here — each broadcast build
    // is a serialization barrier (candidate generation must fully
    // complete before verification starts), while the shuffle plan
    // overlaps all map stages. The flip point is corpus-scale edge lists:
    // when shuffling edges twice dominates, pre-filter `edges` to
    // candidate docs (a broadcast semi-join) before these joins.
    candidates
      .join(ea, Seq("doc_a")).join(eb, Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), Seq("doc_b"))
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= tau)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Materialize the (small) pair result eagerly, then release the edge
    * cache. The pair functions persist the shingle-edge list because it
    * feeds several joins; leaving the cache to GC/ContextCleaner would let
    * repeated invocations (Bench runs every query four times) accumulate
    * blocks. localCheckpoint is eager by default, so by the time it
    * returns the edges are consumed and can be unpersisted
    * deterministically — the caller gets a lineage-free DataFrame of
    * verified pairs (always tiny relative to the corpus).
    */
  private def materializePairs(pairs: DataFrame, edges: DataFrame): DataFrame = {
    val out = pairs.localCheckpoint()
    edges.unpersist()
    out
  }

  /** Apply the broadcast hint, or pass through when the caller knows the
    * "small" side has outgrown broadcast (the same opt-out shape as
    * connectedComponents' broadcastLabels). */
  private def hintIf(enabled: Boolean)(df: DataFrame): DataFrame =
    if (enabled) broadcast(df) else df

  /** Shared shape of the set-similarity pair operators: inverted-index
    * self-join on shingles — the single pass IS the intersection count
    * (no separate candidate set + re-join) — then a caller-chosen score
    * from (inter, |A|, |B|). Per-doc sizes ≪ pair stream, so they attach
    * broadcast (post-agg sides are unsized by the static planner); pass
    * `broadcastSizes = false` at corpus sizes where a per-doc table
    * outgrows broadcast — the attaches become co-partitioned SMJs on the
    * pair stream's keys.
    */
  private def scoredIntersectionPairs(docs: DataFrame, idCol: String,
      textCol: String, scoreName: String,
      score: (Column, Column, Column) => Column, tau: Double,
      broadcastSizes: Boolean = true): DataFrame = {
    val edges = shingleEdges(docs, idCol, textCol).persist()
    materializePairs(
      scoredIntersectionPairsOnEdges(edges, scoreName, score, tau, broadcastSizes),
      edges)
  }

  /** Edge-level core of [[scoredIntersectionPairs]] — callers own the
    * edge cache lifecycle (lets [[ensemblePairs]] share ONE edge build
    * across detectors). */
  private def scoredIntersectionPairsOnEdges(edges: DataFrame,
      scoreName: String, score: (Column, Column, Column) => Column,
      tau: Double, broadcastSizes: Boolean): DataFrame = {
    val hint = hintIf(broadcastSizes) _
    val sizes = shingleSizes(edges)
    val pairs = edges.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(edges.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      .join(hint(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na"))), Seq("doc_a"))
      .join(hint(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb"))), Seq("doc_b"))
      .withColumn(scoreName, score(col("inter"), col("na"), col("nb")))
      .where(col(scoreName) >= tau)
      .select("doc_a", "doc_b", scoreName)
    pairs
  }

  /** Near-dup pairs by n-gram Jaccard >= tau: |A∩B| / |A∪B|. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      tau: Double, broadcastSizes: Boolean = true): DataFrame =
    scoredIntersectionPairs(docs, idCol, textCol, "jaccard",
      (inter, na, nb) => inter / (na + nb - inter), tau, broadcastSizes)

  /** Near-dup pairs by OVERLAP COEFFICIENT (max containment):
    * |A∩B| / min(|A|,|B|) >= tau. Catches the partial-overlap duplication
    * Jaccard structurally misses — a short document quoted whole inside a
    * long one scores low Jaccard (the union is dominated by the long
    * doc) but containment 1.0; training pipelines run this alongside
    * Jaccard to catch quote-inclusion and boilerplate-wrapped copies.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      tau: Double, broadcastSizes: Boolean = true): DataFrame =
    scoredIntersectionPairs(docs, idCol, textCol, "containment",
      (inter, na, nb) => inter / least(na, nb), tau, broadcastSizes)

  /** CROSS-CORPUS contamination: for each document in `eval`, the
    * `train` documents whose shingle overlap covers >= `tau` of the EVAL
    * document's shingle set (coverage = |T∩E| / |E| — the train doc
    * "contains" the eval doc). This is benchmark DEcontamination, not
    * self-dedup: the join is bipartite (train-side inverted index probes
    * eval-side shingles), the score denominator is one-sided, and a hit
    * means the eval document leaked into training data — the reported
    * train_id is what to purge (or the eval_id to discard).
    *
    * Scale shape: identical to the self-join pair operators — one
    * equi-join on the shingle key, per-shingle fan-out |train docs with
    * s| x |eval docs with s| (eval is typically tiny: a benchmark).
    * Eval-side sizes attach broadcast by default (same opt-out as the
    * other pair ops).
    */
  def crossContamination(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, tau: Double,
      broadcastSizes: Boolean = true): DataFrame = {
    val hint = hintIf(broadcastSizes) _
    val trainEdges = shingleEdges(train, idCol, textCol)
    val evalEdges = shingleEdges(eval, idCol, textCol).persist()
    val evalSizes = shingleSizes(evalEdges)
    val pairs = evalEdges.select(col("doc_id").as("eval_id"), col("shingle"))
      .join(trainEdges.select(col("doc_id").as("train_id"), col("shingle")), Seq("shingle"))
      .groupBy("eval_id", "train_id").agg(count(lit(1)).as("inter"))
      .join(hint(evalSizes.select(col("doc_id").as("eval_id"), col("n_sh").as("ne"))),
        Seq("eval_id"))
      .withColumn("coverage", col("inter") / col("ne"))
      .where(col("coverage") >= tau)
      .select("eval_id", "train_id", "coverage")
    materializePairs(pairs, evalEdges)
  }

  /** BLOOM-FILTER DECONTAMINATION — the 100 TB-scale formulation of the
    * eval-leak check: fold the ENTIRE eval corpus's shingle set into a
    * `lanes`×64-bit bitset (a Bloom filter with `numProbes` probes per
    * shingle), broadcast that constant-size bitset, and probe every
    * train shingle against it map-side. A train document whose
    * maybe-in-eval shingle fraction reaches `tau` is flagged for
    * removal. Unlike [[crossContamination]] there is NO train×eval
    * shuffle join and no per-pair state — the eval side is compressed to
    * kilobytes regardless of benchmark count, which is how
    * decontamination actually ships at scale (the filter is built once
    * and reused across every training shard).
    *
    * Determinism (oracle-exact, false positives included): probe
    * positions come from double hashing on [[polyHash]] ids —
    * `pos_i = (sid mod m + i * (1 + sid mod (m-1))) mod m`, all exact
    * BIGINT arithmetic — and the bitset is a per-lane `bit_or` of
    * single-bit masks, so the filter contents (and therefore every
    * false positive) are identical in any engine, incl. the DuckDB
    * twin. Bloom guarantees no false NEGATIVES, so the flagged set is
    * always a superset of the exact-coverage answer at the same tau
    * (spec-asserted); the FP rate is the usual (1-e^{-kn/m})^k, a
    * sizing knob (`lanes`), not a correctness risk — decontamination
    * errs toward recall by design.
    *
    * Scale shape: two map-only shingle scans + one tiny groupBy(lane)
    * (≤ `lanes` rows) + one broadcast join on lane + one groupBy(doc).
    * The probe explode is ×numProbes on the train edge list — bounded,
    * and it never leaves the map side until the per-doc count. For an
    * eval set too large even for a few-MB bitset, shard the bloom by
    * `sid mod shards` and union the flagged outputs.
    */
  def bloomContamination(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, lanes: Int, numProbes: Int, tau: Double,
      broadcastBloom: Boolean = true, materialize: Boolean = true): DataFrame = {
    // 63 usable bits per 64-bit lane: the sign bit is never set, so the
    // DuckDB twin's checked `<<` (which rejects 1<<63 on BIGINT) folds
    // the identical bitset
    val m = lanes.toLong * 63L
    // per-edge probe rows: (…, lane, mask) for i = 0..numProbes-1
    def probed(edges: DataFrame): DataFrame =
      edges
        .withColumn("__sid", polyHash(col("shingle")))
        .withColumn("__i", explode(sequence(lit(0), lit(numProbes - 1))))
        .withColumn("__pos",
          (col("__sid") % m + col("__i") * (col("__sid") % (m - 1) + lit(1L))) % m)
        .withColumn("lane", expr("__pos div 63"))
        .withColumn("mask", expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 63 AS INT))"))
    val trainEdges = shingleEdges(train, idCol, textCol).persist()
    val bloom = probed(shingleEdges(eval, idCol, textCol))
      .groupBy("lane").agg(expr("bit_or(mask)").as("bits"))
    // inner join on lane: a probe whose lane holds no eval bits at all
    // simply drops out (counts as a miss, same as bits&mask != mask)
    val hits = probed(trainEdges)
      .join(hintIf(broadcastBloom)(bloom), Seq("lane"))
      .where(col("bits").bitwiseAND(col("mask")) === col("mask"))
      .groupBy("doc_id", "shingle").agg(count(lit(1)).as("__h"))
      .where(col("__h") === numProbes)
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    val flagged = shingleSizes(trainEdges)
      .join(hits, Seq("doc_id"))
      .withColumn("coverage", col("n_hit") / col("n_sh"))
      .where(col("coverage") >= tau)
      .select("doc_id", "n_sh", "n_hit", "coverage")
    // materialize=false keeps the declarative plan inspectable
    // (ScaleSpec's broadcast audit) at the cost of leaving the edge
    // cache to the ContextCleaner
    if (materialize) materializePairs(flagged, trainEdges) else flagged
  }

  /** Near-dup pairs by cosine over TOP-K TF-IDF SIGNATURES: each
    * document is reduced to its k highest-TF-IDF terms (its topical
    * signature), and pairs sharing signature terms are scored by the
    * cosine of the truncated weight vectors. Complements the set-overlap
    * family: Jaccard/containment weigh all shingles equally, while this
    * weighs matches by distinctiveness — two documents agreeing on rare
    * vocabulary score high even when their common-word framing differs.
    *
    * Scale shape: the signature step bounds the inverted index at k
    * entries per document (the rank filter is a literal bound, so it
    * compiles to WindowGroupLimit — map-side top-k pruning before the
    * doc_id shuffle, as in Sampling.stratified). Candidate fan-out per
    * term is |docs with that term in their top-k|² / 2 — on a natural
    * Zipf vocabulary top-k terms are rare, bounding the join; for
    * adversarial vocabularies compose the DF cap of
    * [[jaccardPairsCapped]] on the signature table.
    *
    * Determinism (oracle-exact): tfidf is rounded to 6 decimals BEFORE
    * ranking (ties then break lexicographically — engine-independent, as
    * in TextAnalysis.topTfidf), and weights are quantized to a 1e4
    * integer grid so dot products and norms are exact BIGINT sums —
    * order-free across any partitioning. The one float op, dot /
    * sqrt(na*nb), maps exact integers through correctly-rounded IEEE
    * ops: na,nb < 2^45 are exact doubles, so both engines see identical
    * inputs. na*nb is multiplied as DOUBLE (the exact product can
    * overflow BIGINT).
    */
  def tfidfCosinePairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, tau: Double, grid: Long = 10000L,
      materialize: Boolean = true, maxDf: Option[Int] = None): DataFrame = {
    val nDf = docs.agg(count(lit(1)).cast("double").as("__n"))
    // maxDf: the jaccardPairsCapped knob composed onto the SIGNATURE
    // table — terms in more than maxDf documents are dropped before the
    // self-join (a term shared by d signatures fans out d²/2 pair rows).
    // On adversarial/tiny vocabularies this bounds the hottest term's
    // work; signatures lose only their most common (lowest-IDF) terms,
    // the ones contributing least weight. None = exact.
    val capped = maxDf.fold(TextAnalysis.termStats(docs, idCol, textCol))(
      cap => TextAnalysis.termStats(docs, idCol, textCol)
        .where(col("df") <= cap))
    val scored = capped
      .crossJoin(broadcast(nDf))
      .withColumn("tfidf", round(col("tf") * log(col("__n") / col("df")), 6))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term").asc)
    val sigRaw = scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k && col("tfidf") > 0)
      .select(col("doc_id"), col("term"),
        round(col("tfidf") * grid, 0).cast("long").as("wq"))
    // materialize=false exposes the un-checkpointed plan (spec audits the
    // WindowGroupLimit pruning; sig is then recomputed per use)
    val sig = if (materialize) sigRaw.persist() else sigRaw
    val norms = sig.groupBy("doc_id").agg(sum(col("wq") * col("wq")).as("nsq"))
    val pairs = sig.select(col("doc_id").as("doc_a"), col("term"), col("wq").as("wa"))
      .join(sig.select(col("doc_id").as("doc_b"), col("term"), col("wq").as("wb")),
        Seq("term"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(col("wa") * col("wb")).as("dot"))
      .join(norms.select(col("doc_id").as("doc_a"), col("nsq").as("na")), Seq("doc_a"))
      .join(norms.select(col("doc_id").as("doc_b"), col("nsq").as("nb")), Seq("doc_b"))
      .withColumn("cos_sim",
        round(col("dot") / sqrt(col("na").cast("double") * col("nb")), 6))
      .where(col("cos_sim") >= tau)
      .select("doc_a", "doc_b", "cos_sim")
    if (materialize) materializePairs(pairs, sig) else pairs
  }

  /** VERBATIM-SPAN detection — exact substring overlap between document
    * pairs, the "exact substring dedup" of Lee et al.'s training-data
    * dedup recipe (suffix arrays there; equivalent n-gram diagonals
    * here, which is the formulation that distributes). Set-overlap
    * scores (Jaccard/MinHash) can miss a long quoted passage inside two
    * otherwise-different documents; this operator finds it exactly:
    * positional `gramN`-grams are equi-joined, and shared grams lying on
    * one DIAGONAL (pos_a - pos_b constant) at consecutive positions form
    * a verbatim token run of length `run + gramN - 1`. Reported per
    * pair: the longest such span and the total shared-gram count, for
    * spans >= minSpanTokens.
    *
    * Scale shape: the join key is the gram (inverted index — never
    * all-pairs); per-gram fan-out is bounded by `maxDf` exactly as in
    * [[jaccardPairsCapped]] (verbatim spans are made of CONSECUTIVE
    * grams, so dropping corpus-hot grams breaks a true span only when
    * every window of it is hot — boilerplate, which is what
    * TextAnalysis.boilerplate removes upstream). The run-length step
    * shuffles pair-diagonal rows, already candidate-sized; the
    * pa - row_number() run-grouping trick keeps it one window, no
    * iteration.
    */
  def verbatimSpans(docs: DataFrame, idCol: String, textCol: String,
      gramN: Int, minSpanTokens: Int, maxDf: Int = 1000): DataFrame = {
    val grams = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("__w"))
      .where(size(col("__w")) >= gramN)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, size(__w) - $gramN),
            i -> concat_ws(' ', slice(__w, i + 1, $gramN)))""")).as(Seq("pos", "gram")))
      .persist()
    val rare = grams.groupBy("gram").agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxDf).select("gram")
    val rg = grams.join(rare, Seq("gram"))
    val shared = rg.select(col("doc_id").as("doc_a"), col("pos").as("pa"), col("gram"))
      .join(rg.select(col("doc_id").as("doc_b"), col("pos").as("pb"), col("gram")),
        Seq("gram"))
      .where(col("doc_a") < col("doc_b"))
      .withColumn("diag", col("pa") - col("pb"))
    // consecutive pa on one (pair, diag) ⇒ one verbatim run: group by
    // pa - row_number(), a constant within each run
    val w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    val spans = shared
      .withColumn("__grp", col("pa") - row_number().over(w))
      .groupBy("doc_a", "doc_b", "diag", "__grp")
      .agg(count(lit(1)).as("__run"))
      .withColumn("span_tokens", col("__run") + lit(gramN - 1))
    val pairs = spans
      .groupBy("doc_a", "doc_b")
      .agg(max(col("span_tokens")).as("max_span"),
        sum(col("__run")).as("n_shared_grams"))
      .where(col("max_span") >= minSpanTokens)
    materializePairs(pairs, grams)
  }

  /** Near-dup pairs by Jaccard with DOCUMENT-FREQUENCY CAPPING: shingles
    * appearing in more than `maxDf` documents are excluded from CANDIDATE
    * GENERATION (verification still uses full shingle sets, so reported
    * jaccard values are exact). This is the standard stopword-shingle
    * suppression that makes the inverted-index self-join viable at
    * 100 TB: a shingle shared by d documents contributes d^2/2 candidate
    * rows, so the hottest few shingles dominate the join; capping bounds
    * per-shingle work at maxDf^2/2. Recall < 1 only for pairs whose EVERY
    * shared shingle is hot — near-dups share many shingles, so real pairs
    * keep colliding on the rare ones. Deterministic; the oracle mirrors
    * the same df filter.
    */
  def jaccardPairsCapped(docs: DataFrame, idCol: String, textCol: String,
      tau: Double, maxDf: Int): DataFrame = {
    val edges = shingleEdges(docs, idCol, textCol).persist()
    val sizes = shingleSizes(edges)
    // the HOT shingle set (by definition tiny) is the one df aggregate,
    // materialized ONCE: both edge splits consume the checkpointed set as
    // a broadcast side (anti-join = rare, join = hot). When the hot set
    // ever outgrew broadcast the corpus would be pathological — maxDf is
    // chosen so hot shingles are a handful of stopword-like outliers.
    val hotShingles = edges.groupBy("shingle").agg(count(lit(1)).as("__df"))
      .where(col("__df") > maxDf).select("shingle")
      .localCheckpoint()
    val rareEdges = edges.join(broadcast(hotShingles), Seq("shingle"), "left_anti")
    val hotEdges = edges.join(broadcast(hotShingles), Seq("shingle"))
    // single pass over RARE shingles: the self-join IS candidate
    // generation AND the rare part of the intersection count (per-shingle
    // fan-out bounded by maxDf^2/2); per-doc sizes and hot-shingle counts
    // attach via broadcast-sized joins, and the UPPER BOUND
    //   inter <= __ri + min(hot_a, hot_b)
    // prunes the candidate stream in the same pipeline (jaccard is
    // monotonic in inter, so no false negatives). Only the tiny survivor
    // set is materialized.
    val rareInter = rareEdges.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(rareEdges.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("__ri"))
    val hotCounts = hotEdges.groupBy("doc_id").agg(count(lit(1)).as("__nh"))
    // per-doc aggregates are orders of magnitude smaller than the pair
    // stream; hint broadcast (the static planner can't size a post-agg
    // side) so the four attaches stay shuffle-free map work. At corpus
    // sizes where a per-doc table outgrows broadcast, drop the hint and
    // these become co-partitioned SMJs on the pair stream's keys.
    val cand = rareInter
      .join(broadcast(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na"))), Seq("doc_a"))
      .join(broadcast(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb"))), Seq("doc_b"))
      .join(broadcast(hotCounts.select(col("doc_id").as("doc_a"), col("__nh").as("__ha"))), Seq("doc_a"), "left")
      .join(broadcast(hotCounts.select(col("doc_id").as("doc_b"), col("__nh").as("__hb"))), Seq("doc_b"), "left")
      .withColumn("__imax", col("__ri")
        + least(coalesce(col("__ha"), lit(0L)), coalesce(col("__hb"), lit(0L))))
      .where(col("__imax") / (col("na") + col("nb") - col("__imax")) >= tau)
      .localCheckpoint() // tiny; feeds both the hot count and the merge
    // exact hot contribution for survivors only, via each doc's
    // (by-definition tiny) hot-shingle list — NEVER a hot self-join,
    // which is exactly the d^2 blowup the cap exists to avoid
    val hotInter = cand.select("doc_a", "doc_b")
      .join(hotEdges.select(col("doc_id").as("doc_a"), col("shingle")), Seq("doc_a"))
      .join(hotEdges.select(col("doc_id").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("__hi"))
    val pairs = cand
      .join(hotInter, Seq("doc_a", "doc_b"), "left")
      .withColumn("inter", col("__ri") + coalesce(col("__hi"), lit(0L)))
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= tau)
      .select("doc_a", "doc_b", "jaccard")
    materializePairs(pairs, edges)
  }

  /** Pairs -> cleaned corpus: greedy lower-id-wins sweep. A document
    * survives unless it appears as the HIGHER id of any near-dup pair —
    * the standard practical closure of pairwise dedup (no transitive
    * clustering pass; deterministic; one anti-join). For full
    * connected-component canonicalization, iterate min-label
    * propagation over the pair graph instead.
    */
  def sweep(docs: DataFrame, idCol: String, pairs: DataFrame,
      broadcastRemovals: Boolean = true): DataFrame =
    // the removal list (distinct higher ids of near-dup pairs) is a small
    // fraction of the corpus, and pair sets arrive checkpointed — whose
    // stats the static planner can't see, so without the hint this anti
    // join would shuffle the whole corpus into an SMJ. Broadcast keeps the
    // corpus side map-only; pass broadcastRemovals = false if dup density
    // ever makes the removal list itself corpus-scale.
    docs.join(
      hintIf(broadcastRemovals)(pairs.select(col("doc_b").as(idCol)).distinct()),
      Seq(idCol), "left_anti")

  /** Connected components over the near-dup pair graph by min-label
    * propagation: every node repeatedly adopts the smallest label in its
    * neighborhood (including itself). Each iteration is one groupBy-min
    * over the edge list — the classic scale-out CC formulation (no
    * driver-side union-find). Labels advance one hop per iteration, so
    * `iterations` >= the component diameter guarantees convergence (near-
    * dup clusters are shallow in practice; [[connectedComponentsStar]]
    * provides the log-round variant for deep ones). Deterministic
    * for any fixed iteration count that reaches convergence.
    * Returns (doc_id, component) with component = min doc
    * id in the component — the canonical representative for FULL
    * transitive dedup (vs `sweep`'s greedy pairwise rule).
    */
  /** TRIANGLE participation counts over the dup-pair graph — the
    * density signal that separates template FAMILIES (every copy pairs
    * with every other ⇒ triangle-rich) from drift CHAINS (v1~v2~v3 but
    * v1!~v3 ⇒ triangle-free). Curation reads it directly: collapse a
    * dense cluster to one canonical doc; keep chain endpoints apart.
    *
    * Scale shape: the standard degree-ordered orientation — each
    * undirected edge points from its lexicographically smaller
    * (degree, id) endpoint, so every vertex's OUT-degree is O(√m) on
    * any graph and the wedge self-join (the only quadratic step) is
    * bounded per vertex, immune to the hub skew that kills the naive
    * id-ordered triple join. Joins are all equi-joins on vertex keys.
    * Counts are exact integers — orientation changes the join order,
    * never the triangle set (spec: ≡ the id-ordered reference join).
    */
  def triangleCounts(pairs: DataFrame): DataFrame = {
    val e = pairs.select(col("doc_a").as("u"), col("doc_b").as("v")).distinct()
    val deg = e.select(col("u").as("n")).union(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val uv = e
      .join(deg.select(col("n").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("d").as("dv")), Seq("v"))
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    // oriented edge src -> dst with (d_src, src) < (d_dst, dst); keep the
    // dst's degree so wedge pairs can be ordered the same way
    val oriented = uv.select(
      when(uFirst, col("u")).otherwise(col("v")).as("src"),
      when(uFirst, col("v")).otherwise(col("u")).as("dst"),
      when(uFirst, col("dv")).otherwise(col("du")).as("dd"))
      .localCheckpoint() // tiny (pair-graph-sized); feeds 3 joins
    val e1 = oriented.select(col("src"), col("dst").as("x"), col("dd").as("dx"))
    val e2 = oriented.select(col("src"), col("dst").as("y"), col("dd").as("dy"))
    val wedges = e1.join(e2, Seq("src"))
      .where(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
    val tris = wedges.join(
      oriented.select(col("src").as("x"), col("dst").as("y")), Seq("x", "y"))
      .select(col("src").as("a"), col("x").as("b"), col("y").as("c"))
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
  }

  def connectedComponents(pairs: DataFrame, iterations: Int,
      broadcastLabels: Boolean = false): DataFrame = {
    // ITERATIVE ALGORITHM: without lineage truncation each round's plan
    // embeds every previous round (and re-derives `pairs` from scratch),
    // so plans — and re-execution cost — grow linearly and memory
    // quadratically with iterations. localCheckpoint materializes each
    // round's labels and cuts the lineage, making every round O(1) plan;
    // the edge list is persisted once for the same reason.
    //
    // broadcastLabels: the label table has one row per NODE of the pair
    // graph — docs with at least one near-dup pair, typically a small
    // fraction of the corpus. With the hint, each round costs ONE shuffle
    // (the tiny partial-min aggregate) instead of three (edges-on-dst,
    // labels-on-id, plus the agg): both label joins become map-side
    // broadcast joins and the edge list never moves. Leave false when the
    // dup graph itself is corpus-scale (labels then exceed the broadcast
    // threshold) — the joins revert to co-partitioned shuffles.
    val hint: DataFrame => DataFrame =
      if (broadcastLabels) broadcast(_) else identity
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    val nodes = edges.select(col("src").as("doc_id")).distinct()
    // LAZY checkpoints for the inner rounds: each round's plan still ends
    // at a checkpoint boundary (O(1) plan depth, lineage cut), but no
    // per-round job is forced. The FINAL round checkpoints eagerly — one
    // action materializes the whole cascade (each round's blocks saved as
    // computed), after which the edge cache can be released safely.
    var labels = nodes.withColumn("component", col("doc_id"))
      .localCheckpoint(eager = false)
    for (it <- 0 until iterations) {
      val neighborMin = edges
        .join(hint(labels.select(col("doc_id").as("dst"), col("component"))), Seq("dst"))
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("component")).as("__nbr"))
      labels = labels.join(hint(neighborMin), Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("component"), coalesce(col("__nbr"), col("component"))).as("component"))
        .localCheckpoint(eager = it == iterations - 1)
    }
    // the final labels are materialized (checkpointed), so the edge cache
    // can be released; intermediate checkpoint blocks are reclaimed by
    // the ContextCleaner once their round's DataFrame is unreferenced
    edges.unpersist()
    labels
  }

  /** MULTI-SOURCE BFS over the pair graph: exact hop distance from a
    * seed set, `rounds` synchronous relaxations —
    * dist' = min(dist, min over neighbors (dist_nbr + 1)). The
    * dup-graph use is template-radius: how many hops every near-dup
    * sits from a hub/canonical node (radius > rounds ⇒ unreached,
    * reported as distance −1). Same per-round shape and lineage
    * discipline as [[connectedComponents]]: one aggregate over the
    * persisted edges + a broadcast-able distance attach per round.
    */
  def bfsDistance(pairs: DataFrame, seeds: DataFrame, rounds: Int,
      broadcastDist: Boolean = false): DataFrame = {
    val hint: DataFrame => DataFrame =
      if (broadcastDist) broadcast(_) else identity
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    val nodes = edges.select(col("src").as("doc_id")).distinct()
    // distinct: duplicate seed ids would fan the left join out and
    // double-count that node in every downstream histogram
    var dist = nodes
      .join(seeds.select(col("doc_id")).distinct()
        .select(col("doc_id"), lit(0L).as("__s")), Seq("doc_id"), "left")
      .select(col("doc_id"), when(col("__s").isNotNull, 0L).as("dist"))
      .localCheckpoint(eager = false)
    for (it <- 0 until rounds) {
      val nbr = edges
        .join(hint(dist.select(col("doc_id").as("dst"), col("dist"))), Seq("dst"))
        .where(col("dist").isNotNull)
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("dist") + 1).as("__nd"))
      dist = dist.join(hint(nbr), Seq("doc_id"), "left")
        .select(col("doc_id"), least(
          coalesce(col("dist"), col("__nd")),
          coalesce(col("__nd"), col("dist"))).as("dist"))
        .localCheckpoint(eager = it == rounds - 1)
    }
    edges.unpersist()
    dist.select(col("doc_id"), coalesce(col("dist"), lit(-1L)).as("dist"))
  }

  /** SYNCHRONOUS LABEL PROPAGATION (community detection): every node
    * starts labeled with its own id; each round it adopts the MODE of
    * its neighbors' previous-round labels, ties broken by the smallest
    * label — the deterministic variant of classic LPA (random-order
    * async LPA is irreproducible by design; the fixed round count plus
    * total tiebreak makes this one oracle-unrollable, the CC/PageRank
    * discipline). Unlike min-label components this converges to DENSE
    * communities: a bridge edge between two clusters does not merge
    * them, because the mode on each side stays local.
    *
    * Same scale shape as [[connectedComponents]]: the per-round work is
    * ONE (node, label) count aggregate over the edge list plus a
    * per-node top-1 window; with broadcastLabels the label attach never
    * moves the edges. localCheckpoint keeps every round O(1) plan.
    */
  def labelPropagation(pairs: DataFrame, iterations: Int,
      broadcastLabels: Boolean = false): DataFrame = {
    val hint: DataFrame => DataFrame =
      if (broadcastLabels) broadcast(_) else identity
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("label", col("doc_id"))
      .localCheckpoint(eager = false)
    val top1 = Window.partitionBy("doc_id")
      .orderBy(col("__c").desc, col("label").asc)
    for (it <- 0 until iterations) {
      // every node of the pair graph has >= 1 neighbor, so the inner
      // join loses nobody and no keep-own-label fallback is needed
      labels = edges
        .join(hint(labels.select(col("doc_id").as("dst"), col("label"))),
          Seq("dst"))
        .groupBy(col("src").as("doc_id"), col("label"))
        .agg(count(lit(1)).as("__c"))
        .withColumn("__rn", row_number().over(top1))
        .where(col("__rn") === 1)
        .select("doc_id", "label")
        .localCheckpoint(eager = it == iterations - 1)
    }
    edges.unpersist()
    labels
  }

  /** Rank grid for the integer-exact PageRank: ranks live as BIGINT
    * multiples of 1e-9 (r_grid = r * 1e9), so every iteration is pure
    * integer arithmetic — order-free and bit-identical in any engine.
    */
  val PageRankGrid = 1000000000L

  /** PageRank over the undirected near-dup pair graph — ranks the
    * AUTHORITY of each document inside its duplicate neighborhood (the
    * canonical-copy signal: keep the highest-ranked member of a cluster,
    * or weight sampling by it). Standard damped form, d = 0.85,
    * with every node having degree >= 1 by construction (no dangling
    * mass):
    *
    *   r'(v) = 0.15/N + 0.85 * Σ_{u~v} r(u)/deg(u)
    *
    * ALL-INTEGER evaluation on [[PageRankGrid]]: r is a grid BIGINT,
    * 0.85 = 17/20 and 0.15 = 3/20 are exact rationals, and every
    * division is truncating integer DIV (floor — operands are
    * non-negative) — so float summation order never exists and the
    * DuckDB oracle unrolls the fixed iteration count as CTE chains that
    * match bit for bit. The truncation sheds < 1 grid unit (1e-9) of
    * mass per division — deterministic, mirrored, and irrelevant at
    * ranking granularity.
    *
    * Scale/iteration mechanics follow [[connectedComponents]]: per-round
    * lineage cut (lazy inner checkpoints, eager final), persisted edge
    * list released after materialization, and a broadcastRanks opt-out
    * for when the dup graph itself outgrows broadcast.
    *
    * Output: (doc_id, pr_grid) — rank as the exact grid BIGINT.
    */
  def pageRank(pairs: DataFrame, iterations: Int,
      broadcastRanks: Boolean = true): DataFrame = {
    val hint = hintIf(broadcastRanks) _
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = edges.select(col("src").as("doc_id")).distinct()
    val nRow = nodes.agg(count(lit(1)).as("__n"))
    var ranks = nodes.crossJoin(broadcast(nRow))
      .select(col("doc_id"), expr(s"${PageRankGrid}L DIV __n").as("r"))
      .localCheckpoint(eager = false)
    for (it <- 0 until iterations) {
      val contrib = edges
        .join(hint(ranks.select(col("doc_id").as("src"), col("r"))), Seq("src"))
        .join(hint(deg), Seq("src"))
        .select(col("dst").as("doc_id"), expr("r DIV deg").as("__c"))
        .groupBy("doc_id").agg(sum(col("__c")).as("__s"))
      ranks = nodes.crossJoin(broadcast(nRow))
        .join(hint(contrib), Seq("doc_id"), "left")
        .select(col("doc_id"),
          (expr(s"${3L * PageRankGrid}L DIV (20L * __n)") +
            expr("(17L * coalesce(__s, 0L)) DIV 20L")).as("r"))
        .localCheckpoint(eager = it == iterations - 1)
    }
    edges.unpersist()
    ranks.select(col("doc_id"), col("r").as("pr_grid"))
  }

  /** Pairs -> cleaned corpus with transitive semantics: every document
    * that is not its component's minimum id is removed — one survivor per
    * CONVERGED cluster (convergence needs `connectedComponents`
    * iterations >= the cluster diameter; an under-iterated chain leaves
    * one survivor per still-distinct label). Differs from `sweep`'s
    * greedy doc_b rule where a doc appears only on the doc_a side: pairs
    * (A,C),(B,C) with A<B — greedy keeps both A and B, this keeps only A
    * (B is in A's component). `labels` is `connectedComponents` output;
    * docs absent from it have no pairs and survive untouched.
    */
  def sweepByComponent(docs: DataFrame, idCol: String,
      labels: DataFrame, broadcastRemovals: Boolean = true): DataFrame =
    // labels cover only pair-graph nodes (docs with a near-dup), so the
    // non-minimum member list is small; broadcast for the same reason as
    // [[sweep]] — labels arrive checkpointed with unknown stats. Opt out
    // via broadcastRemovals when dup density makes the list corpus-scale.
    docs.join(
      hintIf(broadcastRemovals)(labels.where(col("component") =!= col("doc_id"))
        .select(col("doc_id").as(idCol))),
      Seq(idCol), "left_anti")

  /** Connected components by alternating LARGE-STAR / SMALL-STAR rounds —
    * the log-convergence formulation (Kiveris et al., "Connected
    * Components in MapReduce and Beyond"): each round rewires edges
    * toward per-neighborhood minima, so path lengths roughly halve per
    * round and a diameter-D component converges in O(log D) rounds where
    * min-label propagation needs D. The 100 TB path for DEEP clusters;
    * `connectedComponents` stays the simple choice for the shallow ones
    * near-dup graphs usually produce.
    *
    *  - large-star(u): m = min(N(u) ∪ u); for v in N(u), v > u: edge (v,m)
    *  - small-star(u): m = min(N(u) ∪ u); for v in N(u) ∪ u, v <= u:
    *    edge (v,m)
    *
    * Both preserve connectivity; the fixed point is a star per component
    * centered at its minimum. Convergence is detected by edge-set
    * equality against the previous round, so reaching the fixed point at
    * round N is DETECTED at round N+1 — `maxRounds` must exceed the
    * rounds-to-fixed-point by one (log-round convergence leaves the
    * default ample headroom; diameter 2^18 needs ~19). Returns (doc_id,
    * component), component = min id, identical to `connectedComponents`
    * output at convergence.
    */
  def connectedComponentsStar(pairs: DataFrame, maxRounds: Int = 20): DataFrame = {
    def canonical(df: DataFrame): DataFrame =
      df.where(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
        .distinct()
    def adj(edges: DataFrame): DataFrame =
      edges.select(col("a").as("node"), col("b").as("nbr"))
        .union(edges.select(col("b").as("node"), col("a").as("nbr")))
    // m per node: min over neighborhood incl. self
    def mins(adjacency: DataFrame): DataFrame =
      adjacency.groupBy("node").agg(min(col("nbr")).as("__mn"))
        .select(col("node"), least(col("node"), col("__mn")).as("m"))
    def largeStar(edges: DataFrame): DataFrame = {
      val a = adj(edges)
      canonical(a.join(mins(a), Seq("node"))
        .where(col("nbr") > col("node"))
        .select(col("nbr").as("a"), col("m").as("b")))
    }
    def smallStar(edges: DataFrame): DataFrame = {
      val a = adj(edges)
      val withM = mins(a)
      val fromNbrs = a.join(withM, Seq("node"))
        .where(col("nbr") <= col("node"))
        .select(col("nbr").as("a"), col("m").as("b"))
      val fromSelf = withM.select(col("node").as("a"), col("m").as("b"))
      canonical(fromNbrs.union(fromSelf))
    }
    // the pairs lineage (typically the expensive LSH candidate join) is
    // materialized exactly ONCE; edges and the node set both read the
    // checkpointed blocks
    val raw = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .localCheckpoint()
    var edges = canonical(raw).localCheckpoint()
    // node set from the RAW pairs: a self-pair (x,x) contributes node x
    // (labelled x), matching connectedComponents — canonical() would drop
    // it before it reaches the edge list
    val inputNodes = raw.select(col("a").as("doc_id"))
      .union(raw.select(col("b").as("doc_id"))).distinct().localCheckpoint()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      // both sides are distinct sets, so equal counts + empty one-sided
      // difference is full set equality (one anti-join, not two)
      converged = next.count() == edges.count() && next.exceptAll(edges).isEmpty
      edges = next
      round += 1
    }
    // silent non-convergence would hand a consumer (e.g. sweepByComponent)
    // labels where one component carries several ids — fail loudly; the
    // caller raises maxRounds (log-round convergence makes 20 cover
    // diameters past 100k)
    require(converged,
      s"connectedComponentsStar: fixed point not detected within $maxRounds " +
        "rounds (detection costs one round past convergence — raise maxRounds)")
    // fixed point is a star (member, min): label = min over neighbors+self
    val labels = mins(adj(edges))
      .select(col("node").as("doc_id"), col("m").as("component"))
    // star centers keep themselves; nodes that became isolated mid-stream
    // (every neighbor rewired past them) still label themselves
    inputNodes.join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
  }

  /** K-CORE of the near-dup pair graph by iterative degree peeling:
    * each round drops nodes with within-graph degree < k (and their
    * edges), for a FIXED round count — the maximal subgraph where every
    * member has >= k surviving neighbors, the density signal that
    * separates template FAMILIES (boilerplate cores every member of
    * which duplicates k+ others — collapse aggressively) from drift
    * CHAINS and stars (peel to empty — review members individually).
    * Complements triangleCounts: a 2-core keeps exactly the cyclic
    * mass, and k is tunable where triangles are fixed-motif.
    *
    * Fixed `rounds` rather than converge-detect: both engines run the
    * identical schedule, so the gate is exact even if a pathological
    * graph hasn't stabilized (the CC/PageRank oracle-unrolling
    * discipline; peeling converges in a handful of rounds on shallow
    * dup graphs). Each round is ONE degree aggregate + two semi-joins;
    * with `broadcastKeep` (default — survivors of a dup graph are a
    * small fraction of a corpus) the edge list never shuffles and a
    * round costs one tiny exchange, the connectedComponents shape.
    * Lineage is cut per round (lazy checkpoints, final eager).
    *
    * Returns surviving (doc_id, core_deg) — core members with their
    * final within-core degree (>= k at a fixed point).
    */
  def kCore(pairs: DataFrame, k: Int, rounds: Int,
      broadcastKeep: Boolean = true): DataFrame = {
    val hint = hintIf(broadcastKeep) _
    var edges = pairs
      .select(col("doc_a").as("s"), col("doc_b").as("d"))
      .union(pairs.select(col("doc_b").as("s"), col("doc_a").as("d")))
      .localCheckpoint(eager = false)
    for (it <- 0 until rounds) {
      val keep = edges.groupBy("s").agg(count(lit(1)).as("__deg"))
        .where(col("__deg") >= k).select("s")
      edges = edges
        .join(hint(keep), Seq("s"), "left_semi")
        .join(hint(keep.select(col("s").as("d"))), Seq("d"), "left_semi")
        .localCheckpoint(eager = it == rounds - 1)
    }
    edges.groupBy("s").agg(count(lit(1)).cast("int").as("core_deg"))
      .select(col("s").as("doc_id"), col("core_deg"))
  }

  /** Large prime modulus for the permutation family (2^31 - 1). */
  val MinhashMod = 2147483647L
  /** Permutation j: h_j(x) = ((37 j + 11) x + 101 j + 7) mod P. */
  def permute(j: Column, x: Column): Column =
    ((lit(37L) * j + 11L) * x + lit(101L) * j + 7L) % MinhashMod

  /** Shingle -> integer id, plus a release handle for any cache the
    * mapping pinned. Three modes:
    *  - DenseId: lexicographic rank of the distinct vocabulary —
    *    oracle-reproducible but pays a distinct + range-sort + join.
    *  - PolyHash: polynomial rolling hash over the shingle's characters,
    *    (acc*31 + codepoint) mod P — oracle-reproducible (DuckDB computes
    *    the identical integer fold) AND shuffle-free: the id is a codegen
    *    scalar expression, so nothing is sorted, joined, or cached. The
    *    default oracle-parity mode; at 100 TB there is no vocabulary
    *    structure at all.
    *  - XxHash: xxhash64 & (2^31-1) — fastest, engine-specific values
    *    (rows-only check).
    */
  private def shingleIds(edges: DataFrame,
      mode: HashMode): (DataFrame, () => Unit) = mode match {
    case DenseId =>
      // lexicographic rank WITHOUT a global single-partition window:
      // range-partition the distinct vocabulary on the shingle, sort each
      // partition, and number rows contiguously (zipWithIndex follows
      // partition order, and range partitions tile the total order, so
      // the result is exactly row_number() OVER (ORDER BY shingle) — but
      // every stage is parallel and nothing ever sits on one thread).
      // The distinct vocabulary is persisted because three consumers pull
      // on it (the range-partitioner's sample pass, zipWithIndex's
      // partition-count job — which runs eagerly right here — and the
      // rank join); the returned release() drops it once the caller has
      // materialized downstream results.
      val spark = edges.sparkSession
      import spark.implicits._
      val parts = spark.sessionState.conf.numShufflePartitions
      val distinctV = edges.select("shingle").distinct().persist()
      val vocab = distinctV
        .repartitionByRange(parts, col("shingle"))
        .sortWithinPartitions("shingle")
        .as[String].rdd.zipWithIndex()
        .map { case (s, i) => (s, i + 1L) }
        .toDF("shingle", "sid")
      (edges.join(vocab, Seq("shingle")).select("doc_id", "sid"),
        () => { distinctV.unpersist(); () })
    case PolyHash =>
      graft.functions.GraftFunctions.register(edges.sparkSession)
      (edges.select(col("doc_id"), polyHash(col("shingle")).as("sid")),
        () => ())
    case XxHash =>
      (edges.select(col("doc_id"),
        abs(xxhash64(col("shingle")) % MinhashMod).as("sid")),
        () => ())
  }

  /** Polynomial rolling hash over a string's characters:
    * fold(0, c -> (acc * 31 + codepoint(c)) mod P). Pure integer
    * arithmetic (max intermediate < 2^36), identical in any engine that
    * can fold over characters — the DuckDB twin is a list_reduce over
    * regexp_extract_all(s, '(?s).'). Fast path: the graft_polyhash native
    * expression (see functions/PolyHash.scala) — a zero-allocation byte
    * loop in whole-stage codegen; requires GraftFunctions.register /
    * GraftExtensions on the session.
    */
  def polyHash(s: Column): Column =
    call_function(graft.functions.GraftFunctions.PolyHashName, s)

  /** Built-in-HOF twin of [[polyHash]] (per-char array + lambda fold) —
    * kept for bit-equality cross-checks of the native kernel.
    */
  def polyHashFold(s: Column): Column =
    aggregate(
      regexp_extract_all(s, lit("(?s)."), lit(0)),
      lit(0L),
      (acc, ch) => (acc * 31L + ascii(ch)) % MinhashMod)

  /** Wide MinHash signatures: numPerm permutations of the shingle-id
    * universe, min per (doc, permutation), as ONE row per doc with columns
    * m0..m{numPerm-1}. numPerm min-aggregates in a single groupBy —
    * map-side partial min, no numPerm-x row explode; the shuffle carries
    * one row per (partition, doc).
    */
  def minhashWide(edges: DataFrame, numPerm: Int, mode: HashMode): DataFrame =
    // inspectable wrapper: drops the vocab release handle, leaving the
    // (small) distinct-vocabulary cache to the ContextCleaner. The pair
    // operators use the releasable variant and free it deterministically.
    minhashWideReleasable(edges, numPerm, mode)._1

  private def minhashWideReleasable(edges: DataFrame, numPerm: Int,
      mode: HashMode): (DataFrame, () => Unit) = {
    val (ids, release) = shingleIds(edges, mode)
    val mins = (0 until numPerm).map { j =>
      min(permute(lit(j.toLong), col("sid"))).as(s"m$j")
    }
    (ids.groupBy("doc_id").agg(mins.head, mins.tail: _*), release)
  }

  /** MinHash signatures in long form (doc_id, j, minh) — the wide frame
    * unpivoted. Kept as the inspectable/testable shape; the LSH banding
    * reads the wide frame directly (band keys are just column tuples, no
    * re-grouping).
    */
  def minhashSignatures(edges: DataFrame, numPerm: Int,
      mode: HashMode): DataFrame = {
    val stacked = (0 until numPerm).map(j => s"${j}L, m$j").mkString(", ")
    minhashWide(edges, numPerm, mode)
      .selectExpr("doc_id", s"stack($numPerm, $stacked) AS (j, minh)")
  }

  /** MinHash + LSH banding: signatures split into bands of `rowsPerBand`,
    * docs sharing any full band become candidates (equi-join on the band
    * key — never all-pairs), then exact Jaccard >= tau verification.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      numPerm: Int, rowsPerBand: Int, tau: Double,
      mode: HashMode = XxHash): DataFrame = {
    // the edge list feeds the vocabulary, the signatures, the set sizes,
    // and both verification joins — persist it once (a few MB per million
    // docs of shingle strings; MEMORY_AND_DISK by default) instead of
    // re-running the explode+distinct per consumer
    val edges = shingleEdges(docs, idCol, textCol).persist()
    val (pairs, releaseVocab) = minhashLshPairsOnEdges(edges, numPerm, rowsPerBand, tau, mode)
    val out = materializePairs(pairs, edges)
    releaseVocab()
    out
  }

  /** Edge-level core of [[minhashLshPairs]] — callers own the edge cache
    * lifecycle (lets [[ensemblePairs]] share ONE edge build across
    * detectors). Returns the unmaterialized pair frame plus the vocab
    * release handle; call it only after materializing downstream results.
    */
  private def minhashLshPairsOnEdges(edges: DataFrame, numPerm: Int,
      rowsPerBand: Int, tau: Double, mode: HashMode): (DataFrame, () => Unit) = {
    val (candidates, releaseVocab) = minhashBandCandidates(edges, numPerm, rowsPerBand, mode)
    (verifiedJaccard(candidates, edges, tau), releaseVocab)
  }

  /** LSH band-sharing candidate pairs (doc_a < doc_b, distinct) —
    * signature build + band equi-join WITHOUT the exact-Jaccard verify,
    * so [[ensemblePairs]] can verify against an already-computed scored
    * pair stream instead of re-joining the edge list.
    */
  private def minhashBandCandidates(edges: DataFrame, numPerm: Int,
      rowsPerBand: Int, mode: HashMode): (DataFrame, () => Unit) = {
    val (wide, releaseVocab) = minhashWideReleasable(edges, numPerm, mode)
    // band b's bucket key is the tuple (m[b*r] .. m[b*r + r-1]) read
    // straight off the wide signature row — one stack() per doc, no
    // re-grouping shuffle and no string bucket encoding. Same candidate
    // set as joining on a serialized bucket: tuple equality IS band
    // equality.
    val keyCols = bandKeyCols(rowsPerBand)
    val buckets = bandBuckets(wide, numPerm, rowsPerBand)
    val candidates = buckets.toDF("doc_a" +: "band" +: keyCols: _*)
      .join(buckets.toDF("doc_b" +: "band" +: keyCols: _*),
        Seq("band") ++ keyCols)
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    (candidates, releaseVocab)
  }

  private def bandKeyCols(rowsPerBand: Int): Seq[String] =
    (0 until rowsPerBand).map(r => s"k$r")

  /** Band rows off the wide signature: (doc_id, band, k0..k{r-1}) — one
    * stack() per doc, no re-grouping shuffle and no string bucket
    * encoding; tuple equality IS band equality.
    */
  private def bandBuckets(wide: DataFrame, numPerm: Int,
      rowsPerBand: Int): DataFrame = {
    val numBands = numPerm / rowsPerBand
    val stackRows = (0 until numBands).map { b =>
      s"${b}L, " + (0 until rowsPerBand).map(r => s"m${b * rowsPerBand + r}").mkString(", ")
    }.mkString(", ")
    wide.selectExpr("doc_id",
      s"stack($numBands, $stackRows) AS (band, ${bandKeyCols(rowsPerBand).mkString(", ")})")
  }

  /** TWO-STAGE fuzzy dedup with EDIT-DISTANCE verification: MinHash band
    * candidates re-scored by normalized Levenshtein similarity
    * 1 - lev(a,b)/max(|a|,|b|) — the character-level verifier that
    * catches what set-similarity can't distinguish (word reorderings
    * score high Jaccard but low edit similarity; small in-place edits
    * score high on both). The O(L²)-per-pair DP runs ONLY on the
    * band-candidate list (never all pairs), and both texts are capped at
    * `maxChars` so the worst pair costs a bounded maxChars² — the knob
    * that keeps a pathological 1 GB document from stalling an executor
    * at 100 TB. Texts attach to the candidate list by joining the pair
    * frame (tiny) onto the corpus twice; the corpus is never shuffled —
    * the candidate side broadcasts.
    */
  def editVerifiedPairs(docs: DataFrame, idCol: String, textCol: String,
      numPerm: Int, rowsPerBand: Int, simTau: Double, maxChars: Int,
      mode: HashMode = XxHash, materialize: Boolean = true): DataFrame = {
    val edges = shingleEdges(docs, idCol, textCol).persist()
    val (candidates, releaseVocab) =
      minhashBandCandidates(edges, numPerm, rowsPerBand, mode)
    val txt = docs.select(col(idCol).as("doc_id"),
      substring(col(textCol), 1, maxChars).as("__txt"))
    val verified = txt.select(col("doc_id").as("doc_a"), col("__txt").as("__ta"))
      .join(broadcast(candidates), Seq("doc_a"))
      .join(txt.select(col("doc_id").as("doc_b"), col("__txt").as("__tb")),
        Seq("doc_b"))
      .withColumn("lev_dist",
        levenshtein(col("__ta"), col("__tb")).cast("long"))
      .withColumn("edit_sim",
        round(lit(1.0) - col("lev_dist") /
          greatest(length(col("__ta")), length(col("__tb"))), 6))
      .where(col("edit_sim") >= simTau)
      .select("doc_a", "doc_b", "lev_dist", "edit_sim")
    if (!materialize) {
      // Plan-inspection path (ScaleSpec): release the cached edge list and
      // vocab NOW — the returned plan stays executable (it just recomputes)
      // and nothing stays pinned in executor memory for the session.
      releaseVocab()
      edges.unpersist()
      return verified
    }
    val out = materializePairs(verified, edges)
    releaseVocab()
    out
  }

  /** Per-document DUPLICATED-NGRAM COVERAGE: the fraction of a doc's
    * distinct 3-gram shingles that also appear in at least `minDf - 1`
    * OTHER documents — the RefinedWeb/Gopher cross-doc contamination
    * signal a pipeline uses as a doc-level drop rule when pair-level
    * dedup is too expensive or too aggressive. One explode feeds both
    * the document-frequency aggregate and the per-doc rollup; the only
    * corpus-sized shuffle is the df groupBy on the shingle key — the
    * same key the near-dup family already shuffles on. Per-doc coverage
    * comes from a join of the edge list with the df table on shingle —
    * both join inputs are the SAME shingle-partitioned exchange of the
    * edge list (one side aggregated), so Spark plans a ReusedExchange:
    * the explode is computed and shuffled ONCE (no cache, no
    * checkpoint — corpus-sized state never pins executor memory) — and
    * one groupBy(doc). No pair stream exists at all: cost is linear in
    * the edge list, which is why this is the operator that still runs
    * where the quadratic-candidate family needs DF caps.
    */
  def dupShingleCoverage(docs: DataFrame, idCol: String, textCol: String,
      minDf: Int): DataFrame = {
    // the distinct is a DEDUPE no-op (the generator already emits each
    // doc's shingle set) kept as the shared-exchange barrier: both
    // consumers need (doc_id, shingle), so column pruning cannot split
    // their subtrees and the df aggregate + coverage join read ONE
    // exchange of the edge list (ReusedExchange, spec-pinned). A bare
    // repartition(shingle) loses the reuse — pruning drops doc_id below
    // one copy and the subtrees stop being identical (measured r13).
    val edges = shingleEdges(docs, idCol, textCol).distinct()
    val df = edges.groupBy("shingle").agg(count(lit(1)).as("__df"))
    edges.join(df, Seq("shingle"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__df") >= minDf, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_frac", round(col("n_dup") / col("n_shingles"), 6))
  }

  /** LEXICAL top-k retrieval by n-gram Jaccard: for each query document,
    * the k highest-Jaccard corpus documents (rank ties broken by id) —
    * the sparse leg of hybrid search ([[Similarity.hybridRrfTopK]]).
    * Same inverted-index discipline as the pair operators: the only
    * corpus-sized work is the shingle equi-join, bounded by the QUERY
    * side's shingle list; sizes attach broadcast; the per-query window
    * runs on the scored candidate list, compiled to WindowGroupLimit.
    */
  def jaccardTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame = {
    val edges = shingleEdges(corpus, idCol, textCol).persist()
    val qids = queries.select(col(idCol).as("q_id"))
    val qEdges = edges.join(broadcast(qids),
      edges("doc_id") === qids("q_id")).select(col("q_id"), col("shingle"))
    val sizes = shingleSizes(edges)
    val scored = qEdges
      .join(edges.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
      .where(col("q_id") =!= col("doc_b"))
      .groupBy("q_id", "doc_b").agg(count(lit(1)).as("inter"))
      .join(broadcast(sizes.select(col("doc_id").as("q_id"), col("n_sh").as("na"))), Seq("q_id"))
      .join(broadcast(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb"))), Seq("doc_b"))
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
    val w = Window.partitionBy("q_id").orderBy(col("jaccard").desc, col("doc_b").asc)
    materializePairs(
      scored.withColumn("rnk", row_number().over(w).cast("int"))
        .where(col("rnk") <= k)
        .select(col("q_id"), col("rnk"), col("doc_b").as("neighbor_id")),
      edges)
  }

  /** LSH BAND-SWEEP — the (bands × rows) operating-point curve every
    * MinHash deployment tunes before a 100 TB run: for each rowsPerBand
    * r in the ladder (bands = numPerm / r), the candidate-pair volume
    * the banding surfaces (the verification COST) and the fraction of
    * the exact-Jaccard >= tau truth those candidates recover (the
    * RECALL). Fewer rows per band -> looser buckets -> more candidates
    * -> higher recall; since a pair sharing an r-row band shares every
    * divisor-width sub-band, candidate sets are NESTED down the ladder
    * and both counts are monotone in r (DedupSpec asserts it).
    *
    * ONE signature build is shared across every ladder point (the wide
    * frame persists; each banding is just a stack() re-read) and the
    * truth pair set is computed once — the sweep costs one exact-Jaccard
    * pass plus |ladder| band self-joins, never |ladder| signature
    * builds.
    */
  def minhashBandSweep(docs: DataFrame, idCol: String, textCol: String,
      numPerm: Int, rowsLadder: Seq[Int], tau: Double,
      mode: HashMode = XxHash): DataFrame = {
    val edges = shingleEdges(docs, idCol, textCol).persist()
    val truth = scoredIntersectionPairsOnEdges(edges, "jaccard",
        (inter, na, nb) => inter / (na + nb - inter), tau,
        broadcastSizes = true)
      .select("doc_a", "doc_b").localCheckpoint()
    val (wide0, releaseVocab) = minhashWideReleasable(edges, numPerm, mode)
    val wide = wide0.persist()
    val truthCnt = truth.agg(count(lit(1)).as("n_truth"))
    val rows = rowsLadder.map { r =>
      val keyCols = bandKeyCols(r)
      val buckets = bandBuckets(wide, numPerm, r)
      val cand = buckets.toDF("doc_a" +: "band" +: keyCols: _*)
        .join(buckets.toDF("doc_b" +: "band" +: keyCols: _*),
          Seq("band") ++ keyCols)
        .where(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
        .localCheckpoint(eager = false)
      val candCnt = cand.agg(count(lit(1)).as("n_cand"))
      val hitCnt = cand.join(truth, Seq("doc_a", "doc_b"), "left_semi")
        .agg(count(lit(1)).as("n_pairs"))
      candCnt.crossJoin(hitCnt).crossJoin(truthCnt)
        .select(lit(r).cast("int").as("rows_per_band"),
          lit(numPerm / r).cast("int").as("n_bands"),
          col("n_cand"), col("n_pairs"),
          round(col("n_pairs") / col("n_truth"), 6).as("pair_recall"))
    }
    val out = rows.reduce(_.unionAll(_)).localCheckpoint()
    releaseVocab(); wide.unpersist(); edges.unpersist()
    out
  }

  /** MinHash ESTIMATOR-ERROR audit: for every band-sharing candidate
    * pair, the signature's Jaccard estimate (matching permutations /
    * numPerm — the unbiased MinHash estimator) next to the EXACT Jaccard
    * and the absolute error. This is the statistical quality audit of
    * the sketch itself — the number that justifies numPerm before a
    * 100 TB run (E[err] ~ 1/sqrt(numPerm)); pairs sharing a band but NO
    * shingle (bucket collisions) surface with exact 0.
    *
    * Scale shape: the estimate is a per-pair comparison of two WIDE
    * signature rows (numPerm equality folds, no per-permutation
    * explode); the exact side reuses the inverted-index intersection
    * stream. Everything pair-wise runs on the candidate list.
    */
  def minhashEstimateAudit(docs: DataFrame, idCol: String, textCol: String,
      numPerm: Int, rowsPerBand: Int, mode: HashMode = XxHash): DataFrame = {
    val edges = shingleEdges(docs, idCol, textCol).persist()
    val (wide0, releaseVocab) = minhashWideReleasable(edges, numPerm, mode)
    val wide = wide0.persist()
    val keyCols = bandKeyCols(rowsPerBand)
    val buckets = bandBuckets(wide, numPerm, rowsPerBand)
    val cand = buckets.toDF("doc_a" +: "band" +: keyCols: _*)
      .join(buckets.toDF("doc_b" +: "band" +: keyCols: _*), Seq("band") ++ keyCols)
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val matchCount = (0 until numPerm)
      .map(j => when(col(s"a_m$j") === col(s"b_m$j"), 1).otherwise(0))
      .reduce(_ + _)
    val wa = wide.toDF("doc_a" +: (0 until numPerm).map(j => s"a_m$j"): _*)
    val wb = wide.toDF("doc_b" +: (0 until numPerm).map(j => s"b_m$j"): _*)
    val est = cand.join(wa, Seq("doc_a")).join(wb, Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (matchCount / lit(numPerm.toDouble)).as("est"))
    val sizes = shingleSizes(edges)
    val inter = edges.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(edges.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    val out = est.join(inter, Seq("doc_a", "doc_b"), "left")
      .join(broadcast(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na"))), Seq("doc_a"))
      .join(broadcast(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb"))), Seq("doc_b"))
      .withColumn("__i", coalesce(col("inter"), lit(0L)))
      .withColumn("__j", col("__i") / (col("na") + col("nb") - col("__i")))
      .select(col("doc_a"), col("doc_b"),
        round(col("est"), 6).as("est_jaccard"),
        round(col("__j"), 6).as("jaccard"),
        round(abs(col("est") - col("__j")), 6).as("abs_err"))
    val res = materializePairs(out, edges)
    releaseVocab(); wide.unpersist()
    res
  }

  /** PRECISION/RECALL CURVE of the MinHash detector over an estimate-
    * threshold ladder — the operating-point table behind choosing the
    * verification cutoff: for each threshold k (in matching-perm UNITS,
    * so the sweep compares exact integers, never floats), the detector
    * set is {band candidates with ≥ k matching perms} and is scored
    * against the exact-Jaccard ≥ tau truth. Recall's denominator is ALL
    * truth pairs — including those the banding never surfaced — so the
    * curve exposes the candidate-generation miss floor that a
    * candidates-only audit ([[minhashEstimateAudit]]) cannot see.
    *
    * Scale shape: one edge build feeds the signature aggregate, the
    * band self-join, and the truth pass; everything past the scored
    * streams is pair-list-sized, and the k-sweep explodes literals over
    * the candidate pair list. Truth-ness decides on the cross-
    * multiplied integers i·100 ≥ tauPct·(union) — identical arithmetic
    * in the oracle, no float threshold anywhere.
    */
  def minhashPrCurve(docs: DataFrame, idCol: String, textCol: String,
      numPerm: Int, rowsPerBand: Int, tauPct: Int, ks: Seq[Int],
      mode: HashMode = XxHash): DataFrame = {
    val edges = shingleEdges(docs, idCol, textCol).persist()
    val (wide0, releaseVocab) = minhashWideReleasable(edges, numPerm, mode)
    val wide = wide0.persist()
    val keyCols = bandKeyCols(rowsPerBand)
    val buckets = bandBuckets(wide, numPerm, rowsPerBand)
    val cand = buckets.toDF("doc_a" +: "band" +: keyCols: _*)
      .join(buckets.toDF("doc_b" +: "band" +: keyCols: _*), Seq("band") ++ keyCols)
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val matchCount = (0 until numPerm)
      .map(j => when(col(s"a_m$j") === col(s"b_m$j"), 1).otherwise(0))
      .reduce(_ + _)
    val wa = wide.toDF("doc_a" +: (0 until numPerm).map(j => s"a_m$j"): _*)
    val wb = wide.toDF("doc_b" +: (0 until numPerm).map(j => s"b_m$j"): _*)
    val sizes = shingleSizes(edges)
    val inter = edges.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(edges.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      .join(broadcast(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na"))), Seq("doc_a"))
      .join(broadcast(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb"))), Seq("doc_b"))
      .withColumn("is_truth",
        (col("inter") * 100 >= lit(tauPct) * (col("na") + col("nb") - col("inter")))
          .cast("int"))
      .localCheckpoint()
    val truth = inter.agg(sum(col("is_truth")).as("n_truth"))
    val ce = cand.join(wa, Seq("doc_a")).join(wb, Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), matchCount.as("m"))
      .join(inter.select("doc_a", "doc_b", "is_truth"), Seq("doc_a", "doc_b"), "left")
      .na.fill(0, Seq("is_truth"))
    val out = ce
      .withColumn("k", explode(array(ks.map(lit): _*)))
      .where(col("m") >= col("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_det"),
        sum(col("is_truth")).cast("long").as("n_hit"))
      .crossJoin(broadcast(truth))
      .select(round(col("k") / numPerm.toDouble, 4).as("t"),
        col("n_det"), col("n_hit"), col("n_truth"),
        round(col("n_hit") / col("n_det"), 6).as("prec"),
        round(col("n_hit") / col("n_truth"), 6).as("rec"),
        round(lit(2) * col("n_hit") / (col("n_det") + col("n_truth")), 6).as("f1"))
    val res = materializePairs(out, edges)
    releaseVocab(); wide.unpersist()
    res
  }

  /** INCREMENTAL dedup — the daily-crawl shape: near-dups of the
    * `incoming` batch AGAINST the `existing` corpus (bipartite — the
    * corpus is never self-joined; intra-batch dups are [[minhashLshPairs]]
    * on the batch alone). The content-derived hash modes (PolyHash /
    * XxHash) are what make this incremental at all: signatures depend
    * only on document text, so the existing side's signature/band table
    * is computed ONCE, stored, and probed by each increment — the
    * per-batch cost is O(batch) signature work plus a band equi-join
    * against the stored index, never a corpus re-scan. (DenseId is
    * rejected: vocabulary ranks shift with every increment, silently
    * invalidating stored signatures.)
    *
    * Scale shape: identical discipline to the self-join variant — band
    * tuples are the inverted index; candidate fan-out per (band, bucket)
    * is |existing in bucket| × |incoming in bucket|; exact-Jaccard
    * verification touches candidate docs only.
    */
  def incrementalMinhashDups(existing: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String, numPerm: Int, rowsPerBand: Int,
      tau: Double, mode: HashMode = XxHash): DataFrame = {
    require(mode != DenseId,
      "DenseId signatures are vocabulary-relative and cannot be stored across increments")
    val exEdges = shingleEdges(existing, idCol, textCol).persist()
    val (exWide, _) = minhashWideReleasable(exEdges, numPerm, mode)
    val out = incrementalFromIndex(
      bandBuckets(exWide, numPerm, rowsPerBand), exEdges,
      incoming, idCol, textCol, numPerm, rowsPerBand, tau, mode)
    exEdges.unpersist()
    out
  }

  /** The bipartite candidate + exact-Jaccard-verify chain shared by
    * [[incrementalMinhashDups]] (existing-side index built in-plan) and
    * [[probeMinhashIndex]] (index re-read from parquet): probe the
    * `incoming` batch against a prebuilt existing-side band index +
    * shingle-edge table. exBands columns: (doc_id, band, k0..k{r-1});
    * exEdges: (doc_id, shingle).
    */
  private def incrementalFromIndex(exBands: DataFrame, exEdges: DataFrame,
      incoming: DataFrame, idCol: String, textCol: String, numPerm: Int,
      rowsPerBand: Int, tau: Double, mode: HashMode,
      materialize: Boolean = true): DataFrame = {
    val inEdges = shingleEdges(incoming, idCol, textCol).persist()
    val (inWide, _) = minhashWideReleasable(inEdges, numPerm, mode)
    val keyCols = bandKeyCols(rowsPerBand)
    val candidates = bandBuckets(inWide, numPerm, rowsPerBand)
      .toDF("new_id" +: "band" +: keyCols: _*)
      .join(exBands.toDF("old_id" +: "band" +: keyCols: _*),
        Seq("band") ++ keyCols)
      .select("new_id", "old_id").distinct()
    val inter = candidates
      .join(inEdges.select(col("doc_id").as("new_id"), col("shingle")), Seq("new_id"))
      .join(exEdges.select(col("doc_id").as("old_id"), col("shingle")),
        Seq("old_id", "shingle"))
      .groupBy("new_id", "old_id").agg(count(lit(1)).as("inter"))
      .join(shingleSizes(inEdges).select(col("doc_id").as("new_id"), col("n_sh").as("na")),
        Seq("new_id"))
      .join(shingleSizes(exEdges).select(col("doc_id").as("old_id"), col("n_sh").as("nb")),
        Seq("old_id"))
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= tau)
      .select("new_id", "old_id", "jaccard")
    if (!materialize) {
      // plan-inspection path (ScaleSpec's bucketed zero-exchange pin):
      // release the batch edge cache now — the returned plan stays
      // executable, it just recomputes
      inEdges.unpersist()
      return inter
    }
    materializePairs(inter, inEdges)
  }

  /** PERSIST the existing-corpus MinHash index: the band-bucket table
    * (the LSH inverted index every increment probes) and the
    * shingle-edge table (exact-Jaccard verification of candidates).
    * This is the daily-crawl loop's durable state — built once per
    * corpus version, probed by every incoming batch via
    * [[probeMinhashIndex]] without redoing existing-side signature work
    * (PolyHash/XxHash signatures depend only on document text, which is
    * exactly why DenseId is rejected: its vocabulary ranks shift with
    * every increment, silently invalidating a stored index). At 100 TB
    * the index is a fraction of corpus size (band tuples + shingle ids,
    * no text) and both writes partition on doc_id-derived keys — each
    * daily probe then reads the index instead of re-scanning the corpus.
    */
  def writeMinhashIndex(existing: DataFrame, idCol: String, textCol: String,
      numPerm: Int, rowsPerBand: Int, mode: HashMode, path: String): Unit = {
    require(mode != DenseId,
      "DenseId signatures are vocabulary-relative and cannot be stored across increments")
    val exEdges = shingleEdges(existing, idCol, textCol).persist()
    val (exWide, release) = minhashWideReleasable(exEdges, numPerm, mode)
    bandBuckets(exWide, numPerm, rowsPerBand)
      .write.mode("overwrite").parquet(s"$path/bands")
    exEdges.write.mode("overwrite").parquet(s"$path/edges")
    release()
    exEdges.unpersist()
  }

  /** BUCKETED variant of [[writeMinhashIndex]]: the band table is saved
    * `bucketBy(buckets, band, k0..k{r-1})` — exactly the probe join's
    * keys — so every daily probe reads the stored side pre-partitioned
    * and the candidate join plans with ZERO Exchange on the index side
    * (ScaleSpec pins this): the plain-parquet form re-shuffles the
    * ENTIRE stored index on every probe, which at 100 TB means the
    * accumulated corpus index moves every day to meet an O(batch)
    * incoming frame. Bucketing inverts that: only the small incoming
    * side shuffles (into the bucket count). `sortBy` the same keys so
    * a one-file-per-bucket index also skips the stored-side sort.
    *
    * Spark's bucketing metadata lives in the session catalog, so the
    * index is addressed by TABLE NAME (data at `path`); the band
    * schema/semantics are identical to the path-based form —
    * DedupSpec proves bucketed-probe ≡ plain-probe ≡ in-plan.
    */
  def writeMinhashIndexBucketed(existing: DataFrame, idCol: String,
      textCol: String, numPerm: Int, rowsPerBand: Int, mode: HashMode,
      table: String, path: String, buckets: Int): Unit = {
    require(mode != DenseId,
      "DenseId signatures are vocabulary-relative and cannot be stored across increments")
    val exEdges = shingleEdges(existing, idCol, textCol).persist()
    val (exWide, release) = minhashWideReleasable(exEdges, numPerm, mode)
    val bandCols = "band" +: bandKeyCols(rowsPerBand)
    bandBuckets(exWide, numPerm, rowsPerBand)
      .write.mode("overwrite")
      .bucketBy(buckets, bandCols.head, bandCols.tail: _*)
      .sortBy(bandCols.head, bandCols.tail: _*)
      .option("path", s"$path/bands")
      .format("parquet")
      .saveAsTable(s"${table}_bands")
    exEdges.write.mode("overwrite").parquet(s"$path/edges")
    release()
    exEdges.unpersist()
  }

  /** Probe against a [[writeMinhashIndexBucketed]] index — identical
    * semantics to [[probeMinhashIndex]]; the bands side arrives
    * pre-bucketed on the join keys. */
  def probeMinhashIndexBucketed(table: String, path: String,
      incoming: DataFrame, idCol: String, textCol: String, numPerm: Int,
      rowsPerBand: Int, tau: Double, mode: HashMode = XxHash,
      materialize: Boolean = true): DataFrame = {
    val spark = incoming.sparkSession
    incrementalFromIndex(
      spark.table(s"${table}_bands"),
      spark.read.parquet(s"$path/edges"),
      incoming, idCol, textCol, numPerm, rowsPerBand, tau, mode,
      materialize)
  }

  /** APPEND a new batch to a [[writeMinhashIndex]]-persisted index —
    * the missing half of the daily-crawl lifecycle: after a batch is
    * probed (and its survivors admitted to the corpus), its band rows
    * and shingle edges are appended so TOMORROW's batch probes
    * yesterday's admissions too. Content-derived signatures are what
    * make this a pure append: no stored row ever changes (DenseId is
    * rejected for exactly that reason). DedupSpec proves
    * write(A) + append(B) ≡ write(A ∪ B).
    */
  def appendMinhashIndex(newDocs: DataFrame, idCol: String, textCol: String,
      numPerm: Int, rowsPerBand: Int, mode: HashMode, path: String): Unit = {
    require(mode != DenseId,
      "DenseId signatures are vocabulary-relative and cannot be stored across increments")
    val edges = shingleEdges(newDocs, idCol, textCol).persist()
    val (wide, release) = minhashWideReleasable(edges, numPerm, mode)
    bandBuckets(wide, numPerm, rowsPerBand)
      .write.mode("append").parquet(s"$path/bands")
    edges.write.mode("append").parquet(s"$path/edges")
    release()
    edges.unpersist()
  }

  /** Probe an `incoming` batch against a [[writeMinhashIndex]]-persisted
    * index. Same result as [[incrementalMinhashDups]] over the original
    * existing frame — DedupSpec proves written-index ≡ in-plan index.
    */
  def probeMinhashIndex(indexPath: String, incoming: DataFrame,
      idCol: String, textCol: String, numPerm: Int, rowsPerBand: Int,
      tau: Double, mode: HashMode = XxHash): DataFrame = {
    val spark = incoming.sparkSession
    incrementalFromIndex(
      spark.read.parquet(s"$indexPath/bands"),
      spark.read.parquet(s"$indexPath/edges"),
      incoming, idCol, textCol, numPerm, rowsPerBand, tau, mode)
  }

  /** SimHash parameters: 31-bit LCG over shingle ids. */
  val SimhashBits = 32
  val SimhashA = 1103515245L
  val SimhashB = 12345L

  /** 32-bit SimHash fingerprint per doc: per bit b, sum +-1 weighted by
    * bit b of h(sid); fingerprint bit = (sum > 0). Computed as 32
    * aggregate expressions (no 32x row explode) — one shuffle on doc_id.
    */
  def simhashFingerprints(edges: DataFrame, mode: HashMode): DataFrame =
    simhashFingerprintsReleasable(edges, mode)._1

  private def simhashFingerprintsReleasable(edges: DataFrame,
      mode: HashMode): (DataFrame, () => Unit) = {
    val (rawIds, release) = shingleIds(edges, mode)
    val ids = rawIds
      .withColumn("h", (lit(SimhashA) * col("sid") + SimhashB) % MinhashMod)
    (fingerprintFromBitSums(
      ids.groupBy("doc_id").agg(simhashBitSums.head, simhashBitSums.tail: _*)),
      release)
  }

  /** The 32 per-bit ±1 sum aggregate expressions of the SimHash fold. */
  private def simhashBitSums: Seq[Column] =
    (0 until SimhashBits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
        .as(s"s$b")
    }

  /** (doc_id, simhash) off a frame carrying the s0..s31 bit sums. */
  private def fingerprintFromBitSums(sums: DataFrame): DataFrame = {
    val fp = (0 until SimhashBits)
      .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    sums.select(col("doc_id"), fp.as("simhash"))
  }

  /** SimHash near-dup pairs: banding on fingerprint bytes (4 bands of 8
    * bits — pairs within hamming distance 3 of a 32-bit fingerprint must
    * share at least one byte), then exact hamming <= maxHamming.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int, mode: HashMode = XxHash): DataFrame = {
    val edges = shingleEdges(docs, idCol, textCol).persist()
    val (pairs, releaseVocab) = simhashPairsOnEdges(edges, maxHamming, mode)
    val out = materializePairs(pairs, edges)
    releaseVocab()
    out
  }

  /** Edge-level core of [[simhashPairs]] — callers own the edge cache
    * lifecycle (lets [[ensemblePairs]] share ONE edge build across
    * detectors). */
  private def simhashPairsOnEdges(edges: DataFrame, maxHamming: Int,
      mode: HashMode): (DataFrame, () => Unit) = {
    val (fps, releaseVocab) = simhashFingerprintsReleasable(edges, mode)
    (simhashPairsOnFingerprints(fps, maxHamming), releaseVocab)
  }

  /** Byte-banding + exact-hamming verification over a (doc_id, simhash)
    * frame — the candidate-generation half of [[simhashPairs]], split out
    * so [[ensemblePairs]] can feed it fingerprints derived from the
    * FUSED signature aggregate. */
  private def simhashPairsOnFingerprints(fps: DataFrame,
      maxHamming: Int): DataFrame = {
    val banded = fps.withColumn("bb", explode(sequence(lit(0), lit(3))))
      .withColumn("bkey", expr("shiftright(simhash, bb * 8) & 255"))
    val candidates = banded
      .select(col("doc_id").as("doc_a"), col("simhash").as("fa"), col("bb"), col("bkey"))
      .join(banded.select(col("doc_id").as("doc_b"), col("simhash").as("fb"),
        col("bb"), col("bkey")), Seq("bb", "bkey"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "fa", "fb").distinct()
    candidates
      .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Detector-consensus near-dup ensemble over ONE shared shingle-edge
    * build: exact n-gram Jaccard, MinHash-LSH, and SimHash each generate
    * their pair set from the SAME cached edge list (the explode+distinct
    * shingling — the dominant cost of every set-similarity detector —
    * runs once instead of once per detector), then pairs are unioned and
    * a pair survives when at least `minVotes` detectors agree.
    *
    * The exact-Jaccard scoring is ALSO shared: the inverted-index pass
    * scores every pair sharing a shingle at min(jaccardTau, minhashTau),
    * the Jaccard detector filters it at jaccardTau, and the MinHash
    * detector verifies its band candidates against the SAME stream at
    * minhashTau (a band-colliding pair with no shared shingle has exact
    * Jaccard 0 and is rejected by both paths, so semi-joining candidates
    * against the scored stream ≡ re-verifying against the edge list —
    * asserted in DedupSpec). That removes the two verification re-joins
    * of the edge list that a standalone MinHash run pays.
    *
    * Scale shape: identical to running the detectors separately — each
    * remains inverted-index shaped (shingle / band-tuple / byte-band
    * equi-joins, never all-pairs) — but the corpus is scanned and
    * shingled once, the pair stream is scored once, and the vote
    * aggregate runs over pair lists (tiny relative to the corpus).
    */
  def ensemblePairs(docs: DataFrame, idCol: String, textCol: String,
      jaccardTau: Double, numPerm: Int, rowsPerBand: Int, minhashTau: Double,
      maxHamming: Int, minVotes: Int, mode: HashMode = XxHash,
      broadcastSizes: Boolean = true): DataFrame = {
    val edges = shingleEdges(docs, idCol, textCol).persist()
    val scored = scoredIntersectionPairsOnEdges(edges, "jaccard",
      (inter, na, nb) => inter / (na + nb - inter),
      math.min(jaccardTau, minhashTau), broadcastSizes).persist()
    val jac = scored.where(col("jaccard") >= jaccardTau)
    // FUSED signature aggregate: the numPerm MinHash minima and the 32
    // SimHash bit sums fold in ONE groupBy(doc_id) over the same
    // shingle-id stream — one corpus-wide signature shuffle instead of
    // the two a separate-detector run pays
    val (rawIds, releaseVocab) = shingleIds(edges, mode)
    val ids = rawIds
      .withColumn("h", (lit(SimhashA) * col("sid") + SimhashB) % MinhashMod)
    val mins = (0 until numPerm).map { j =>
      min(permute(lit(j.toLong), col("sid"))).as(s"m$j")
    }
    val sig = ids.groupBy("doc_id").agg((mins ++ simhashBitSums).head,
      (mins ++ simhashBitSums).tail: _*).persist()
    val keyCols = bandKeyCols(rowsPerBand)
    val buckets = bandBuckets(sig, numPerm, rowsPerBand)
    val cand = buckets.toDF("doc_a" +: "band" +: keyCols: _*)
      .join(buckets.toDF("doc_b" +: "band" +: keyCols: _*),
        Seq("band") ++ keyCols)
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val mh = scored.where(col("jaccard") >= minhashTau)
      .join(cand, Seq("doc_a", "doc_b"), "left_semi")
    val sh = simhashPairsOnFingerprints(fingerprintFromBitSums(sig), maxHamming)
    val votes = Seq(jac, mh, sh).map(_.select("doc_a", "doc_b"))
      .reduce(_ unionByName _)
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).cast("int").as("n_methods"))
      .where(col("n_methods") >= minVotes)
    val out = materializePairs(votes, edges)
    scored.unpersist(); sig.unpersist()
    releaseVocab()
    out
  }

  /** DETECTOR EVALUATION: precision / recall / F1 of each approximate
    * near-dup detector against the exact inverted-index truth — the
    * report a curation team reads before trusting a detector at scale.
    * Ground truth is exact n-gram Jaccard: >= minhashTau for the
    * MinHash-LSH and SimHash detectors (their operating threshold),
    * >= jaccardTau for the DF-capped detector (its own). All sets
    * derive from ONE shared edge build and ONE scored pair stream (the
    * [[ensemblePairs]] discipline):
    *
    *  - MinHash set = truth semi-joined to band candidates (band
    *    collision with no shared shingle ⇒ exact Jaccard 0 — identical
    *    to standalone verification, the ensemble argument);
    *  - SimHash set = the fused signature aggregate's fingerprints;
    *  - capped set = truth pairs sharing >= 1 RARE (df <= maxDf)
    *    shingle — provably the capped pipeline's output (candidates
    *    require one rare shared shingle; verification is exact), and
    *    computed survivor-only instead of re-running the rare
    *    self-join (spec-asserted ≡ jaccardPairsCapped).
    *
    * F1 = 2·hit / (det + truth) — identical to the harmonic mean of
    * P and R but computed from the raw integers, so the only float ops
    * are the three final round-6 divisions. All three detectors score
    * in ONE grouped aggregate over the tagged pair union (hit-ness
    * from a single left join to the scored stream, truth totals as a
    * broadcast 1-row aggregate); every frame past the scored stream is
    * pair-list-sized.
    */
  def detectorPrf(docs: DataFrame, idCol: String, textCol: String,
      jaccardTau: Double, numPerm: Int, rowsPerBand: Int, minhashTau: Double,
      maxHamming: Int, maxDf: Int, mode: HashMode = XxHash,
      broadcastSizes: Boolean = true): DataFrame = {
    val edges = shingleEdges(docs, idCol, textCol).persist()
    val scored = scoredIntersectionPairsOnEdges(edges, "jaccard",
      (inter, na, nb) => inter / (na + nb - inter),
      math.min(jaccardTau, minhashTau), broadcastSizes).persist()
    val truthLow = scored.where(col("jaccard") >= jaccardTau)
    val truthHigh = scored.where(col("jaccard") >= minhashTau)
    val (rawIds, releaseVocab) = shingleIds(edges, mode)
    val ids = rawIds
      .withColumn("h", (lit(SimhashA) * col("sid") + SimhashB) % MinhashMod)
    val mins = (0 until numPerm).map { j =>
      min(permute(lit(j.toLong), col("sid"))).as(s"m$j")
    }
    val sig = ids.groupBy("doc_id").agg((mins ++ simhashBitSums).head,
      (mins ++ simhashBitSums).tail: _*).persist()
    val keyCols = bandKeyCols(rowsPerBand)
    val buckets = bandBuckets(sig, numPerm, rowsPerBand)
    val cand = buckets.toDF("doc_a" +: "band" +: keyCols: _*)
      .join(buckets.toDF("doc_b" +: "band" +: keyCols: _*),
        Seq("band") ++ keyCols)
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val mh = truthHigh.join(cand, Seq("doc_a", "doc_b"), "left_semi")
    val sh = simhashPairsOnFingerprints(fingerprintFromBitSums(sig), maxHamming)
    val hotShingles = edges.groupBy("shingle").agg(count(lit(1)).as("__df"))
      .where(col("__df") > maxDf).select("shingle").localCheckpoint()
    val rareEdges = edges.join(broadcast(hotShingles), Seq("shingle"), "left_anti")
    val capped = truthLow.select("doc_a", "doc_b")
      .join(rareEdges.select(col("doc_id").as("doc_a"), col("shingle")), Seq("doc_a"))
      .join(rareEdges.select(col("doc_id").as("doc_b"), col("shingle")),
        Seq("doc_b", "shingle"))
      .select("doc_a", "doc_b").distinct()
    // ONE grouped aggregate scores every detector: hit-ness is read off
    // a single left join to the persisted scored stream (mh/capped are
    // subsets of it by construction; a simhash pair absent from it
    // shares no shingle, so its exact Jaccard is 0 — a miss), and the
    // two truth totals ride in as a broadcast 1-row aggregate. This
    // replaces nine per-detector count jobs with two.
    val dets = Seq(
      mh.select(col("doc_a"), col("doc_b"), lit("minhash").as("detector")),
      sh.select(col("doc_a"), col("doc_b"), lit("simhash").as("detector")),
      capped.select(col("doc_a"), col("doc_b"),
        lit("jaccard_capped").as("detector"))).reduce(_ unionByName _)
    val tauOf = when(col("detector") === "jaccard_capped", jaccardTau)
      .otherwise(minhashTau)
    val truthCounts = scored.agg(
      sum(when(col("jaccard") >= minhashTau, 1L).otherwise(0L)).as("__th"),
      sum(when(col("jaccard") >= jaccardTau, 1L).otherwise(0L)).as("__tl"))
    val out = dets
      .join(scored.select("doc_a", "doc_b", "jaccard"),
        Seq("doc_a", "doc_b"), "left")
      .groupBy("detector")
      .agg(count(lit(1)).as("n_det"),
        sum(when(coalesce(col("jaccard"), lit(-1.0)) >= tauOf, 1L)
          .otherwise(0L)).as("n_hit"))
      .crossJoin(broadcast(truthCounts))
      .select(col("detector"),
        when(col("detector") === "jaccard_capped", col("__tl"))
          .otherwise(col("__th")).as("n_truth"),
        col("n_det"), col("n_hit"))
      .select(col("detector"), col("n_truth"), col("n_det"), col("n_hit"),
        round(col("n_hit") / col("n_det"), 6).as("prec"),
        round(col("n_hit") / col("n_truth"), 6).as("rec"),
        round(lit(2) * col("n_hit") / (col("n_det") + col("n_truth")), 6)
          .as("f1"))
      .localCheckpoint()
    scored.unpersist(); sig.unpersist(); edges.unpersist(); releaseVocab()
    out
  }

  /** Embedding near-dup: pairs with cosine >= tau. Brute-force baseline
    * (all pairs a<b) — the exactness reference; for the scale path see
    * Similarity.lshTopK's bucketing, which bounds the join.
    */
  def embeddingCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      tau: Double): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val withNorm = emb.select(col(idCol).as("vid"), col(vecCol).as("vec"),
      VectorOps.normSq(col(vecCol)).as("nsq"))
    val a = withNorm.select(col("vid").as("vec_a"), col("vec").as("va"), col("nsq").as("na"))
    val b = withNorm.select(col("vid").as("vec_b"), col("vec").as("vb"), col("nsq").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cosine", VectorOps.cosine(col("va"), col("vb"), col("na"), col("nb")))
      .where(col("cosine") >= tau)
      .select(col("vec_a"), col("vec_b"), round(col("cosine"), 6).as("cos_r"))
  }

  /** Brute-force cosine pairs via a broadcast corpus matrix + partition-
    * local GEMM-style loops. Semantically identical to
    * `embeddingCosinePairs` (same fold order, same HALF_UP rounding —
    * cross-checked bit-for-bit in DedupSpec) but ~3x faster: the
    * nested-loop join's per-pair row materialization (two 64-float arrays
    * copied per candidate) disappears; each partition streams its rows
    * against the broadcast primitive arrays at memory bandwidth.
    *
    * The collect() here is the broadcast BUILD — the same driver hop any
    * broadcast hash join performs — valid while one side fits the
    * broadcast threshold. Beyond that, use `embeddingCosinePairsSharded`
    * (the block x block distributed GEMM with the identical inner loop);
    * that is the path the registered ext_dedup_embcos query takes — this
    * kernel stays as the single-machine opt-in.
    */
  def embeddingCosinePairsBlocked(emb: DataFrame, idCol: String,
      vecCol: String, tau: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val data = emb.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
    val corpus = data.collect().sortBy(_._1)
    val norms = corpus.map { case (_, v) =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      s
    }
    val bc = spark.sparkContext.broadcast((corpus, norms))
    data.mapPartitions { it =>
      val (cs, ns) = bc.value
      it.flatMap { case (ida, va) =>
        var na = 0.0
        var i0 = 0
        while (i0 < va.length) { na += va(i0).toDouble * va(i0).toDouble; i0 += 1 }
        val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
        var j = 0
        while (j < cs.length) {
          val (idb, vb) = cs(j)
          if (idb > ida) {
            var dot = 0.0; var i = 0
            while (i < va.length) { dot += va(i).toDouble * vb(i).toDouble; i += 1 }
            val cos = dot / (math.sqrt(na) * math.sqrt(ns(j)))
            if (cos >= tau) out += ((ida, idb,
              BigDecimal(cos).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
          }
          j += 1
        }
        out.iterator
      }
    }.toDF("vec_a", "vec_b", "cos_r")
  }

  /** Distributed block x block GEMM for brute-force cosine pairs — the
    * scale form of `embeddingCosinePairsBlocked` with NO driver-side
    * materialization. The corpus is sharded into `numBlocks` blocks by
    * `floorMod(id, numBlocks)`; each row is replicated to every block
    * pair it participates in (replication factor B), and each of the
    * B*(B+1)/2 unordered block pairs runs the same partition-local
    * primitive-array inner loop as the blocked kernel over ~2N/B rows.
    *
    * Scale: pick B so one block (~N/B rows x dim floats) fits a single
    * task's memory; driver memory is never touched, and the quadratic
    * work — inherent to an EXACT all-pairs baseline — spreads over
    * B*(B+1)/2 independent tasks. The arithmetic (index-ascending double
    * fold, sqrt-product denominator, HALF_UP round-6) is byte-identical
    * to the blocked and declarative kernels; per-term products and the
    * norm product are symmetric in IEEE754, so pair orientation cannot
    * perturb bits. Cross-checked bit-for-bit in DedupSpec.
    */
  def embeddingCosinePairsSharded(emb: DataFrame, idCol: String,
      vecCol: String, tau: Double, numBlocks: Int = 8): DataFrame = {
    require(numBlocks >= 1, s"numBlocks must be >= 1, got $numBlocks")
    val spark = emb.sparkSession
    import spark.implicits._
    val B = numBlocks
    val data = emb.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
    // (pairKey, blockId, id, vec, normSq): one copy per block pair the
    // row participates in; normSq computed once, before replication
    val keyed = data.flatMap { case (id, v) =>
      var n = 0.0; var i = 0
      while (i < v.length) { n += v(i).toDouble * v(i).toDouble; i += 1 }
      val b = java.lang.Math.floorMod(id, B.toLong).toInt
      (0 until B).map { o =>
        val lo = math.min(b, o); val hi = math.max(b, o)
        (lo * B + hi, b, id, v, n)
      }
    }
    keyed.groupByKey(_._1).flatMapGroups { (pk: Int, it: Iterator[(Int, Int, Long, Array[Float], Double)]) =>
      val lo = pk / B; val hi = pk % B
      val rows = it.toArray
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
      def emit(ida: Long, va: Array[Float], na: Double,
               idb: Long, vb: Array[Float], nb: Double): Unit = {
        var dot = 0.0; var i = 0
        while (i < va.length) { dot += va(i).toDouble * vb(i).toDouble; i += 1 }
        val cos = dot / (math.sqrt(na) * math.sqrt(nb))
        if (cos >= tau) out += ((math.min(ida, idb), math.max(ida, idb),
          BigDecimal(cos).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
      if (lo == hi) {
        var i = 0
        while (i < rows.length) {
          var j = i + 1
          while (j < rows.length) {
            emit(rows(i)._3, rows(i)._4, rows(i)._5,
              rows(j)._3, rows(j)._4, rows(j)._5)
            j += 1
          }
          i += 1
        }
      } else {
        val left = rows.filter(_._2 == lo)
        val right = rows.filter(_._2 == hi)
        var i = 0
        while (i < left.length) {
          var j = 0
          while (j < right.length) {
            emit(left(i)._3, left(i)._4, left(i)._5,
              right(j)._3, right(j)._4, right(j)._5)
            j += 1
          }
          i += 1
        }
      }
      out.iterator
    }.toDF("vec_a", "vec_b", "cos_r")
  }

  /** Scale path for embedding near-dup: banded random-hyperplane LSH with
    * OR-amplification. Each band hashes `planesPerBand` hyperplanes into a
    * sign-pattern bucket; candidates share ANY band's bucket (union over
    * bands = the standard multi-table LSH construction — recall
    * 1-(1-p^r)^b instead of p^(r*b)), then exact cosine >= tau verifies.
    * Per-pair work stays bounded by bucket occupancy; a<b + distinct
    * dedupes pairs colliding in several bands.
    */
  def embeddingLshPairs(emb: DataFrame, idCol: String, vecCol: String,
      tau: Double, bands: Int, planesPerBand: Int, dim: Int): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val withNorm = emb.select(col(idCol).as("vid"), col(vecCol).as("vec"),
      VectorOps.normSq(col(vecCol)).as("nsq"))
    // band bb uses planes [bb*planesPerBand, (bb+1)*planesPerBand)
    val banded = withNorm.select(Seq(col("vid"), col("vec"), col("nsq")) ++
      (0 until bands).map(bb =>
        Similarity.bandBucket(col("vec"), bb, planesPerBand, dim).as(s"bk$bb")): _*)
    val exploded = banded.select(col("vid"), col("vec"), col("nsq"),
      posexplode(array((0 until bands).map(bb => col(s"bk$bb")): _*)).as(Seq("band", "bucket")))
    val a = exploded.select(col("vid").as("vec_a"), col("vec").as("va"),
      col("nsq").as("na"), col("band"), col("bucket"))
    val b = exploded.select(col("vid").as("vec_b"), col("vec").as("vb"),
      col("nsq").as("nb"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .where(col("vec_a") < col("vec_b"))
      .select("vec_a", "va", "na", "vec_b", "vb", "nb").distinct()
      .withColumn("cosine", VectorOps.cosine(col("va"), col("vb"), col("na"), col("nb")))
      .where(col("cosine") >= tau)
      .select(col("vec_a"), col("vec_b"), round(col("cosine"), 6).as("cos_r"))
  }
}
