package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for an LLM training-data pipeline: tokenization,
  * quality scoring, n-gram-heuristic language ID, token counting, and
  * rolling-hash document fingerprinting. Everything is built from codegen'd
  * built-ins (split / filter / transform / aggregate) — per-row work scales
  * embarrassingly; only `fingerprint` shuffles (explode + group-sum).
  */
object TextAnalysis {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Distinct-token (type) count. */
  def typeCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** BPE-ish subword count: runs of letters, runs of digits, or any other
    * single non-space symbol — a crude stand-in for a byte-pair tokenizer's
    * pre-tokenization regex.
    */
  val BpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0)))

  /** Count of tokens drawn from a marker set. */
  def markerCount(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers.map(x => x: Any): _*)))

  /** Stopword list for quality scoring (high-frequency glue tokens of the
    * corpus vocabulary).
    */
  val Stopwords = Seq("the", "a", "of", "and", "to")

  /** Language-ID marker sets: n-gram-heuristic classification by counting
    * marker tokens per class, argmax with a fixed priority tiebreak.
    * (The corpus is synthetic; the classes exercise the machinery.)
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "sqlish" -> Seq("join", "scan", "table", "merge", "sort"),
    "streamish" -> Seq("stream", "window", "batch", "event"),
    "mlish" -> Seq("hash", "key", "dup", "part"))

  /** Quality score: 0.4 * type-token-ratio + 0.6 * (1 - stopword ratio),
    * rounded to 6 decimals — THE quality formula, shared by the stats
    * query and the corpus-clean composite so the two can't drift.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    round(lit(0.4) * (typeCount(text) / nTok) +
      lit(0.6) * (lit(1.0) - markerCount(text, Stopwords) / nTok), 6)
  }

  /** Predicted language: argmax of marker counts; earlier classes win ties;
    * all-zero -> 'unk'. Deterministic by construction.
    */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> markerCount(text, markers)
    }
    // lang_i wins iff score_i > 0 and score_i >= every later score
    // (earlier langs already lost when we reach i)
    val cases = scores.zipWithIndex.map { case ((lang, sc), i) =>
      val laterMax = scores.drop(i + 1).map(_._2)
      val beatsLater = laterMax.foldLeft(lit(true))((acc, o) => acc && sc >= o)
      (sc > 0 && beatsLater, lit(lang))
    }
    cases.foldRight(lit("unk")) { case ((cond, v), els) => when(cond, v).otherwise(els) }
  }

  /** Term frequencies per document plus document frequency per term —
    * the building blocks of TF-IDF. ONE explode + one aggregate; the
    * document frequency is a count window over the per-(doc, term) rows
    * partitioned by term — the same term-keyed shuffle the old
    * two-branch join formulation paid, WITHOUT the second corpus
    * scan+explode that branch recomputed (Spark does not exchange-reuse
    * the duplicated aggregate subtree; same defect family as
    * Sampling.mixtureWeights' normalizer).
    */
  def termStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val terms = docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    terms.withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
  }

  /** Top-k TF-IDF terms per document. tfidf = tf * ln(N / df), rounded
    * BEFORE ranking so near-ties (engines may differ in the last ulp of
    * ln) become exact ties broken lexicographically — the ordering is
    * then engine-independent.
    */
  def topTfidf(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    // corpus size as a broadcast 1-row aggregate — keeps the operator one
    // lazy DAG (no driver-side count at plan-build time)
    val nDf = docs.agg(count(lit(1)).cast("double").as("__n"))
    val stats = termStats(docs, idCol, textCol)
      .crossJoin(broadcast(nDf))
      .withColumn("tfidf", round(col("tf") * log(col("__n") / col("df")), 6))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term").asc)
    stats.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select("doc_id", "rnk", "term", "tfidf")
  }

  /** Corpus-model fluency scoring — the "perplexity filter" of an LLM
    * data pipeline, with the corpus itself as the bigram model: each
    * document scores the average log-probability ln(C(w1 w2) / C(w1 ·))
    * of its bigram instances under corpus-wide counts. Low scorers are
    * the disfluent/outlier documents a quality gate drops.
    *
    * Shape: ONE explode to bigram instances, then the model counts as
    * two count windows over the instance stream (partitioned by
    * (w1, w2) and by w1) — the same two key-shuffles the old
    * two-aggregate-branch + two-join formulation paid, without the two
    * extra corpus scans+explodes those branches recomputed. No
    * smoothing: every scored bigram exists in the model by construction
    * (the corpus scores itself); for scoring NEW text against a frozen
    * model, add-one smooth a null-padded model join instead.
    */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bi = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__w"))
      .selectExpr("doc_id",
        """explode(CASE WHEN size(__w) >= 2
             THEN transform(sequence(0, size(__w) - 2),
                  i -> struct(__w[i] AS w1, __w[i+1] AS w2))
             ELSE CAST(array() AS array<struct<w1:string,w2:string>>) END) AS bg""")
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    bi.withColumn("cb", count(lit(1)).over(Window.partitionBy("w1", "w2")))
      .withColumn("cu", count(lit(1)).over(Window.partitionBy("w1")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log(col("cb") / col("cu"))), 4).as("avg_logprob"))
  }

  val FpMod = 1000000007L
  /** 31^k mod FpMod for k = 0..7, precomputed (shared with the oracle). */
  val FpPows: Seq[Long] = Iterator.iterate(1L)(p => p * 31 % FpMod).take(8).toSeq

  /** Rolling-hash document fingerprint: word ids from the graft_polyhash
    * character fold (oracle-reproducible, no vocabulary structure), each
    * position contributes `(id+1) * 31^(pos mod 8) mod P`, summed per
    * document mod P. Pure integer math -> bit-identical everywhere.
    * One explode + one partial/final group-sum; no global sort — the old
    * dense-id formulation ranked the vocabulary through a SINGLE-PARTITION
    * window, the one anti-scale plan shape in the round-1 query set.
    *
    * Tradeoff vs dense ids: the base-31 fold can collide distinct words
    * (e.g. "Aa"/"BB"), giving correlated fingerprints to documents that
    * differ only in colliding words. Fingerprint equality is a strong
    * NEAR-duplicate signal, not an identity proof — engine-only consumers
    * wanting fewer collisions can swap in xxhash64(word) (same plan
    * shape, no oracle).
    */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val words = docs.select(col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "word")))
    val pows = array(FpPows.map(lit): _*)
    words
      .withColumn("contrib",
        (Dedup.polyHash(col("word")) + 1L) * element_at(pows, (col("pos") % 8 + 1).cast("int")) % FpMod)
      .groupBy("doc_id")
      .agg((sum(col("contrib")) % FpMod).as("fingerprint"))
  }

  /** BM25 relevance of every document against a fixed term query — the
    * classic sparse-retrieval scorer (and the lexical half of hybrid
    * retrieval next to the ANN operators). Standard Robertson/Sparck
    * Jones form with the +1 idf floor:
    *
    *   score(d) = Σ_t ln((N - df_t + 0.5)/(df_t + 0.5) + 1)
    *              * tf_td (k1+1) / (tf_td + k1 (1 - b + b·dl/avgdl))
    *
    * Scale shape: corpus stats (N, Σdl, df per query term) are ONE
    * map-side-combinable aggregate folded into a single broadcast row;
    * scoring is then a pure per-row projection (term tf's via array
    * filters over the token array — no explode, no shuffle). The
    * caller ranks with orderBy + limit, which plans as
    * TakeOrderedAndProject: per-partition top-k then a driver merge of
    * k-sized heaps — the scale-safe global top-k.
    *
    * Determinism: both engines evaluate the identical operation tree on
    * identical inputs (integer tf/df/dl, exact 0.25/0.75 binary
    * fractions), so the only cross-engine wobble is ln's last ulp —
    * absorbed by rounding the final score to 6 (the ext_text_tfidf
    * precedent).
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double, b: Double): DataFrame = {
    val toks = tokens(col(textCol))
    val statAggs = sum(size(toks).cast("long")).as("__sumdl") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(toks, t), 1L).otherwise(0L)).as(s"__df$i")
      }
    val stats = docs.agg(count(lit(1)).as("__n"), statAggs: _*)
    val dl = size(toks).cast("double")
    val avgdl = col("__sumdl") / col("__n")
    val score = terms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(toks, x => x === t)).cast("double")
      val df = col(s"__df$i")
      val idf = log((col("__n") - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))
      idf * (tf * lit(k1 + 1)) /
        (tf + lit(k1) * (lit(1 - b) + lit(b) * dl / avgdl))
    }.reduce(_ + _)
    docs.crossJoin(broadcast(stats))
      .select(col(idCol).as("doc_id"), round(score, 6).as("bm25"))
  }

  /** Intra-document repetition profile — the Gopher/C4-style quality
    * signals that catch degenerate generated/boilerplate text: the
    * fraction of word 3-gram instances that are repeats of an earlier
    * 3-gram in the SAME document, the coverage of the single most
    * repeated 3-gram, and the repeated-token fraction. Documents with
    * fewer than 3 tokens have no 3-grams and are dropped (mirrors the
    * shingle operators).
    *
    * Scale shape: a pure per-row projection — 3-grams, distinct counts,
    * and the max-multiplicity run-length fold all run inside one
    * whole-stage-codegen'd map over the scan; ZERO exchanges, so it
    * composes into any pipeline for free at 100 TB (unlike the naive
    * explode + two-level groupBy formulation, which shuffles every gram
    * instance twice). The max multiplicity comes from a sort + run-length
    * fold over the per-document gram array (array_sort + aggregate), so
    * the cost is row-local O(g log g).
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = tokens(col(textCol))
    val nTok = size(ws)
    val nTyp = size(array_distinct(ws))
    // 1-based positions to mirror the oracle's list indexing
    val grams = transform(sequence(lit(1), nTok - lit(2)),
      i => concat_ws(" ", element_at(ws, i), element_at(ws, i + lit(1)),
        element_at(ws, i + lit(2))))
    // run-length fold over the sorted grams: longest run = max multiplicity
    val topCnt = aggregate(
      array_sort(grams),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, g) => {
        val run = when(g === acc("prev"), acc("run") + 1).otherwise(lit(1))
        struct(g.as("prev"), run.as("run"), greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))
    docs
      .where(nTok >= 3)
      .select(col(idCol).as("doc_id"), nTok.as("__ntok"), nTyp.as("__ntyp"),
        size(grams).as("n_grams"),
        size(array_distinct(grams)).as("n_distinct"),
        topCnt.as("top_cnt"))
      .select(col("doc_id"), col("n_grams"), col("n_distinct"), col("top_cnt"),
        round((col("n_grams") - col("n_distinct")) / col("n_grams"), 6).as("dup_gram_frac"),
        round(col("top_cnt") / col("n_grams"), 6).as("top_gram_frac"),
        round((col("__ntok") - col("__ntyp")) / col("__ntok"), 6).as("dup_token_frac"))
  }

  /** HASHED-FEATURE LINEAR CLASSIFIER inference — the fastText-shaped
    * quality/domain classifier every production curation stack runs over
    * the whole corpus: token → hash bucket (mod `dim`), per-doc score =
    * Σ w[bucket(t)] over tokens (a bag-of-words dot product with the
    * weight vector), label = sign. The weights here are derived from the
    * bucket id by a fixed integer mix (a stand-in for trained
    * parameters — swapping in a real model changes ONE line and nothing
    * about the plan); weights live on an integer CENT grid so the score
    * is an exact BIGINT sum, order-free and oracle-exact.
    *
    * Scale shape: pure per-row fold — the hashing trick means NO
    * vocabulary table, no join, no shuffle of any kind; the whole
    * operator is one whole-stage-codegen projection over the corpus
    * scan. This is the reason hashed features won at scale: inference
    * over 100 TB is embarrassingly parallel and vocabulary-free.
    */
  def hashedLinearScore(docs: DataFrame, idCol: String, textCol: String,
      dim: Int = 1024): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // deterministic per-bucket weight in [-500, 500] cents: a Knuth
    // multiplicative mix of the bucket id (NOT trained weights — the
    // plumbing under a real model is identical)
    def weight(tok: Column): Column = {
      val bucket = Dedup.polyHash(tok) % dim
      (bucket * lit(2654435761L) + lit(12345L)) % 1001L - lit(500L)
    }
    val toks = tokens(col(textCol))
    docs.select(col(idCol).as("doc_id"),
        size(toks).as("n_tokens"),
        aggregate(toks, lit(0L), (acc, t) => acc + weight(t)).as("score"))
      .withColumn("label", when(col("score") >= 0, 1).otherwise(0))
      .withColumn("mean_cents", round(col("score") / col("n_tokens"), 6))
  }

  /** CONTENT-DEFINED CHUNKING: cut a document after every word whose
    * outgoing `w`-gram hashes to 0 (mod `div`) — boundaries derive from
    * CONTENT, not position, so a local edit re-chunks only its own
    * neighborhood and any shared passage lands in identical chunks
    * wherever it sits (the edit-locality property fixed-size chunking
    * lacks; spec-asserted on a prefix-insertion pair). Emits the chunk
    * stream (doc_id, carried cols, cid, n_words, chash) for chunk-level
    * dedup: equal chash = equal content (modulo hash collision).
    *
    * Scale shape: boundary flags are a per-row array transform
    * (codegen'd graft_polyhash, no join); the word stream shuffles ONCE
    * on doc_id for the exclusive prefix-sum window, and the chunk
    * groupBy reuses that partitioning (subset-key clustering). Chunk
    * text is reassembled from sorted (p, word) structs — deterministic
    * under any collect order.
    */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
      carryCols: Seq[String], w: Int, div: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val carry = carryCols.map(col)
    val flagged = docs
      .select((col(idCol).as("doc_id") +: carry :+
        split(col(textCol), " ").as("__w")): _*)
      .withColumn("__f", expr(s"""
        transform(sequence(0, size(__w) - 1), p ->
          CASE WHEN p <= size(__w) - $w AND
            graft_polyhash(concat_ws(' ', slice(__w, p + 1, $w))) % $div = 0
          THEN 1 ELSE 0 END)"""))
    val words = flagged
      .select((col("doc_id") +: carry :+
        posexplode(arrays_zip(col("__w"), col("__f"))).as(Seq("p", "z"))): _*)
      .select((col("doc_id") +: carry ++: Seq(col("p"),
        col("z.__w").as("word"), col("z.__f").as("f"))): _*)
    val wWin = Window.partitionBy("doc_id").orderBy("p")
      .rowsBetween(Window.unboundedPreceding, -1)
    words
      .withColumn("cid", coalesce(sum(col("f")).over(wWin), lit(0L)))
      .groupBy((col("doc_id") +: (carryCols :+ "cid").map(col)): _*)
      .agg(count(lit(1)).as("n_words"),
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(struct(p, word))), x -> x.word)"))
          .as("ctext"))
      .withColumn("chash", Dedup.polyHash(col("ctext")))
  }

  /** Iterated BPE merge training — the actual tokenizer-trainer loop a
    * data pipeline runs before anything else. K fixed rounds; each round
    * counts adjacent SYMBOL pairs weighted by word occurrence count,
    * picks the argmax (freq desc, pair asc — deterministic), applies it
    * as a vocabulary merge, and recounts. Returns one row per round:
    * (round, pair "a b", freq).
    *
    * The 100 TB shape: the corpus-sized work is ONE word groupBy (same
    * aggregate every token count runs); the entire training loop then
    * iterates over the DISTINCT-WORD vocabulary only (bounded, ≪ corpus)
    * with counts carried as weights — no round ever re-touches raw text.
    *
    * Representation trick that keeps both engines exact: a word's symbol
    * sequence is a DOUBLE-SPACE-delimited string padded with one space
    * each side (`" l  o  w "` is `[l, o, w]`; after merging `(l, o)` it
    * becomes `" lo  w "` = `[lo, w]`), so applying merge (a, b) is a single
    * `replace(repr, " a  b ", " ab ")`. String replace scans
    * left-to-right, non-overlapping, continuing AFTER each replacement —
    * exactly greedy BPE merge semantics (in `"a a a"`, merging `(a, a)`
    * takes the first pair only), and identical in Spark's StringReplace
    * and the DuckDB oracle's replace(). The one-space padding plus
    * two-space separators make match boundaries unambiguous AND let
    * adjacent occurrences (`" a  b  a  b "`) both match, since each
    * match consumes only its own delimiters.
    *
    * Per-round argmax is a sort-limit-1 (TakeOrdered — no global window,
    * no driver collect) broadcast-crossJoined back onto the vocab; lazy
    * localCheckpoint per round cuts the O(rounds²) lineage growth, as in
    * [[Dedup.connectedComponents]].
    */
  def bpeTrain(docs: DataFrame, textCol: String, rounds: Int): DataFrame =
    bpeLoop(docs, textCol, rounds)._1.reduce(_.unionAll(_))

  /** Shared BPE trainer core: runs the K merge rounds and returns both the
    * per-round picks and the FINAL segmented vocabulary (w, repr, c) —
    * `bpeTrain` publishes the former, [[bpeApplyBudget]] consumes the
    * latter. The word column rides the chain untouched so application can
    * join token counts back onto the corpus word stream.
    */
  private def bpeLoop(
      docs: DataFrame, textCol: String, rounds: Int): (Seq[DataFrame], DataFrame) = {
    val wc = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .where(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("c"))
    var vocab = wc.select(
      col("w"),
      concat(lit(" "), array_join(
          expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
          "  "), lit(" "))
        .as("repr"),
      col("c")).localCheckpoint(eager = false)
    val picks = (1 to rounds).map { r =>
      val pairs = vocab
        .withColumn("syms", split(trim(col("repr")), "  "))
        // guard: a fully-merged word has one symbol; sequence(1, 0) in
        // Spark DESCENDS to [1, 0] and element_at(syms, 0) throws
        .where(size(col("syms")) >= 2)
        .select(col("c"), explode(expr(
          """transform(sequence(1, size(syms) - 1),
             i -> concat(element_at(syms, i), ' ', element_at(syms, i + 1)))"""))
          .as("pair"))
        .groupBy("pair").agg(sum(col("c")).as("freq"))
      val best = pairs.orderBy(col("freq").desc, col("pair").asc).limit(1)
        .localCheckpoint(eager = false)
      vocab = vocab
        .crossJoin(broadcast(best.select(col("pair").as("bp"))))
        .select(col("w"), expr(
          """replace(repr, concat(' ', replace(bp, ' ', '  '), ' '),
                           concat(' ', replace(bp, ' ', ''), ' '))""")
          .as("repr"), col("c"))
        .localCheckpoint(eager = false)
      best.select(lit(r).cast("int").as("round"), col("pair"), col("freq"))
    }
    (picks, vocab)
  }

  /** Tokenizer APPLICATION — the per-source token BUDGET under the trained
    * vocabulary: train K merges ([[bpeLoop]]), segment every vocabulary
    * word, and roll the per-word token counts up to one row per source
    * (docs, words, chars, BPE tokens, chars-per-token compression). This is
    * the statistic a pre-training pipeline prices every corpus slice with
    * before mixing.
    *
    * The 100 TB shape: the corpus is touched by exactly TWO map-side-
    * combinable aggregates (the trainer's global word count and the
    * per-(source, word) count); the segmentation join then runs on the
    * vocab-×-sources frame — bounded, ≪ corpus — with the segmented vocab
    * broadcast. Words the trainer never saw (length < 2) count as one
    * token via the left-join coalesce.
    */
  def bpeApplyBudget(
      docs: DataFrame, srcCol: String, textCol: String, rounds: Int): DataFrame = {
    val seg = bpeLoop(docs, textCol, rounds)._2
      .select(col("w"), size(split(trim(col("repr")), "  ")).as("n_sym"))
    val wcs = docs
      .select(col(srcCol).as("source"), explode(tokens(col(textCol))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("cw"))
    val budget = wcs.join(broadcast(seg), Seq("w"), "left")
      .groupBy("source").agg(
        sum(col("cw")).as("n_words"),
        sum(col("cw") * length(col("w"))).as("n_chars"),
        sum(col("cw") * coalesce(col("n_sym"), lit(1))).as("n_tokens"))
    val perSrcDocs = docs.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
    perSrcDocs.join(budget, Seq("source"))
      .select(col("source"), col("n_docs"),
        col("n_words"), col("n_chars"), col("n_tokens"),
        round(col("n_chars") / col("n_tokens"), 6).as("chars_per_token"))
  }

  /** IN-ENGINE CLASSIFIER TRAINING: a batch perceptron over hashed
    * bag-of-words features — the quality/domain-filter training loop
    * (fastText-style) run as `rounds` relational iterations instead of a
    * driver-side ML job. Labels come from `labelCol` (±1); features are
    * token counts hashed into `dim` buckets (the same hashing trick
    * [[hashedLinearScore]] serves at inference, so a trained weight
    * table drops straight into that scorer). Per round: margins =
    * Σ cnt·w per doc (weights BROADCAST — ≤dim rows), predictions by
    * sign, then the batch update w += Σ_misclassified y·x. Emits one
    * telemetry row per round: correct/wrong counts against the
    * pre-update weights plus post-update weight L1 mass and support.
    *
    * Scale shape: the corpus text is tokenized and hashed ONCE into the
    * compact (doc, y, bucket, cnt) frame — ≤ dim rows per doc,
    * persisted; every training round is two aggregates over that frame
    * (margins by doc, updates by bucket) plus a dim-row weight join that
    * always broadcasts. The weight table is localCheckpointed per round
    * (tiny, eager) so lineage stays flat across rounds — the CC/PageRank
    * loop discipline. Everything is BIGINT arithmetic: counts, ±1
    * labels, integer weights — bit-reproducible in any engine, at any
    * partitioning, which is what makes a TRAINING loop oracle-checkable
    * at all.
    */
  def hashedPerceptronTrain(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, dim: Int, rounds: Int): DataFrame = {
    val (stats, _, feat) =
      perceptronLoop(docs, idCol, textCol, labelCol, dim, rounds)
    val out = stats.localCheckpoint()
    feat.unpersist()
    out
  }

  /** TRAIN-THEN-APPLY composite: run [[hashedPerceptronTrain]]'s loop,
    * then score EVERY document against the final weight table and roll
    * up per `groupCol` — predicted-positive rate, true-positive rate,
    * and accuracy per group. This is the deployment shape of the
    * in-engine trainer: the model that just trained filters the corpus
    * in the same job, no weight export round-trip. Scoring reuses the
    * persisted compact feature frame (the corpus is re-touched only for
    * the tiny (doc_id, group) projection the rollup joins on); the
    * final weights broadcast, so scoring adds one aggregate over the
    * compact frame + one corpus-key join.
    */
  def hashedPerceptronApply(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, groupCol: String, dim: Int, rounds: Int): DataFrame = {
    val (_, w, feat) =
      perceptronLoop(docs, idCol, textCol, labelCol, dim, rounds)
    val scored = feat.join(broadcast(w), Seq("bucket"))
      .groupBy("doc_id", "y")
      .agg(sum(col("cnt") * col("w")).as("margin"))
      .withColumn("pred", when(col("margin") >= 0, 1L).otherwise(-1L))
    val out = scored
      .join(docs.select(col(idCol).as("doc_id"), col(groupCol)), Seq("doc_id"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pred") === 1L, 1L).otherwise(0L)).as("n_pred_pos"),
        sum(when(col("y") === 1L, 1L).otherwise(0L)).as("n_true_pos"),
        sum(when(col("pred") === col("y"), 1L).otherwise(0L)).as("n_correct"))
      .withColumn("acc", round(col("n_correct") / col("n_docs"), 6))
      .localCheckpoint()
    feat.unpersist()
    out
  }

  /** Per-document predictions from the freshly-trained perceptron:
    * (doc_id, y, margin, pred) — the frame agreement/calibration
    * audits consume. Same compact-frame aggregate as
    * [[hashedPerceptronApply]]'s scoring step.
    */
  def hashedPerceptronPredictions(docs: DataFrame, idCol: String,
      textCol: String, labelCol: String, dim: Int,
      rounds: Int): DataFrame = {
    val (_, w, feat) =
      perceptronLoop(docs, idCol, textCol, labelCol, dim, rounds)
    val out = feat.join(broadcast(w), Seq("bucket"))
      .groupBy("doc_id", "y")
      .agg(sum(col("cnt") * col("w")).as("margin"))
      .withColumn("pred", when(col("margin") >= 0, 1L).otherwise(-1L))
      .localCheckpoint()
    feat.unpersist()
    out
  }

  /** CALIBRATION AUDIT (reliability diagram) for the trained
    * perceptron: score every document, split the exact-integer margin
    * range into `bins` equal-width bands, and emit per band the doc
    * count, positive-label count, and empirical positive rate — the
    * check that the model's score actually orders label probability
    * before anyone uses it as a corpus-filter threshold (a model can be
    * accurate yet badly calibrated; thresholding an uncalibrated score
    * silently shifts the kept-data distribution).
    *
    * Scale shape: scoring is the same compact-frame aggregate as
    * [[hashedPerceptronApply]]; the global (lo, hi) margin envelope is
    * ONE 1-row aggregate broadcast back, and band assignment is pure
    * BIGINT arithmetic — (margin−lo)·bins div (hi−lo+1) — so the whole
    * audit adds one tiny exchange after scoring. No rank/ntile: a
    * rank-decile formulation would funnel the corpus-sized score frame
    * through a single global-sort window partition.
    */
  def hashedPerceptronCalibration(docs: DataFrame, idCol: String,
      textCol: String, labelCol: String, dim: Int, rounds: Int,
      bins: Int): DataFrame = {
    val (_, w, feat) =
      perceptronLoop(docs, idCol, textCol, labelCol, dim, rounds)
    val scored = feat.join(broadcast(w), Seq("bucket"))
      .groupBy("doc_id", "y")
      .agg(sum(col("cnt") * col("w")).as("margin"))
      .localCheckpoint()
    feat.unpersist()
    val env = scored.agg(min(col("margin")).as("__lo"),
      max(col("margin")).as("__hi"))
    scored.crossJoin(broadcast(env))
      .withColumn("bin",
        least(lit(bins - 1L), expr(s"(margin - __lo) * $bins div (__hi - __lo + 1)")))
      .groupBy("bin")
      .agg(min(col("margin")).as("margin_lo"),
        max(col("margin")).as("margin_hi"),
        count(lit(1)).as("n_docs"),
        sum(when(col("y") === 1L, 1L).otherwise(0L)).as("n_pos"))
      .withColumn("pos_rate", round(col("n_pos") / col("n_docs"), 6))
  }

  /** Shared train loop: returns (per-round stats, final weights, the
    * PERSISTED compact feature frame — caller must unpersist).
    */
  private def perceptronLoop(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, dim: Int,
      rounds: Int): (DataFrame, DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val spark = docs.sparkSession
    val feat = docs
      .select(col(idCol).as("doc_id"), col(labelCol).cast("long").as("y"),
        explode(tokens(col(textCol))).as("__t"))
      .groupBy(col("doc_id"), col("y"),
        (Dedup.polyHash(col("__t")) % dim).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .persist()

    // LAZY checkpoints across the loop (r13 opt): every consumer —
    // next round's weight join, the misclassified delta, the per-round
    // stats — lands in the ONE action that materializes the returned
    // frame, so blocks still compute exactly once but no per-round
    // barrier job is forced (the beamSearch discipline); the callers'
    // final eager checkpoint still gates feat.unpersist()
    var w = spark.range(dim).select(col("id").as("bucket"), lit(0L).as("w"))
      .localCheckpoint(eager = false)
    var stats = Seq.empty[DataFrame]
    for (t <- 1 to rounds) {
      val margins = feat.join(broadcast(w), Seq("bucket"))
        .groupBy("doc_id", "y")
        .agg(sum(col("cnt") * col("w")).as("margin"))
        .withColumn("pred", when(col("margin") >= 0, 1L).otherwise(-1L))
        .localCheckpoint(eager = false)
      val wrong = margins.where(col("pred") =!= col("y")).select("doc_id")
      val delta = feat.join(wrong, Seq("doc_id"))
        .groupBy("bucket").agg(sum(col("y") * col("cnt")).as("__du"))
      w = w.join(delta, Seq("bucket"), "left")
        .select(col("bucket"),
          (col("w") + coalesce(col("__du"), lit(0L))).as("w"))
        .localCheckpoint(eager = false)
      val roundStats = margins.agg(
          sum(when(col("pred") === col("y"), 1L).otherwise(0L)).as("n_correct"),
          sum(when(col("pred") =!= col("y"), 1L).otherwise(0L)).as("n_wrong"))
        .crossJoin(broadcast(
          w.agg(sum(abs(col("w"))).as("w_l1"),
            sum(when(col("w") =!= 0L, 1L).otherwise(0L)).as("w_nnz"))))
        .select(lit(t).as("round"), col("n_correct"), col("n_wrong"),
          col("w_l1"), col("w_nnz"))
      stats = stats :+ roundStats
    }
    (stats.reduce(_.unionByName(_)), w, feat)
  }
}
