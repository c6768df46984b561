package graft

import graft.operators.{Relational, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Scale-mechanics specs: salted joins preserve semantics, bucketed
  * tables eliminate the join shuffle, IVF ANN returns ranked neighbors.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin ≡ plain inner join (skew mitigation is semantics-free)") {
    val left = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d")).toDF("k", "lv")
    val right = Seq((1L, "X"), (2L, "Y"), (3L, "Z")).toDF("k", "rv")
    val salted = Relational.saltedJoin(left, right, "k", 4)
      .select("k", "lv", "rv")
    val plain = left.join(right, Seq("k"), "inner").select("k", "lv", "rv")
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("rangeJoinBinned ≡ naive theta range join") {
    val left = Seq((1L, 100L, 10L), (1L, 205L, 11L), (2L, 100L, 12L), (1L, 90L, 13L))
      .toDF("k", "lts", "lid")
    val right = Seq((1L, 95L, 20L), (1L, 100L, 21L), (1L, 106L, 22L),
      (1L, 200L, 23L), (2L, 40L, 24L), (3L, 100L, 25L))
      .toDF("k", "rts", "rid")
    // window [lts-10, lts]: inclusive both ends, bin width == window width
    val binned = Relational.rangeJoinBinned(left, right, "k", "lts", "rts", -10L, 0L)
      .select("lid", "rid")
    val naive = left.join(right.withColumnRenamed("k", "rk"),
        col("k") === col("rk") && col("rts") >= col("lts") - 10L && col("rts") <= col("lts"),
        "inner")
      .select("lid", "rid")
    assert(binned.exceptAll(naive).count() == 0 && naive.exceptAll(binned).count() == 0)
    assert(binned.count() == 3) // (1,100)->{95,100}; (1,205)->{200}; others empty
  }

  test("bucketed tables co-locate the join: no shuffle in the plan") {
    // default warehouse (./spark-warehouse, gitignored) — warehouse.dir
    // is a static conf and can't move after session start. The in-memory
    // catalog forgets tables between JVMs but their directories persist,
    // so clear both before writing.
    for (t <- Seq("b_orders", "b_counts")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        loc.listFiles().foreach(_.delete())
        loc.delete()
      }
    }
    val orders = Tables.orders(spark, sf0001)
    orders.write.mode("overwrite").bucketBy(4, "o_custkey")
      .sortBy("o_custkey").saveAsTable("b_orders")
    orders.groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .write.mode("overwrite").bucketBy(4, "o_custkey").saveAsTable("b_counts")
    val joined = spark.table("b_orders")
      .join(spark.table("b_counts"), Seq("o_custkey"), "inner")
    val shuffles = joined.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty,
      s"bucketed join should not shuffle, found ${shuffles.size} exchanges")
    assert(joined.count() > 0)
  }

  test("partitioned layout: predicate becomes a PartitionFilter, not a data filter") {
    // Hive-style partitionBy is THE 100 TB layout tool: a filter on the
    // partition column prunes whole directories at planning time — the
    // scan never opens non-matching files.
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.events(spark, sf0001)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val scan = spark.read.parquet(dir).where(col("event_type") === "purchase")
    // non-vacuous: event_type must appear INSIDE the PartitionFilters
    // bracket (the metadata line exists, empty, even without pruning)
    val plan = scan.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*event_type".r.findFirstIn(plan).isDefined,
      s"expected event_type inside PartitionFilters in:\n$plan")
    // and observable: the pruned scan selects strictly fewer files than
    // the unfiltered one (5 event-type dirs -> 1)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
      }.sum
    val all = spark.read.parquet(dir)
    assert(filesRead(scan) > 0 && filesRead(scan) < filesRead(all),
      s"pruned scan should read fewer files: ${filesRead(scan)} vs ${filesRead(all)}")
    val expected = Tables.events(spark, sf0001)
      .where(col("event_type") === "purchase").count()
    assert(scan.count() == expected)
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // the runtime half of the skew story (saltedJoin is the manual half):
    // with thresholds scaled to test data, AQE must mark and split the
    // hot key's partition — `skew=true` on the SMJ in the adaptive plan
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // one hot key carrying 50k rows vs 1000 singleton keys
      val left = ((1 to 50000).map(i => (0L, s"hot_$i")) ++
        (1 to 1000).map(i => (i.toLong, s"cold_$i"))).toDF("k", "lv")
      val right = (0 to 1000).map(i => (i.toLong, s"r_$i")).toDF("k", "rv")
      val joined = left.join(right, Seq("k"), "inner")
      // collect() drives THIS Dataset's QueryExecution (count() would
      // plan a derived aggregate and leave this one un-finalized)
      assert(joined.collect().length == 51000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-join split in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("ivfTopK: ranked neighbors from the query's cell only") {
    val emb = Tables.embeddings(spark, sf0001)
    val q = emb.where(col("vec_id") % 50 === 0)
    val got = Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5, 25)
    assert(got.count() > 0)
    // ranks are 1..k dense per query, no self-matches
    val bad = got.where(col("rnk") < 1 || col("rnk") > 5 ||
      col("q_id") === col("neighbor_id")).count()
    assert(bad == 0)
  }

  /** Shuffle-exchange arguments in the STATIC plan (AQE's initial plan —
    * what the audited claims in PLANS.md are written against).
    */
  private def shuffles(df: org.apache.spark.sql.DataFrame): Seq[String] =
    "Exchange (hashpartitioning\\([^)]*\\)|SinglePartition|rangepartitioning\\([^)]*\\))".r
      .findAllMatchIn(df.queryExecution.executedPlan.toString).map(_.group(1)).toList

  test("plan audit: audited exchange counts hold (PLANS.md claims)") {
    // a Spark upgrade or query edit that adds a shuffle to one of these
    // fails here first — re-audit PLANS.md before bumping a number
    def q(name: String) = SparkEntry.queries(name)(spark, sf0001)
    val rolling = shuffles(q("ext_ts_rolling"))
    assert(rolling.size == 1 && rolling.head.contains("user_id"),
      s"ext_ts_rolling: one user_id exchange feeds all three frames, got $rolling")
    val funnel = shuffles(q("ext_events_funnel"))
    assert(funnel.size == 2, s"ext_events_funnel: user_id + stage-total, got $funnel")
    val retention = shuffles(q("ext_events_retention"))
    assert(retention.size == 2, s"ext_events_retention: user_id + cohort cell, got $retention")
    val gsets = shuffles(q("ext_corpus_gsets"))
    assert(gsets.size == 1 && gsets.head.contains("spark_grouping_id"),
      s"ext_corpus_gsets: Expand feeds ONE grouping-sets aggregate exchange, got $gsets")
    val embcos = shuffles(q("ext_dedup_embcos"))
    assert(embcos.size == 1,
      s"ext_dedup_embcos: the block-pair groupByKey is the only exchange, got $embcos")
    // IVF: the corpus is NEVER hash-partitioned — assignment is the
    // map-only graft_nearest_centroid fold; the only hash exchange is the
    // final per-query top-k window over candidate rows, plus the two
    // single-row centroid-array builds
    val ivf = shuffles(q("ext_ann_ivf"))
    val ivfHash = ivf.filter(_.startsWith("hashpartitioning"))
    assert(ivfHash.size == 1 && ivfHash.head.contains("q_id"),
      s"ext_ann_ivf: only the q_id top-k window may hash-shuffle, got $ivf")
    // the k-means rounds shuffle only (cell, dim) partial sums — never
    // the corpus by vector id
    val km = shuffles(q("ext_ann_ivf_kmeans"))
    assert(!km.exists(_.contains("vid")),
      s"ext_ann_ivf_kmeans: corpus must never hash-partition on vid, got $km")
    // multi-probe IVF: the nprobe fan-out is the top-p graft_nearest_cells
    // fold + explode, map-only — the former ranked window hash-shuffled
    // the |queries| × |cents| product on q_id BEFORE the search join; now
    // the only q_id exchanges belong to the search join + top-k window
    // (the assignment stage itself is pinned exchange-free in
    // DotProductSpec; the hnsw family's is identical but sits behind a
    // localCheckpoint, invisible to this final-plan audit)
    val ivf2 = shuffles(q("ext_ann_ivf2"))
    assert(!ivf2.exists(_.contains("__rn")) && !ivf2.exists(_.contains("__ccos")),
      s"ext_ann_ivf2: no ranked-window assignment shuffle may remain, got $ivf2")
    assert(ivf2.count(_.startsWith("hashpartitioning")) <= 2,
      s"ext_ann_ivf2: join + top-k window only, got $ivf2")
    // PQ follows the IVF discipline: encode + reconstruct + score are all
    // broadcast-side — the only hash exchange is the q_id top-k window
    val pq = shuffles(q("ext_ann_pq"))
    val pqHash = pq.filter(_.startsWith("hashpartitioning"))
    assert(pqHash.size == 1 && pqHash.head.contains("q_id"),
      s"ext_ann_pq: only the q_id top-k window may hash-shuffle, got $pq")
    val ivfpq = shuffles(q("ext_ann_ivfpq"))
    val ivfpqHash = ivfpq.filter(_.startsWith("hashpartitioning"))
    assert(ivfpqHash.size == 1 && ivfpqHash.head.contains("q_id"),
      s"ext_ann_ivfpq: only the q_id top-k window may hash-shuffle, got $ivfpq")
    // TPC-H Q1 shape: ONE exchange on the grouping keys; everything else
    // is the map-side partial aggregate
    val pricing = shuffles(q("ext_pricing_summary"))
    assert(pricing.size == 1 && pricing.head.contains("l_returnflag"),
      s"ext_pricing_summary: one grouping-key exchange, got $pricing")
    // incremental merge: one user_id exchange per half-state; the
    // full-outer join reuses both partitionings
    val incr = shuffles(q("ext_incr_agg"))
    assert(incr.size == 2 && incr.forall(_.contains("user_id")),
      s"ext_incr_agg: two user_id state exchanges only, got $incr")
    // BM25: stats fold to ONE broadcast row (SinglePartition), scoring is
    // map-only, top-k is TakeOrdered — the corpus is NEVER hash-partitioned
    val bm25 = shuffles(q("ext_text_bm25"))
    assert(!bm25.exists(_.startsWith("hashpartitioning")),
      s"ext_text_bm25: no hash exchange expected, got $bm25")
    val sample = shuffles(q("ext_corpus_sample"))
    assert(sample.size == 1, s"ext_corpus_sample: one strata window exchange, got $sample")
    // the strata exchange also serves the final per-pack aggregate: a
    // hashpartitioning on a SUBSET of the grouping keys satisfies it
    val pack = shuffles(q("ext_corpus_pack"))
    assert(pack.size == 1 && pack.head.contains("lang"),
      s"ext_corpus_pack: the lang window exchange serves the groupBy too, got $pack")
    // bloom decontamination: the bitset side is lane-grouped (tiny) and
    // attaches BROADCAST — the train probe stream must never
    // hash-partition on the lane key (pre-checkpoint plan: the
    // registered query localCheckpoints the tiny result away)
    val docs = Tables.documents(spark, sf0001)
    val bloom = graft.operators.Dedup.bloomContamination(
      docs, docs.limit(20), "doc_id", "text", 1024, 3, 0.3,
      materialize = false)
    assert(!shuffles(bloom).exists(_.contains("lane")),
      s"ext_dedup_bloom: probe join must be broadcast, got ${shuffles(bloom)}")
    assert(bloom.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "ext_dedup_bloom: bloom bitset must attach as a broadcast hash join")
    // semantic dedup inherits the k-means discipline: Lloyd rounds never
    // hash-partition the corpus by vector id; the ONLY corpus-sized
    // exchange is the cell equi-join of the pair step
    val sem = shuffles(q("ext_dedup_semantic"))
    assert(!sem.exists(_.contains("vid")),
      s"ext_dedup_semantic: corpus must never hash-partition on vid, got $sem")
    assert(sem.filter(_.startsWith("hashpartitioning")).forall(_.contains("cell")),
      s"ext_dedup_semantic: every hash exchange must be cell-keyed (Lloyd " +
        s"partial sums + the pair join), got $sem")
    // hashed classifier: zero exchanges anywhere (asserted map-only in
    // TextOpsSpec; repeated here so the registry-level audit covers it)
    assert(shuffles(q("ext_text_classify")).isEmpty,
      "ext_text_classify: vocabulary-free inference must not shuffle")
    // mixture weights: ONE corpus-sized aggregate exchange on the domain
    // key; the normalizer is a window over the |domains| result rows
    // (SinglePartition), never a second corpus scan
    val mix = shuffles(q("ext_corpus_mix"))
    assert(mix.count(_.startsWith("hashpartitioning")) == 1
        && mix.count(_ == "SinglePartition") == 1,
      s"ext_corpus_mix: one domain aggregate exchange + the normalizer " +
        s"window, got $mix")
    // shard audit: ONE corpus-sized aggregate exchange on shard; the
    // grand totals are a window over the numShards result rows (a
    // SinglePartition exchange of 16 rows), never a second corpus scan
    val shards = shuffles(q("ext_layout_shards"))
    assert(shards.count(_.startsWith("hashpartitioning")) == 1
        && shards.filter(_.startsWith("hashpartitioning")).head.contains("shard")
        && shards.count(_ == "SinglePartition") == 1,
      s"ext_layout_shards: one shard-keyed aggregate exchange + the 16-row " +
        s"totals window, got $shards")
    // compaction planner: ONE corpus-sized aggregate exchange on the
    // cell keys; cumsum/seq windows and the bin aggregate run on the
    // |cells| rows behind a SinglePartition exchange
    val compact = shuffles(q("ext_layout_compact"))
    assert(compact.count(_.startsWith("hashpartitioning")) <= 2
        && compact.filter(_.startsWith("hashpartitioning")).head.contains("source")
        && compact.count(_ == "SinglePartition") == 1,
      s"ext_layout_compact: cell aggregate exchange + one cell-list " +
        s"window, got $compact")
    // epoch schedule inherits the mixture-weights discipline: one domain
    // aggregate exchange, normalizer windows over the |domains| rows
    val epochs = shuffles(q("ext_corpus_epochs"))
    assert(epochs.count(_.startsWith("hashpartitioning")) == 1
        && epochs.count(_ == "SinglePartition") == 1,
      s"ext_corpus_epochs: one domain aggregate exchange + the " +
        s"normalizer window, got $epochs")
    // MAD monitor: one (type, day) aggregate exchange; both median
    // windows re-use ONE event_type exchange over the day-list frame
    val mad = shuffles(q("ext_events_mad"))
    assert(mad.count(_.startsWith("hashpartitioning")) == 2
        && mad.exists(_.contains("event_type")),
      s"ext_events_mad: day-count aggregate + one event_type window " +
        s"exchange, got $mad")
    // kNN classify: the corpus label table must never hash-shuffle — the
    // tiny top-k list broadcasts onto it; remaining exchanges are
    // query-bounded (vote counts + the argmax window on q_id)
    val knn = q("ext_ann_knnclass")
    assert(knn.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "ext_ann_knnclass: top-k list must attach to labels as a broadcast hash join")
    assert(!shuffles(knn).exists(_.contains("__nid")),
      s"ext_ann_knnclass: label table must never hash-partition, got ${shuffles(knn)}")
  }

  test("plan audit: quota, canonical, leak-free split, and ndcg shapes hold") {
    def q(name: String) = SparkEntry.queries(name)(spark, sf0001)
    def scans(df: org.apache.spark.sql.DataFrame): Int =
      "Scan parquet".r.findAllIn(df.queryExecution.executedPlan.toString).size
    // quota telemetry: the (user_id, day) window exchange + the day
    // rollup — nothing else, one corpus scan
    val cap = shuffles(q("ext_events_cap"))
    assert(cap.size == 2 && cap.exists(s => s.contains("user_id") && s.contains("day")),
      s"ext_events_cap: window + rollup exchanges only, got $cap")
    // canonical selection: component window + the two doc_id join sides
    val canonDf = q("ext_dedup_canonical")
    val canon = shuffles(canonDf)
    assert(canon.size == 3 && canon.exists(_.contains("component")),
      s"ext_dedup_canonical: component window + doc_id join only, got $canon")
    assert(scans(canonDf) == 1,
      "ext_dedup_canonical: one corpus scan (pair graph is checkpointed)")
    // leak-free split: every corpus-derived input is checkpointed (0
    // visible scans) and the leak audit joins run ONCE — exactly four
    // doc-keyed exchanges; a union that recomputes the join subtree
    // doubles that and fails here (the explode-not-union discipline)
    val leakDf = q("ext_split_leakfree")
    val leak = shuffles(leakDf)
    val docKeyed = leak.filter(s => s.contains("doc_a") || s.contains("doc_b"))
    assert(docKeyed.size == 4,
      s"ext_split_leakfree: audit joins must run once (4 doc-keyed exchanges), got $leak")
    assert(leak.size == 7, s"ext_split_leakfree: 7 exchanges total, got $leak")
    assert(scans(leakDf) == 0,
      "ext_split_leakfree: pair graph and assignment are checkpointed")
    // ndcg: the corpus is never hash-partitioned by vector id — top-k
    // lists broadcast onto the label table; label exchanges carry only
    // map-side aggregate partials
    val ndcgDf = q("ext_ann_ndcg")
    val ndcg = shuffles(ndcgDf)
    assert(!ndcg.exists(_.contains("vec_id")),
      s"ext_ann_ndcg: corpus must never hash-partition on vec_id, got $ndcg")
    assert(ndcgDf.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "ext_ann_ndcg: top-k lists must attach to labels via broadcast hash join")
  }

  test("plan audit: no recomputed corpus-scan branches (round-4 sweep holds)") {
    // Spark does not reliably exchange-reuse identical aggregate
    // branches, so a model aggregate joined back to its own source
    // silently re-scans the corpus. The round-4 sweep rewrote these as
    // partitioned windows / persisted streams; this pins the scan counts
    // so a refactor that reintroduces a branch fails loudly.
    def scans(name: String): Int =
      "Scan parquet".r.findAllIn(
        SparkEntry.queries(name)(spark, sf0001)
          .queryExecution.executedPlan.toString).size
    val expect = Map(
      "ext_corpus_mix" -> 1, "ext_corpus_fences" -> 1,
      "ext_events_novelty" -> 1, "ext_text_bigram_lm" -> 1,
      "ext_corpus_drift" -> 2, // word counts + the 1-row token total
      "ext_text_tfidf" -> 2, // term stats + the 1-row corpus count
      "ext_layout_shards" -> 1,
      "ext_layout_compact" -> 1, "ext_corpus_epochs" -> 1,
      "ext_events_mad" -> 1)
    expect.foreach { case (name, n) =>
      assert(scans(name) == n,
        s"$name: expected $n parquet scans, got ${scans(name)} — a " +
          "recomputed aggregate branch crept back in")
    }
  }

  test("histogramQuantiles: stats attach broadcasts; exactly two event scans") {
    val df = graft.operators.Sketches.histogramQuantiles(
      Tables.events(spark, sf0001).select(col("event_type"), col("value")),
      "value", "event_type", 256, Seq(0.5, 0.9))
    df.collect()
    // adaptive toString prints Final + Initial sections; count scans in
    // the FINAL plan only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"),
      "per-group lo/hi/n must attach to the row stream as a broadcast")
    val evScans = "Scan parquet".r.findAllIn(plan).size
    assert(evScans == 2,
      s"expected 2 corpus scans (histogram + exact audit), got $evScans — " +
        "at 100 TB the audit scan is dropped and ONE remains")
  }

  test("ext_pricing_q19: the part-side residue of the OR-of-ANDs is pushed to the part scan") {
    val df = SparkEntry.queries("ext_pricing_q19")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // Catalyst's partial predicate extraction derives
    // ((b13∧size≤10)∨(b19∧size≤20)∨(b23∧size≤30)) — part columns only —
    // from the mixed-table disjunction and pushes it into the part scan;
    // without it every part row survives to the join
    assert(plan.contains("Or(And(") && plan.contains("p_brand"),
      "the disjunctive part-side residue must reach the part scan's pushed filters")
    assert(plan.contains("BroadcastHashJoin"),
      "the pruned part side must broadcast")
    assert(!plan.contains("CartesianProduct"))
  }

  test("ext_pricing_q21: one lineitem pass feeds both per-order counts (ReusedExchange), top-k heaps") {
    val df = SparkEntry.queries("ext_pricing_q21")(spark, sf0001)
    // AQE applies exchange reuse at stage materialization — execute
    // first, then read the FINAL adaptive plan
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the (orderkey, suppkey) aggregate is computed ONCE and its exchange
    // reused by both consumers (the per-order rollup and the late-supplier
    // filter side) — the EXISTS/NOT-EXISTS double correlation costs one
    // fact pass, not three
    assert(plan.contains("ReusedExchange"),
      "the per-(order,supplier) exchange must be built once and reused")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("TakeOrderedAndProject"),
      "top-10 must plan as per-partition heaps")
  }

  test("ext_pricing_q3: broadcast dim semi-join, date filters pushed to both scans") {
    val df = SparkEntry.queries("ext_pricing_q3")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftSemi"),
      "the filtered customer dim must SEMI-reduce orders as a broadcast")
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate") ||
      plan.contains("LessThan(o_orderdate"),
      "the order-date cutoff must reach the orders parquet scan")
    assert(plan.contains("GreaterThan(l_shipdate"),
      "the ship-date cutoff must reach the lineitem parquet scan")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-10 must plan as per-partition heaps, not a global sort")
  }

  test("ext_pricing_q18: qualifying keys broadcast back, top-k plans as heaps") {
    val df = SparkEntry.queries("ext_pricing_q18")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the tiny post-HAVING key set must broadcast onto orders, not shuffle it")
    assert(!plan.contains("SortMergeJoin"),
      "no fact-sized shuffle join belongs in this plan")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-100 must plan as per-partition heaps, not a global sort")
  }

  test("ext_pricing_q2: part slice broadcasts into the fact, size filter pushed, top-k heaps") {
    val df = SparkEntry.queries("ext_pricing_q2")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the p_size slice must broadcast onto lineitem — never shuffle the fact for a dim filter")
    assert(plan.contains("LessThanOrEqual(p_size"),
      "the size predicate must reach the part parquet scan")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-100 must plan as per-partition heaps, not a global sort")
  }

  test("ext_pricing_q4: EXISTS plans as one semi join, date window pushed to orders") {
    val df = SparkEntry.queries("ext_pricing_q4")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      "EXISTS must be a semi join — an inner join + distinct pays a fact-sized dedup")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate") &&
      plan.contains("LessThan(o_orderdate"),
      "both ends of the quarter window must reach the orders scan")
  }

  test("ext_classify_calib: banding is arithmetic, never a rank window") {
    val df = SparkEntry.queries("ext_classify_calib")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "margin banding must be (margin-lo)*bins div range arithmetic — a " +
        "rank/ntile formulation funnels the corpus through one sort partition")
  }

  test("ext_quality_contract: eight checks, ONE orders scan (fused metrics)") {
    val df = SparkEntry.queries("ext_quality_contract")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    val ordersScans = "orders\\.parquet".r.findAllIn(plan).length
    assert(ordersScans == 1,
      s"the whole battery must ride one fused orders scan, found $ordersScans")
    assert(plan.contains("BroadcastHashJoin"),
      "the RI probe must ride the same pass via a broadcast key-set join")
  }

  test("bucketed minhash index: probe join has ZERO Exchange on the stored side") {
    import graft.operators.Dedup
    import org.apache.spark.sql.execution.FileSourceScanExec
    graft.functions.GraftFunctions.register(spark)
    spark.sql("DROP TABLE IF EXISTS scalespec_bidx_bands")
    val docs = Tables.documents(spark, sf0001)
    val path = s"${sys.props("java.io.tmpdir")}/graft_scalespec_bidx"
    Dedup.writeMinhashIndexBucketed(docs.where(col("doc_id") % 10 < 8),
      "doc_id", "text", 16, 2, Dedup.PolyHash, "scalespec_bidx", path, 8)
    // materialize=false keeps the live join plan (the default
    // localCheckpoints, leaving only an RDD scan to inspect)
    val probe = Dedup.probeMinhashIndexBucketed("scalespec_bidx", path,
      docs.where(col("doc_id") % 10 >= 8), "doc_id", "text", 16, 2, 0.8,
      Dedup.PolyHash, materialize = false)
    // unwrap AQE: collect() does not traverse into AdaptiveSparkPlanExec,
    // so inspect the pre-adaptive physical plan (EnsureRequirements has
    // already placed every Exchange there)
    val plan = probe.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case p => p
    }
    val bucketedScans = plan.collect {
      case f: FileSourceScanExec if f.relation.bucketSpec.isDefined => f
    }
    assert(bucketedScans.nonEmpty, "the stored band table must scan bucketed")
    // the daily-probe contract: the accumulated index NEVER re-shuffles —
    // no ShuffleExchange subtree may contain the bucketed scan (only the
    // O(batch) incoming side moves, into the bucket count)
    val shufflesOverStored = plan.collect {
      case s: ShuffleExchangeExec if s.collectLeaves().exists {
          case f: FileSourceScanExec => f.relation.bucketSpec.isDefined
          case _ => false
        } => s
    }
    assert(shufflesOverStored.isEmpty,
      s"stored index re-shuffled: ${shufflesOverStored.size} exchanges above the bucketed scan")
    // and the bucketed probe returns the same pairs as the plain-parquet probe
    val plainPath = s"${sys.props("java.io.tmpdir")}/graft_scalespec_pidx"
    Dedup.writeMinhashIndex(docs.where(col("doc_id") % 10 < 8),
      "doc_id", "text", 16, 2, Dedup.PolyHash, plainPath)
    val plain = Dedup.probeMinhashIndex(plainPath,
      docs.where(col("doc_id") % 10 >= 8), "doc_id", "text", 16, 2, 0.8,
      Dedup.PolyHash)
    assert(probe.exceptAll(plain).count() == 0 &&
      plain.exceptAll(probe).count() == 0,
      "bucketed probe must be result-identical to the plain probe")
  }

  test("editVerifiedPairs: text attachment never shuffles the corpus") {
    val df = graft.operators.Dedup.editVerifiedPairs(
      Tables.documents(spark, sf0001), "doc_id", "text",
      16, 2, 0.5, 4000, graft.operators.Dedup.PolyHash, materialize = false)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "edit verification must stay candidate-bounded")
    assert(plan.contains("BroadcastHashJoin"),
      "the candidate pair list must broadcast onto the corpus text scans")
    assert(plan.contains("levenshtein"),
      "sanity: the verify expression is in this plan")
  }

  test("ext_pricing_q7/q8/q17: dim chains broadcast, windows pushed, slice-sized frames") {
    def plan(name: String) = SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString
    // q7: the two-nation cut broadcasts down both chains; the ship-date
    // window reaches the lineitem scan; at most the lineitem ⋈ orders
    // pair sort-merges (AQE may broadcast even that at this scale)
    val p7 = plan("ext_pricing_q7")
    assert(p7.contains("BroadcastHashJoin"))
    assert("SortMergeJoin".r.findAllIn(p7).size <= 1,
      "only lineitem ⋈ orders may be a fact-fact shuffle join in q7")
    assert(p7.contains("GreaterThanOrEqual(l_shipdate") &&
      p7.contains("LessThan(l_shipdate"),
      "the ship-date window must reach the lineitem scan")
    // q8: the LARGE-part cut is pushed to the part scan and broadcasts
    // into lineitem — the fact never meets an uncut part table
    val p8 = plan("ext_pricing_q8")
    assert(p8.contains("EqualTo(p_type,LARGE)"),
      "the part-type cut must reach the part scan")
    assert("SortMergeJoin".r.findAllIn(p8).size <= 1,
      "only lineitem ⋈ orders may be a fact-fact shuffle join in q8")
    // q17: the brand+type slice is pushed to the part scan, and the
    // per-part window runs AFTER the broadcast cut — slice-sized frame
    val p17 = plan("ext_pricing_q17")
    assert(p17.contains("EqualTo(p_brand,Brand#13)") &&
      p17.contains("EqualTo(p_type,SMALL)"),
      "the brand+type slice must reach the part scan")
    assert(!p17.contains("SortMergeJoin"),
      "the part slice must broadcast into the fact — q17 has no shuffle join")
    assert(p17.contains("Window"),
      "the per-part average must be a window over the slice")
    // q6: no join at all — one scan with the date window pushed (read
    // off the scan node's metadata: the plan string truncates long
    // filter lists with "...")
    val q6df = SparkEntry.queries("ext_pricing_q6")(spark, sf0001)
    assert(!q6df.queryExecution.executedPlan.toString.contains("Join"),
      "q6 must plan join-free")
    // sparkPlan, not executedPlan: AdaptiveSparkPlanExec has no children
    // until execution, so collect() over the adaptive wrapper sees nothing
    val q6Pushed = q6df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata.getOrElse("PushedFilters", "")
    }.mkString
    assert(q6Pushed.contains("GreaterThanOrEqual(l_shipdate") &&
      q6Pushed.contains("LessThan(l_shipdate"),
      s"the ship-date window must reach the lineitem scan in q6: $q6Pushed")
    // q9: the part-name LIKE 'prefix%' pushes as StartsWith
    val p9 = plan("ext_pricing_q9")
    assert(p9.contains("StringStartsWith(p_name,blue)"),
      "the part-name prefix must reach the part scan as StartsWith")
    assert(!p9.contains("SortMergeJoin"),
      "q9's dim chains must broadcast — no fact-sized sort join")
  }

  test("ext_pricing_q5: broadcast chain holds, date filters pushed to orders") {
    val df = SparkEntry.queries("ext_pricing_q5")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      "the star chain must broadcast at this scale — no fact-sized sort join")
    assert(plan.contains("BroadcastHashJoin"))
    assert(plan.contains("GreaterThanOrEqual(o_orderdate") &&
      plan.contains("LessThan(o_orderdate"),
      "both ends of the order-date window must reach the orders scan")
  }

  test("Catalyst injects a runtime bloom filter on a selective fact-fact join") {
    // the engine-native semi-join reduction at 100 TB: when a fact-fact
    // shuffle join has a selective filter on one side, InjectRuntimeFilter
    // builds a bloom filter from the filtered side and probes it on the
    // other side's scan — rows that cannot join never enter the exchange.
    // Local thresholds are sized for clusters, so the test lowers them to
    // make the tiny fixture eligible; the REWRITE is what's being pinned.
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val ord = Tables.orders(spark, sf0001)
        .where(col("o_totalprice") > 90000.0)
      val j = Tables.lineitem(spark, sf0001)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected a bloom-filter probe on the lineitem side:\n$optimized")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("plan audit: winsor, gini, tclose, overlap shapes hold") {
    def plan(name: String): String =
      SparkEntry.queries(name)(spark, sf0001)
        .queryExecution.executedPlan.toString
    def parquetScans(p: String): Int = "Scan parquet".r.findAllIn(p).size

    // winsor: bounds frame broadcasts back; exactly two corpus scans
    // (percentile pass + clip pass — at 100 TB approx_percentile keeps
    // the same shape)
    val wp = plan("ext_events_winsor")
    assert(wp.contains("BroadcastHashJoin"),
      "the per-group [p05,p95] bounds must attach as a broadcast")
    assert(parquetScans(wp) == 2,
      s"winsor is a two-pass algorithm, got ${parquetScans(wp)} scans")

    // gini: ONE corpus scan; the length ranking runs AFTER the
    // (source, length, count) aggregate, so the window sorts the
    // bounded distinct-length frame, never the rows
    val gp = plan("ext_corpus_gini")
    assert(parquetScans(gp) == 1,
      s"gini must ride one documents scan, got ${parquetScans(gp)}")
    assert(gp.contains("Window"), "sanity: the rank window is in this plan")

    // tclose: the compact (quasi-id, band) frame is checkpointed, so
    // the four margin/grid consumers read the pinned frame — the final
    // plan contains NO parquet scan (the single scan ran at pin time)
    // and no fact-sized join strategy
    val tp = plan("ext_privacy_tclose")
    assert(parquetScans(tp) == 0 && tp.contains("Scan ExistingRDD"),
      "tclose margins must re-read the checkpointed count frame")
    assert(!tp.contains("SortMergeJoin"),
      "every tclose join is margin-sized and must broadcast")

    // overlap: keys + state frames are checkpointed — one corpus scan
    // at pin time, every pair statistic reads bitmap-sized frames
    val op = plan("ext_sketch_overlap")
    assert(parquetScans(op) == 0 && op.contains("Scan ExistingRDD"),
      "overlap branches must re-read the pinned keys/state frames")
  }

  test("harvestZones: footers are the physical truth — range write disjoint, hash write straddles") {
    // the contrast ext_layout_zonemap's oracle can't see: the SAME rows
    // written hash-bucketed produce zones that all straddle the domain
    // (footer pruning skips nothing), while the range write's zones are
    // pairwise disjoint; and the footer row counts answer count(*)
    // without touching data — the stats-only fast path
    import graft.operators.Layout
    val dir = java.nio.file.Files.createTempDirectory("graft_zones").toString
    try {
      val ev = Tables.events(spark, sf0001).select("event_id", "user_id")
      val mx = ev.agg(max("user_id")).head.getLong(0)
      ev.withColumn("zb", expr(s"user_id * 4 div ${mx + 1}L"))
        .repartition(4, col("zb"))
        .write.mode("overwrite").partitionBy("zb").parquet(s"$dir/range")
      ev.withColumn("zb", expr("user_id % 4"))
        .repartition(4, col("zb"))
        .write.mode("overwrite").partitionBy("zb").parquet(s"$dir/hash")
      def zones(sub: String) = Layout.harvestZones(spark, s"$dir/$sub", "user_id")
        .withColumn("zb", regexp_extract(col("file"), "zb=(\\d+)", 1).cast("long"))
        .groupBy("zb").agg(min("zmin").as("lo"), max("zmax").as("hi"),
          sum("rows").as("n"))
        .collect().sortBy(_.getLong(0))
      val range = zones("range")
      val hash = zones("hash")
      // stats-only count: footer row counts sum to count(*), both layouts
      val total = ev.count()
      assert(range.map(_.getLong(3)).sum == total)
      assert(hash.map(_.getLong(3)).sum == total)
      // range zones pairwise disjoint (consecutive in bucket order)
      range.sliding(2).foreach { case Array(a, b) =>
        assert(a.getLong(2) < b.getLong(1),
          s"range zones must be disjoint: $a vs $b")
      }
      // hash zones ALL straddle ~the full domain: every zone's span
      // covers more than half of it (user_id % 4 interleaves)
      hash.foreach { z =>
        assert(z.getLong(2) - z.getLong(1) > mx / 2,
          s"hash zone should straddle the domain: $z (max=$mx)")
      }
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    // the static PartitionFilters pin above needs the literal ON the
    // fact's partition column; at 100 TB the selective predicate usually
    // lives on a DIMENSION attribute the fact only reaches through a
    // join. DPP closes that gap: the broadcast dim's surviving join keys
    // become a runtime PartitionFilter on the fact scan, so non-matching
    // partition directories are never opened — and because the dim is
    // broadcast anyway, the pruning subquery reuses that exchange for
    // free. The dim filter must be on a NON-key attribute: a filter on
    // the join key itself would transit statically and never exercise
    // the runtime path.
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    try {
      Tables.events(spark, sf0001)
        .write.mode("overwrite").partitionBy("event_type").parquet(s"$dir/fact")
      // the dim must be FILE-BACKED and the predicate a comparison shape:
      // ConvertToLocalRelation folds a Filter over an in-memory Seq away
      // before the pruning rule ever sees it, and Catalyst's
      // isLikelySelective gate doesn't count a bare boolean attribute
      Seq(("purchase", "revenue"), ("click", "engage"),
        ("view", "engage"), ("signup", "acquire"), ("error", "ops"))
        .toDF("event_type", "category")
        .write.mode("overwrite").parquet(s"$dir/dim")
      val dim = spark.read.parquet(s"$dir/dim")
      val j = spark.read.parquet(s"$dir/fact")
        .join(dim.where(col("category") === "revenue"), Seq("event_type"))
        .groupBy("event_type").agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"expected a dynamicpruning PartitionFilter on the fact scan in:\n$plan")
      val expected = Tables.events(spark, sf0001)
        .where(col("event_type") === "purchase").count()
      val rows = j.collect()
      assert(rows.length == 1 && rows.head.getLong(1) == expected)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("CBO: ANALYZE statistics give exact plan cardinalities and reorder the join chain") {
    // the statistics half of ext_stats_analyze's story: once the catalog
    // carries ANALYZE'd row counts + column histograms, (a) the optimizer
    // plans with EXACT cardinalities instead of size-in-bytes guesses,
    // and (b) CostBasedJoinReorder rewrites a badly-written inner-join
    // chain (fact ⋈ fact first, selective dim last) into the selective
    // order — the 100 TB failure mode this kills is a petabyte
    // intermediate that a human wrote casually and a cost model refuses.
    for (t <- Seq("s_orders", "s_customer", "s_nation")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        loc.listFiles().foreach(_.delete())
        loc.delete()
      }
    }
    Tables.orders(spark, sf0001).write.saveAsTable("s_orders")
    Tables.customer(spark, sf0001).write.saveAsTable("s_customer")
    Tables.nation(spark, sf0001).write.saveAsTable("s_nation")
    for (t <- Seq("s_orders", "s_customer", "s_nation"))
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      // exact cardinality from the catalog, not a bytes-based guess
      val stats = spark.table("s_orders").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(1500)),
        s"ANALYZE row count must reach the plan: ${stats.rowCount}")
      // written order: (orders ⋈ customer) ⋈ σ(nation) — the selective
      // single-nation cut joins LAST as written
      def chain() = spark.table("s_orders")
        .join(spark.table("s_customer"),
          col("o_custkey") === col("c_custkey"))
        .join(spark.table("s_nation").where(col("n_name") === "NATION_7"),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("n"))
      def leafOrder(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collectLeaves().map(_.toString)
          .map(s => Seq("s_orders", "s_customer", "s_nation")
            .find(s.contains).getOrElse("?"))
      val reordered = leafOrder(chain())
      assert(reordered.indexOf("s_nation") < reordered.indexOf("s_orders"),
        s"cost model should join the filtered nation before the fact: $reordered")
      val without = {
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
        try leafOrder(chain())
        finally spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      }
      assert(without.indexOf("s_nation") > without.indexOf("s_orders"),
        s"without reorder the written (bad) order must survive: $without")
      // semantics unchanged by the reorder
      val expected = Tables.orders(spark, sf0001)
        .join(Tables.customer(spark, sf0001),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(spark, sf0001).where(col("n_name") === "NATION_7"),
          col("c_nationkey") === col("n_nationkey"))
        .count()
      val got = chain().collect()
      assert(got.length == 1 && got.head.getLong(1) == expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
