package graft

import graft.operators.Similarity
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The DataSourceV2 serving face of the persisted indexes
  * (sources/GraftIndexSource.scala): schema/row parity with the raw
  * parquet read, static partition-filter pushdown (directory pruning
  * visible as input-partition counts), V2 runtime filtering (the DPP
  * form a broadcast probe join plants), post-pruning statistics, and
  * the zero-data-IO count path.
  */
class GraftIndexSourceSpec extends SparkSpec {

  private def writeIndex(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_v2idx").toString
    Similarity.writeIvfIndex(Tables.embeddings(spark, sf0001),
      "vec_id", "embedding", 25, dir)
    dir
  }

  private def v2(path: String) =
    spark.read.format("graft-index").load(path)

  test("row + schema parity with the raw parquet read (partitioned cells and flat cents)") {
    val dir = writeIndex()
    for (sub <- Seq("cells", "cents")) {
      val raw = spark.read.parquet(s"$dir/$sub")
      val got = v2(s"$dir/$sub").select(raw.columns.map(col): _*)
      assert(got.schema == raw.select(raw.columns.map(col): _*).schema,
        s"$sub schema diverges")
      assert(got.count() > 0)
      assert(got.exceptAll(raw).count() == 0 && raw.exceptAll(got).count() == 0,
        s"$sub rows diverge from the parquet read")
    }
  }

  test("static partition filter prunes directories; stats are post-pruning") {
    val dir = writeIndex()
    val all = v2(s"$dir/cells")
    val cells = all.select(col("cell").cast("long")).distinct().collect().map(_.getLong(0)).sorted
    assert(cells.length >= 3, "fixture must have several cells")
    val one = all.where(col("cell") === cells.head)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def scanOf(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get
      val allScan = scanOf(all)
      val oneScan = scanOf(one)
      assert(oneScan.inputRDD.getNumPartitions < allScan.inputRDD.getNumPartitions,
        "cell = k must plan fewer input partitions than the full scan")
      // the pushed filter is enforced by pruning, not post-filtering:
      // rows still correct
      assert(one.select(col("cell").cast("long")).distinct().collect()
        .map(_.getLong(0)).toSeq == Seq(cells.head))
      // post-pruning stats: the filtered relation reports fewer bytes
      val allBytes = all.queryExecution.optimizedPlan.stats.sizeInBytes
      val oneBytes = one.queryExecution.optimizedPlan.stats.sizeInBytes
      assert(oneBytes < allBytes,
        s"pruned stats must shrink: $oneBytes !< $allBytes")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("count(*) over the v2 table decodes zero data pages (footer counts) and matches") {
    val dir = writeIndex()
    assert(v2(s"$dir/cells").count() ==
      spark.read.parquet(s"$dir/cells").count())
    // partition-only projection rides the same counting reader
    val perCell = v2(s"$dir/cells").groupBy("cell").count()
    val refCell = spark.read.parquet(s"$dir/cells").groupBy("cell").count()
    assert(perCell.exceptAll(refCell).count() == 0 &&
      refCell.exceptAll(perCell).count() == 0)
  }

  test("runtime filtering: a broadcast probe join prunes cells at execution (V2 DPP)") {
    val dir = writeIndex()
    val corp = v2(s"$dir/cells")
    val cells = corp.select(col("cell").cast("long")).distinct().collect().map(_.getLong(0)).sorted
    // a tiny probe frame hitting ONE cell, joined on the partition
    // column AT THE SCAN'S TYPE — a mismatched key type puts a Cast on
    // the scan side, and the V2 runtime-filter translation drops on
    // casts (the round-10 probe fix aligns the operator the same way)
    import spark.implicits._
    // PartitionPruning only plants the subquery when the probe side is
    // FILE-BACKED and carries a selective comparison predicate (the
    // real ANN probes do: queries are a filtered slice of the corpus) —
    // and the join key must be AT THE SCAN'S TYPE: a mismatch puts a
    // Cast on the scan side, which the V2 runtime-filter translation
    // drops (the round-10 probe fix aligns the operator the same way)
    val probe = spark.read.parquet(s"$dir/cents")
      .where(col("cent_id") === cells.head)
      .select(col("cent_id").cast(corp.schema("cell").dataType).as("cell"))
    val joined = corp.join(broadcast(probe), Seq("cell"))
    val rows = joined.count()
    assert(rows > 0 && rows < corp.count(),
      "probe join must select a strict subset")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val fresh = corp.join(broadcast(probe), Seq("cell"))
      val plan = fresh.queryExecution.executedPlan
      val scan = plan.collectFirst { case b: BatchScanExec => b }.get
      assert(scan.scan.isInstanceOf[org.apache.spark.sql.connector.read.SupportsRuntimeFiltering],
        "scan must advertise runtime filtering")
      // the planner must actually PLANT the dynamic-pruning filter on
      // the scan (an interface-only pin missed the cast regression)...
      assert(scan.runtimeFilters.nonEmpty,
        s"DPP filter missing from the scan:\n$plan")
      // ...and at execution the translated filter must PRUNE. The scan
      // reports KeyGroupedPartitioning, so Spark pads pruned groups back
      // as EMPTY partitions to honor the advertised partitioning — the
      // pruning is visible in the FILES each split carries, not the
      // split count. (collect() drives THIS plan instance, so its DPP
      // subquery runs before the scan's partitions are planned.)
      assert(fresh.collect().nonEmpty)
      def filesOf(b: BatchScanExec): Long = b.inputRDD.partitions.map {
        case p: org.apache.spark.sql.execution.datasources.v2.DataSourceRDDPartition =>
          p.inputPartitions.map(
            _.asInstanceOf[graft.sources.GraftIndexInputPartition].files.size.toLong).sum
        case _ => 0L
      }.sum
      val fullScan = corp.queryExecution.executedPlan.collectFirst {
        case b: BatchScanExec => b
      }.get
      assert(filesOf(scan) < filesOf(fullScan) && filesOf(scan) > 0,
        s"runtime filter did not prune files: ${filesOf(scan)} vs ${filesOf(fullScan)}")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("data-filter pushdown: claimed filters vanish from the plan, rows exact, arrays survive") {
    val dir = writeIndex()
    val raw = spark.read.parquet(s"$dir/cells")
    val someId = raw.select(min(col("vec_b"))).collect().head.getLong(0)
    val got = v2(s"$dir/cells").where(col("vec_b") === someId)
    val ref = raw.where(col("vec_b") === someId)
    assert(got.count() == ref.count() && got.count() > 0)
    assert(got.select("vec_b", "vb", "nb").exceptAll(ref.select("vec_b", "vb", "nb")).count() == 0)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = got.queryExecution.executedPlan
      // the equality is claimed exactly by the parquet record filter:
      // no post-scan Filter on vec_b remains (IsNotNull is claimed too)
      val filters = plan.collect {
        case f: org.apache.spark.sql.execution.FilterExec => f
      }
      assert(filters.isEmpty,
        s"claimed data filter must not be re-evaluated:\n$plan")
      val scan = plan.collectFirst { case b: BatchScanExec => b }.get
      assert(scan.scan.description().contains("pushedDataFilters=[") &&
        scan.scan.description().contains("vec_b"),
        s"pushed data filter must be visible: ${scan.scan.description()}")
      // range shape too
      val rng = v2(s"$dir/cells").where(col("nb") > 0.0)
      assert(rng.count() == raw.where(col("nb") > 0.0).count())
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("aggregate pushdown: COUNT/MIN/MAX answer from footer stats, zero data decode") {
    val dir = writeIndex()
    val raw = spark.read.parquet(s"$dir/cells")
    val ref = raw.agg(count(lit(1)).cast("long").as("c"),
      min(col("vec_b")).as("mn"), max(col("vec_b")).as("mx"),
      min(col("nb")).as("mnd"), max(col("nb")).as("mxd")).collect().head
    // fresh frames INSIDE the AQE-off block: a collect() under AQE
    // wraps the cached executedPlan in AdaptiveSparkPlanExec, which
    // hides the scan from collectFirst
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val got = v2(s"$dir/cells").agg(count(lit(1)).cast("long").as("c"),
        min(col("vec_b")).as("mn"), max(col("vec_b")).as("mx"),
        min(col("nb")).as("mnd"), max(col("nb")).as("mxd"))
      val scan = got.queryExecution.executedPlan.collectFirst {
        case b: BatchScanExec => b
      }.get
      assert(scan.scan.description().contains("pushedAggregation=[") &&
        scan.scan.description().contains("COUNT(*)"),
        s"aggregation must be pushed: ${scan.scan.description()}")
      // the scan emits the partial-agg shape, not data rows
      assert(scan.scan.readSchema().length == 5,
        s"partial agg schema expected, got ${scan.scan.readSchema()}")
      assert(got.collect().head == ref)
      // refused (and still correct) when a data filter is pushed
      val filtered = v2(s"$dir/cells").where(col("nb") > 0.0)
        .agg(count(lit(1)).as("c"))
      val fScan = filtered.queryExecution.executedPlan.collectFirst {
        case b: BatchScanExec => b
      }.get
      assert(!fScan.scan.description().contains("COUNT"),
        "agg pushdown must be refused when data filters are pushed")
      assert(filtered.collect().head.getLong(0) ==
        raw.where(col("nb") > 0.0).count())
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("key-grouped partition reporting: cell-clustered aggregate skips the exchange") {
    val dir = writeIndex()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      // sum() is NOT footer-pushable, so this rides the row scan — the
      // pure key-grouped-reporting lane (one split per cell directory)
      val agg = v2(s"$dir/cells").groupBy("cell")
        .agg(sum(col("nb")).as("sn"))
      val ref = spark.read.parquet(s"$dir/cells").groupBy("cell")
        .agg(sum(col("nb")).as("sn"))
      assert(agg.exceptAll(ref).count() == 0 && ref.exceptAll(agg).count() == 0)
      val shuffles = agg.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"cell-grouped aggregate must ride the reported KeyGroupedPartitioning:\n${agg.queryExecution.executedPlan}")
    } finally {
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  test("grouped aggregate pushdown is COMPLETE: per-cell COUNT/MAX, zero aggregate, zero exchange") {
    val dir = writeIndex()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val agg = v2(s"$dir/cells").groupBy("cell")
        .agg(count(lit(1)).as("n"), max(col("vec_b")).as("mx"))
      val plan = agg.queryExecution.executedPlan
      val scan = plan.collectFirst { case b: BatchScanExec => b }.get
      assert(scan.scan.description().contains("pushedAggregation=[") &&
        scan.scan.description().contains("COUNT(*)"),
        s"grouped aggregation must push: ${scan.scan.description()}")
      assert(scan.scan.readSchema().fieldNames.head == "cell")
      // COMPLETE pushdown (round-10): every grouped split carries ALL
      // files of its group, so the reader folds them into one FINAL row
      // — Spark plans NO aggregate and NO exchange on top (the former
      // partial rows shuffled |files| rows because the pushdown
      // Project's aliases defeat KeyGroupedPartitioning propagation)
      assert(plan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
      }.isEmpty, s"complete pushed aggregate must not shuffle:\n$plan")
      assert(plan.collect {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
      }.isEmpty, s"complete pushed aggregate must not re-aggregate:\n$plan")
      val ref = spark.read.parquet(s"$dir/cells").groupBy("cell")
        .agg(count(lit(1)).as("n"), max(col("vec_b")).as("mx"))
      assert(agg.exceptAll(ref).count() == 0 && ref.exceptAll(agg).count() == 0)
      // an UNGROUPED aggregate stays PARTIAL (a complete answer would
      // serialize all footer IO into one split): Spark's final
      // aggregate still merges the per-file rows, values exact
      val tot = v2(s"$dir/cells").agg(count(lit(1)).as("n"), min(col("vec_b")).as("mn"))
      val totRef = spark.read.parquet(s"$dir/cells")
        .agg(count(lit(1)).as("n"), min(col("vec_b")).as("mn"))
      assert(tot.exceptAll(totRef).count() == 0 && totRef.exceptAll(tot).count() == 0)
      assert(tot.queryExecution.executedPlan.collect {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
      }.nonEmpty, "ungrouped pushdown stays partial — Spark's aggregate merges")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("limit pushdown: each split stops early, global limit stays correct") {
    val dir = writeIndex()
    val got = v2(s"$dir/cells").limit(7)
    assert(got.count() == 7)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val fresh = v2(s"$dir/cells").limit(7)
      assert(fresh.collect().length == 7)
      // rows drawn from the real table (schema + values sane)
      val all = spark.read.parquet(s"$dir/cells")
      assert(fresh.join(all, Seq("vec_b"), "left_semi").count() == 7)
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("storage-partitioned join: two key-grouped V2 reads join on cell with zero exchange") {
    val dir = writeIndex()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      // per-cell summaries from two independent V2 scans of the stored
      // index — both report KeyGroupedPartitioning(cell), so the join
      // needs no shuffle at all (the SPJ production shape: stored-vs-
      // stored co-located joins at 100 TB)
      // sum() on both sides: NOT footer-pushable, so both lanes are row
      // scans riding the reported key grouping (the pushed-agg lane's
      // partial rows go through their own |files|-row exchange — tiny,
      // but this pin is about the row-scan shape)
      val a = v2(s"$dir/cells").groupBy("cell").agg(sum(col("nb")).as("sn"))
      val b = v2(s"$dir/cells").groupBy("cell").agg(sum(col("vec_b")).as("mx"))
      val joined = a.join(b, Seq("cell"))
      val refA = spark.read.parquet(s"$dir/cells").groupBy("cell")
        .agg(sum(col("nb")).as("sn"))
      val refB = spark.read.parquet(s"$dir/cells").groupBy("cell")
        .agg(sum(col("vec_b")).as("mx"))
      val ref = refA.join(refB, Seq("cell"))
      assert(joined.exceptAll(ref).count() == 0 &&
        ref.exceptAll(joined).count() == 0)
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"cell-cell join of two key-grouped scans must not shuffle:\n${joined.queryExecution.executedPlan}")
    } finally {
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  test("catalog face: CREATE TABLE USING graft-index gives the index a SQL name") {
    val dir = writeIndex()
    spark.sql("DROP TABLE IF EXISTS graft_ivf_cells")
    spark.sql(
      s"CREATE TABLE graft_ivf_cells USING `graft-index` LOCATION '$dir/cells'")
    try {
      val viaSql = spark.sql(
        "SELECT cell, count(*) AS n FROM graft_ivf_cells GROUP BY cell")
      val ref = spark.read.parquet(s"$dir/cells").groupBy("cell")
        .agg(count(lit(1)).as("n"))
      assert(viaSql.exceptAll(ref).count() == 0 &&
        ref.exceptAll(viaSql).count() == 0)
    } finally spark.sql("DROP TABLE IF EXISTS graft_ivf_cells")
  }

  test("probe parity: probeIvfIndex through the V2 serving table ≡ parquet probe") {
    val dir = writeIndex()
    val emb = Tables.embeddings(spark, sf0001)
    val q = emb.where(col("vec_id") % 50 === 0)
    val viaParquet = Similarity.probeIvfIndex(dir, q, "vec_id", "embedding", 5)
    val viaV2 = Similarity.probeIvfIndexV2(dir, q, "vec_id", "embedding", 5)
    assert(viaV2.count() > 0)
    assert(viaV2.exceptAll(viaParquet).count() == 0 &&
      viaParquet.exceptAll(viaV2).count() == 0,
      "V2 probe must be row-identical to the parquet probe")
  }

  test("vectorized lane: pure projections plan COLUMNAR; filters/limit/agg stay on the row lanes") {
    val dir = writeIndex()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def scanExec(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get
      // pure projection (arrays included) → vectorized ColumnarBatch lane
      assert(scanExec(v2(s"$dir/cells").select("vec_b", "vb")).supportsColumnar,
        "a pure projection must take the vectorized lane")
      // partition pruning composes with the vectorized lane (pruning
      // selects files; decode is unchanged)
      assert(scanExec(v2(s"$dir/cells").where(col("cell") === 0)
          .select("vec_b")).supportsColumnar,
        "partition-pruned pure projections stay vectorized")
      // a pushed DATA filter needs parquet's record-level assembly → row lane
      assert(!scanExec(v2(s"$dir/cells").where(col("vec_b") > 10L))
        .supportsColumnar, "claimed data filters must use the row lane")
      // the limit wrapper is row-based → row lane
      assert(!scanExec(v2(s"$dir/cells").select("vec_b").limit(5))
        .supportsColumnar, "limit pushdown must use the row lane")
      // a pushed footer aggregate decodes nothing → its own lane
      assert(!scanExec(v2(s"$dir/cells").groupBy().agg(count(lit(1)).as("n")))
        .supportsColumnar, "footer aggregates must not claim columnar")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("vectorized lane: null/empty arrays, null elements, strings and booleans decode exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vec").toString + "/t"
    val crafted = Seq(
        (1L, "alpha", true, 7, 1.5f, Seq[Option[Double]](Some(1.5), None, Some(2.5))),
        (2L, null.asInstanceOf[String], false, 8, 2.5f, Seq.empty[Option[Double]]))
      .toDF("id", "s", "b", "i", "f", "xs")
      .unionByName(
        Seq((3L, "gamma", true, 9, 3.5f)).toDF("id", "s", "b", "i", "f")
          .withColumn("xs", lit(null).cast("array<double>")))
    crafted.repartition(1).write.parquet(dir)
    val got = v2(dir).select("id", "s", "b", "i", "f", "xs")
    val ref = spark.read.parquet(dir).select("id", "s", "b", "i", "f", "xs")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val scan = got.queryExecution.executedPlan.collectFirst {
        case b: BatchScanExec => b
      }.get
      assert(scan.supportsColumnar, "this parity test must exercise the vectorized lane")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
    assert(got.count() == 3)
    assert(got.exceptAll(ref).count() == 0 && ref.exceptAll(got).count() == 0,
      "vectorized decode must be row-identical to spark.read.parquet on degenerate arrays")
  }

  test("evolved file sets: a column absent from a file reads as null; filters on it stay exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evo").toString + "/t"
    Seq((1L, 10L), (2L, 20L)).toDF("id", "x").repartition(1).write.parquet(dir)
    Seq(3L, 4L).toDF("id").repartition(1).write.mode("append").parquet(dir)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", org.apache.spark.sql.types.LongType)
      .add("x", org.apache.spark.sql.types.LongType)
    def evo = spark.read.format("graft-index").schema(schema).load(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
      .select("id", "x")
    // full-read parity with Spark's merged-schema view: absent x → null
    assert(evo.count() == 4)
    assert(evo.exceptAll(merged).count() == 0 &&
      merged.exceptAll(evo).count() == 0)
    // pushed x > 5 is a per-file CONSTANT FALSE where x is absent: the
    // claimed filter must stay exact, not throw on the x-less footer
    assert(evo.where(col("x") > 5L).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // pushed x IS NULL keeps exactly the x-less file's rows
    assert(evo.where(col("x").isNull).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
    assert(evo.where(col("x").isNotNull).count() == 2)
    // projecting ONLY the absent column still yields the right row count
    assert(evo.select("x").count() == 4)
    assert(evo.select("x").where(col("x").isNull).count() == 2)
  }

  test("__HIVE_DEFAULT_PARTITION__ is a NULL partition value, not a planning-time crash") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_nullpart").toString + "/t"
    Seq((1L, 5), (2L, 5), (7L, 9)).toDF("v", "cell")
      .write.partitionBy("cell").parquet(dir)
    // the directory Hive/Spark render for a null partition value
    Seq(3L).toDF("v").repartition(1)
      .write.parquet(s"$dir/cell=__HIVE_DEFAULT_PARTITION__")
    val t = v2(dir)
    val ref = spark.read.parquet(dir).select(t.columns.map(col): _*)
    assert(t.count() == 4)
    assert(t.exceptAll(ref).count() == 0 && ref.exceptAll(t).count() == 0)
    // IsNull / IsNotNull / EqualNullSafe are CLAIMED partition filters:
    // the pruner must match the null directory exactly
    assert(t.where(col("cell").isNull).select("v").collect()
      .map(_.getLong(0)).toSeq == Seq(3L))
    assert(t.where(col("cell").isNotNull).count() == 3)
    assert(t.where(col("cell") <=> lit(null)).count() == 1)
    assert(t.where(col("cell") === 5).count() == 2)
    // a null comparand (legal SQL) is REJECTED by partPushable and
    // evaluated Spark-side: null never matches, no pruner NPE
    assert(t.where(col("cell").isin(5, null)).count() == 2)
    assert(t.where(col("cell") > 5).count() == 1, "null partition never matches a relational filter")
  }

  test("catalog face: indexes resolve by NAME — listTables, loadTable parity, read-only refusals") {
    val root = java.nio.file.Files.createTempDirectory("graft_cat").toString
    Similarity.writeIvfIndex(Tables.embeddings(spark, sf0001),
      "vec_id", "embedding", 25, s"$root/ivf_a")
    spark.conf.set("spark.sql.catalog.graft_cat_t",
      classOf[graft.sources.GraftIndexCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_cat_t.root", root)
    // SHOW TABLES sees the index's sub-tables
    val listed = spark.sql("SHOW TABLES IN graft_cat_t.ivf_a")
      .select("tableName").collect().map(_.getString(0)).sorted
    assert(listed.toSeq == Seq("cells", "cents"), s"got ${listed.toSeq}")
    // loadTable: full row/schema parity with the path route
    val byName = spark.table("graft_cat_t.ivf_a.cells")
    val byPath = spark.read.format("graft-index").load(s"$root/ivf_a/cells")
      .select(byName.columns.map(col): _*)
    assert(byName.schema == byPath.schema)
    assert(byName.exceptAll(byPath).count() == 0 &&
      byPath.exceptAll(byName).count() == 0)
    // the same pushdown surfaces ride the catalog route: partition
    // pruning visible as a claimed filter with exact rows
    val one = spark.table("graft_cat_t.ivf_a.cells").where(col("cell") === 0)
    assert(one.count() ==
      spark.read.parquet(s"$root/ivf_a/cells").where(col("cell") === 0).count())
    // mutations refused: index lifecycle belongs to the writers
    val e = intercept[UnsupportedOperationException] {
      spark.sql("CREATE TABLE graft_cat_t.ivf_a.extra (x BIGINT) USING `graft-index`")
    }
    assert(e.getMessage.contains("read-only"))
    // a missing table surfaces as Spark's standard not-found analysis
    // error (the catalog's NoSuchTableException, analyzer-wrapped)
    val missing = intercept[org.apache.spark.sql.AnalysisException] {
      spark.table("graft_cat_t.ivf_a.nope").collect()
    }
    assert(missing.getMessage.toLowerCase.contains("not"), missing.getMessage)
    // catalog-routed probe ≡ path-routed probe, row for row
    val q = Tables.embeddings(spark, sf0001).where(col("vec_id") % 50 === 0)
    val viaCat = Similarity.probeIvfIndexCatalog("graft_cat_t.ivf_a",
      q, "vec_id", "embedding", 5)
    val viaPath = Similarity.probeIvfIndex(s"$root/ivf_a", q,
      "vec_id", "embedding", 5)
    assert(viaCat.count() > 0)
    assert(viaCat.exceptAll(viaPath).count() == 0 &&
      viaPath.exceptAll(viaCat).count() == 0)
  }

  test("executor readers carry the DRIVER's Hadoop conf across serialization") {
    val marker = "graft.test.conf.marker"
    spark.sparkContext.hadoopConfiguration.set(marker, "42")
    try {
      val dir = writeIndex()
      val tbl = new graft.sources.GraftIndexTable(s"$dir/cells",
        spark.read.parquet(s"$dir/cells").schema)
      val factory = tbl
        .newScanBuilder(org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
        .build().toBatch.createReaderFactory()
      def roundtrip[T](x: T): T = {
        val bos = new java.io.ByteArrayOutputStream()
        val oos = new java.io.ObjectOutputStream(bos)
        oos.writeObject(x); oos.close()
        new java.io.ObjectInputStream(
          new java.io.ByteArrayInputStream(bos.toByteArray))
          .readObject().asInstanceOf[T]
      }
      // the factory ships to executors by java serialization: the conf
      // must survive the trip with the driver's settings intact (a bare
      // `new Configuration()` on the executor would lose fs credentials
      // and spark.hadoop.* overrides on any non-local deployment)
      val shipped = roundtrip(factory.asInstanceOf[graft.sources.GraftIndexReaderFactory])
      assert(shipped.conf.value.get(marker) == "42",
        "driver Hadoop conf must reach the executor-side reader factory")
    } finally spark.sparkContext.hadoopConfiguration.unset(marker)
  }
}
