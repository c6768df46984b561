package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-LAYOUT operators: multi-dimensional clustering keys for scan
  * pruning. A 100 TB table is read far more often than written; sorting
  * its files by a Z-VALUE (Morton interleave) of the two hottest filter
  * columns gives BOTH columns bounded min/max ranges per file, so
  * footer-stats pruning works for either predicate — where a plain sort
  * serves only its leading column. (The same recipe behind Delta/Iceberg
  * Z-ORDER table maintenance, expressed as an ordinary deterministic
  * column + repartitionByRange write.)
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * integer columns: bit i of `a` lands at position 2i, bit i of `b`
    * at 2i+1. Pure integer expression — codegen'd, shuffle-free,
    * engine-reproducible (the oracle repeats the fold with DuckDB's
    * bit operators).
    *
    * The defining locality property (spec-pinned): fixing the z-value's
    * bits above 2k confines EACH dimension to one aligned 2^k-value
    * window — z-range blocks are axis-aligned rectangles, never stripes.
    */
  def zValue(aCol: String, bCol: String, bits: Int = 16): Column = expr(
    s"""aggregate(sequence(0, ${bits - 1}), CAST(0 AS BIGINT),
       (acc, i) -> acc + shiftleft(shiftright($aCol, i) & 1, 2 * i)
                       + shiftleft(shiftright($bCol, i) & 1, 2 * i + 1))""")

  /** HILBERT index of two non-negative integer columns — the
    * locality-better alternative to the Morton interleave: consecutive
    * Hilbert values are ALWAYS grid neighbors (Morton jumps across the
    * plane at power-of-two boundaries), so equal-width value blocks
    * cover tighter rectangles and footer-stats pruning skips more
    * files. Standard quadrant-rotation recurrence, unrolled to `bits`
    * fixed steps of pure integer CASE arithmetic on appended columns —
    * codegen'd, shuffle-free, and repeated verbatim by the oracle.
    * Each step strips the consumed bit BEFORE the rotation, so every
    * intermediate stays in [0, s) and no engine-specific negative-
    * number bit semantics is ever exercised.
    *
    * Returns the input frame plus `hv`. The defining property
    * (spec-pinned on the full 8×8 grid): hv is a bijection onto
    * [0, 4^bits) and consecutive hv values are Manhattan-distance-1
    * neighbors.
    */
  def withHilbert(df: DataFrame, aCol: String, bCol: String,
      bits: Int = 16): DataFrame = {
    val n = 1L << bits
    var cur = df
      .withColumn("__hx", expr(s"$aCol & ${n - 1}"))
      .withColumn("__hy", expr(s"$bCol & ${n - 1}"))
      .withColumn("__hd", lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      val rx = s"(__hx & $s) > 0"
      val ry = s"(__hy & $s) > 0"
      cur = cur
        .withColumn("__hd", expr(
          s"""__hd + $s * $s * (CASE WHEN NOT ($rx) AND NOT ($ry) THEN 0
                                     WHEN NOT ($rx) THEN 1
                                     WHEN NOT ($ry) THEN 3
                                     ELSE 2 END)"""))
        .withColumn("__nx", expr(
          s"""CASE WHEN NOT ($ry)
                   THEN (CASE WHEN $rx THEN $s - 1 - (__hy & ${s - 1})
                              ELSE __hy & ${s - 1} END)
                   ELSE __hx & ${s - 1} END"""))
        .withColumn("__ny", expr(
          s"""CASE WHEN NOT ($ry)
                   THEN (CASE WHEN $rx THEN $s - 1 - (__hx & ${s - 1})
                              ELSE __hx & ${s - 1} END)
                   ELSE __hy & ${s - 1} END"""))
        .withColumn("__hx", col("__nx")).withColumn("__hy", col("__ny"))
        .drop("__nx", "__ny")
    }
    cur.withColumn("hv", col("__hd")).drop("__hx", "__hy", "__hd")
  }

  /** Per-Hilbert-bucket layout audit — same shape as [[zOrderAudit]]
    * so the two curves' per-file rectangles compare row for row.
    */
  def hilbertAudit(df: DataFrame, aCol: String, bCol: String,
      bits: Int = 16, bucketBits: Int = 10): DataFrame =
    withHilbert(df, aCol, bCol, bits)
      .withColumn("hbucket", expr(s"hv div ${1L << bucketBits}"))
      .groupBy("hbucket")
      .agg(count(lit(1)).as("n_rows"),
        min(aCol).as("a_min"), max(aCol).as("a_max"),
        min(bCol).as("b_min"), max(bCol).as("b_max"))

  /** Per-z-bucket layout audit: bucket = z div 2^`bucketBits`, with both
    * dimensions' spans per bucket — the numbers a table-maintenance job
    * reports to show the clustering is working (each file/bucket covers
    * a small rectangle of the key space, so scans with a predicate on
    * EITHER key prune most buckets).
    */
  def zOrderAudit(df: DataFrame, aCol: String, bCol: String,
      bits: Int = 16, bucketBits: Int = 10): DataFrame =
    df.withColumn("__z", zValue(aCol, bCol, bits))
      .withColumn("zbucket", expr(s"__z div ${1L << bucketBits}"))
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n_rows"),
        min(aCol).as("a_min"), max(aCol).as("a_max"),
        min(bCol).as("b_min"), max(bCol).as("b_max"))

  /** Zone-map MANIFEST + skip audit — footer-stats pruning made
    * auditable: rows are assigned to "files" under TWO layouts in one
    * scan (a grouping-sets aggregate): the Z-ORDER layout (files =
    * aligned z-value blocks of width `zDiv`, see [[zValue]]) and the
    * NATURAL ingest layout (files = consecutive `natDiv`-wide windows of
    * the time dimension — what a daily append job produces). Each output
    * row is one file's footer stats (row count, min/max of both dims)
    * plus `skippable`: whether the rectangle predicate
    * (a BETWEEN aLo AND aHi, b within the first `bSpan` values of the
    * b range) can prune the file without reading it. The natural layout
    * prunes on b only; z-order bounds BOTH dims per file — the reason a
    * 100 TB table pays for the z-order rewrite.
    *
    * Scale shape: ONE corpus scan feeding one grouping-sets aggregate
    * (map-side combinable in both sets) plus a broadcast 1-row min for
    * the data-relative b window. No windows, no global sort.
    */
  def zoneManifest(df: DataFrame, aCol: String, bCol: String, bits: Int,
      zDiv: Long, natDiv: Long, aLo: Long, aHi: Long,
      bSpan: Long): DataFrame = {
    val b0 = df.agg(min(col(bCol)).cast("long").as("__b0"))
    val base = df
      .withColumn("__z", zValue(aCol, bCol, bits))
      .withColumn("__zf", expr(s"__z div ${zDiv}L"))
      .withColumn("__nf", expr(s"$bCol div ${natDiv}L"))
    base
      .groupingSets(Seq(Seq(col("__zf")), Seq(col("__nf"))),
        col("__zf"), col("__nf"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(aCol)).as("a_min"), max(col(aCol)).as("a_max"),
        min(col(bCol)).as("b_min"), max(col(bCol)).as("b_max"),
        grouping(col("__nf")).cast("int").as("__gz"))
      .crossJoin(broadcast(b0))
      .select(
        when(col("__gz") === 1, lit("zorder")).otherwise(lit("natural"))
          .as("layout"),
        coalesce(col("__zf"), col("__nf")).as("file_id"),
        col("n_rows"), col("a_min"), col("a_max"),
        col("b_min"), col("b_max"),
        (col("a_max") < aLo || col("a_min") > aHi ||
          col("b_min") > col("__b0") + lit(bSpan - 1) ||
          col("b_max") < col("__b0")).as("skippable"))
  }

  /** Export shard-balance audit: content-hashed shard assignment
    * (shard = polyhash(content) mod numShards — content-addressed, so an
    * exact duplicate always lands in the same output file regardless of
    * where it was crawled) with per-shard document count, character
    * mass, and the balance ratio against a perfectly even split. The
    * numbers a sharded-export job reports before committing a manifest:
    * a ratio far from 1.0 means hot output files (stragglers on write,
    * skewed downstream readers).
    *
    * Scale shape: ONE map-side-combinable aggregate over the corpus —
    * the grand totals come from an unpartitioned window over the
    * numShards result rows (16 rows through a SinglePartition exchange),
    * NOT from a second aggregate branch, which would re-scan the corpus
    * (caught by the ScaleSpec plan audit: a 1-row agg over an unpersisted
    * frame recomputes its whole subtree). The polyhash is the codegen'd
    * character fold — no vocabulary, no shuffle before the aggregate.
    */
  /** Compaction (OPTIMIZE) planner: pack partition cells into
    * target-sized output files, PRESERVING cell order. A 100 TB table
    * accretes small files per ingest batch; the maintenance job that
    * fixes it must merge ADJACENT cells — a hash re-shard (see
    * [[shardAudit]]) would balance sizes but destroy the clustering that
    * makes footer-stats pruning work. Next-fit over the cell sequence
    * does both: bin = (running mass BEFORE the cell) div target, so a
    * cell opens a new bin exactly when the mass so far has crossed a
    * bin boundary, and every bin covers a contiguous cell range.
    *
    * Scale shape: the corpus is touched ONCE by a map-side-combinable
    * (cellCols) aggregate; everything after runs on the CELL list
    * (thousands of rows for a 100 TB table, not billions), so the
    * single-partition ordered cumsum window is a deliberate non-cost —
    * the same shape every table-maintenance planner (Delta OPTIMIZE,
    * Iceberg rewrite_data_files) uses: plan small, execute big.
    *
    * Output per bin: the contiguous cell span [cells_from, cells_to] in
    * cell order, cell/doc counts, packed mass, and fill = mass/target
    * (last bin underfills; a cell larger than target overfills its own
    * bin — next-fit never splits a cell, matching file-granularity
    * rewrites).
    */
  def compactionPlan(docs: DataFrame, cellCols: Seq[String],
      massCol: Column, targetMass: Long): DataFrame = {
    require(targetMass > 0, s"targetMass must be positive, got $targetMass")
    val cellOrder = cellCols.map(col)
    val seqW = Window.orderBy(cellOrder: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // bin id via integer DIV, not double division — cumulative mass on a
    // 100 TB table passes 2^53 where doubles drop low bits
    val cells = docs
      .groupBy(cellCols.map(col): _*)
      .agg(count(lit(1)).as("__docs"), sum(massCol).as("__mass"))
      .withColumn("__cum", sum(col("__mass")).over(seqW))
      .withColumn("__seq", row_number().over(Window.orderBy(cellOrder: _*)))
      .withColumn("bin", expr(s"(__cum - __mass) div ${targetMass}L"))
      .withColumn("__cell", concat_ws("/", cellOrder: _*))
    cells.groupBy("bin")
      .agg(min_by(col("__cell"), col("__seq")).as("cells_from"),
        max_by(col("__cell"), col("__seq")).as("cells_to"),
        count(lit(1)).as("n_cells"), sum(col("__docs")).as("n_docs"),
        sum(col("__mass")).as("mass"),
        round(sum(col("__mass")) / targetMass, 6).as("fill"))
  }

  def shardAudit(docs: DataFrame, contentCol: String, massCol: String,
      numShards: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val w = Window.partitionBy()
    // a zero TOTAL mass (every document empty) leaves the mass ratio
    // undefined — report 0.0 instead of tripping ANSI divide-by-zero
    // (found by the property suite on an all-empty corpus)
    val totalMass = sum(col("mass")).over(w)
    docs
      .withColumn("shard", Dedup.polyHash(col(contentCol)) % numShards)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col(massCol)).as("mass"))
      .select(col("shard"), col("n_docs"), col("mass"),
        round(col("n_docs") * numShards / sum("n_docs").over(w), 6).as("doc_balance"),
        round(when(totalMass === 0L, lit(0.0d))
          .otherwise(col("mass") * numShards / totalMass), 6).as("mass_balance"))
  }

  /** Distributed parquet FOOTER harvest: the physical row-group
    * statistics (min/max/row count per column chunk) that footer-stats
    * pruning actually reads at scan time. [[zoneManifest]] PREDICTS
    * zones from the data; this reads the zones a writer PRODUCED — the
    * job every stats-table builder (Delta's stats collection, Iceberg's
    * manifests) runs after a layout rewrite, and the ground truth a
    * clustering claim must be audited against.
    *
    * Scale shape: one footer open per file, executed on the EXECUTORS
    * over a file-list dataset — a 100 TB table has millions of files
    * and a driver loop over them is the classic metadata bottleneck.
    * (The driver-side directory LISTING here is fine at any scale that
    * fits a filesystem `listFiles` call; past that, the file list comes
    * from the table format's manifest and feeds the same mapPartitions.)
    * Emits one row per (file, row group): `file`, `rg` ordinal, `rows`,
    * and the chunk's `zmin`/`zmax` for the given INT64 column.
    */
  def harvestZones(spark: org.apache.spark.sql.SparkSession, dir: String,
      column: String): DataFrame =
    harvestZonesCols(spark, dir, Seq(column))
      .drop("column")

  /** Multi-column form of [[harvestZones]]: ONE footer open per file
    * serves every requested INT64 column — one row per
    * (file, row group, column). The multi-dimensional audit path: a
    * Z-/Hilbert-clustered layout's defining claim is that EVERY curve
    * dimension has bounded per-file ranges, which takes all the
    * columns' chunk stats from the same footer.
    */
  def harvestZonesCols(spark: org.apache.spark.sql.SparkSession,
      dir: String, columns: Seq[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(conf)
    val it = fs.listFiles(root, true)
    val paths = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next().getPath)
      .filter(p => p.getName.endsWith(".parquet") &&
        !p.getName.startsWith("_") && !p.getName.startsWith("."))
      .map(_.toString).toSeq.sorted
    val serConf = new org.apache.spark.SerializableWritable(conf)
    val cols = columns
    spark.createDataset(paths)
      .repartition(math.min(math.max(paths.size, 1), 32))
      .mapPartitions { ps =>
        ps.flatMap { p =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(p), serConf.value)
          val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            rdr.getFooter.getBlocks.asScala.toList.zipWithIndex.flatMap {
              case (b, i) =>
                cols.map { column =>
                  val chunk = b.getColumns.asScala
                    .find(_.getPath.toDotString == column)
                    .getOrElse(sys.error(
                      s"column $column has no chunk in $p row group $i"))
                  val st = chunk.getStatistics
                  (p, i, b.getRowCount, column,
                    st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
                    st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
                }
            }
          } finally rdr.close()
        }
      }
      .toDF("file", "rg", "rows", "column", "zmin", "zmax")
  }
}
