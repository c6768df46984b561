package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic micro-bench of the graft-index read lanes vs
  * spark.read.parquet: filtered/full scans on the partitioned cells
  * table and the flat vecs table, columnar vs forced row lane, task
  * accounting (count + duration + deserialize time — the round-11
  * conf-broadcast fix came out of the deser column), and the direct
  * in-process per-file reader cost. Not part of the driver contract;
  * run ad hoc: `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.LaneBench"`.
  */
object LaneBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("lane_bench").toString
    graft.operators.Similarity.writeIvfIndex(
      Tables.embeddings(spark, sfDir), "vec_id", "embedding", 25, dir)
    val raw = spark.read.parquet(s"$dir/cells")
    val mid = raw.select(avg(col("vec_b"))).collect().head.getDouble(0).toLong
    def timed(label: String)(f: => Long): Unit = {
      f // warm
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[lane] $label%-28s min=${runs.min}%.3f med=${runs.sorted.apply(2)}%.3f")
    }
    def v2 = spark.read.format("graft-index").load(s"$dir/cells")
    def rl = spark.read.format("graft-index").option("rowlane", "true")
      .load(s"$dir/cells")
    // filtered scans (projection + pushed range filter)
    timed("parquet filter+proj") {
      raw.where(col("vec_b") > mid).select("vec_b", "vb", "nb").count()
    }
    timed("v2 COLUMNAR filter+proj") {
      v2.where(col("vec_b") > mid).select("vec_b", "vb", "nb").count()
    }
    timed("v2 rowlane filter+proj") {
      rl.where(col("vec_b") > mid).select("vec_b", "vb", "nb").count()
    }
    // materializing collect (decode-bound)
    timed("parquet filter collect") {
      raw.where(col("vec_b") > mid).select("vec_b", "nb").collect().length.toLong
    }
    timed("v2 COLUMNAR filter collect") {
      v2.where(col("vec_b") > mid).select("vec_b", "nb").collect().length.toLong
    }
    timed("v2 rowlane filter collect") {
      rl.where(col("vec_b") > mid).select("vec_b", "nb").collect().length.toLong
    }
    // selective equality (row-group pruning visible)
    timed("parquet eq") { raw.where(col("vec_b") === mid).count() }
    timed("v2 COLUMNAR eq") { v2.where(col("vec_b") === mid).count() }
    // compound OR (round-11 claimed shape): both tails of the id range
    val (lo, hi) = (mid / 2, mid + mid / 2)
    def orPred(c: String => org.apache.spark.sql.Column) =
      c("vec_b") < lo || c("vec_b") > hi
    timed("parquet OR filter") {
      raw.where(orPred(col)).select("vec_b", "nb").count()
    }
    timed("v2 COLUMNAR OR filter") {
      v2.where(orPred(col)).select("vec_b", "nb").count()
    }
    timed("v2 rowlane OR filter") {
      rl.where(orPred(col)).select("vec_b", "nb").count()
    }
    // full-scan sanity (round-10 baseline shape); the unfiltered decode
    // delegates to Spark's own vectorized reader (round-12) — graftlane
    // pins the in-house decoder twin for the before/after
    def gl = spark.read.format("graft-index").option("graftlane", "true")
      .load(s"$dir/cells")
    timed("parquet full proj") { raw.select("vec_b", "vb").count() }
    timed("v2 DELEGATED full proj") { v2.select("vec_b", "vb").count() }
    timed("v2 graftlane full proj") { gl.select("vec_b", "vb").count() }
    timed("parquet full collect") {
      raw.select("vec_b", "vb", "nb").collect().length.toLong
    }
    timed("v2 DELEGATED full collect") {
      v2.select("vec_b", "vb", "nb").collect().length.toLong
    }
    timed("v2 graftlane full collect") {
      gl.select("vec_b", "vb", "nb").collect().length.toLong
    }
    // planning vs execution split: REUSED DataFrame = execution only
    val v2Reused = v2.where(col("vec_b") > mid).select("vec_b", "vb", "nb")
    val pqReused = raw.where(col("vec_b") > mid).select("vec_b", "vb", "nb")
    timed("v2 REUSED-DF filter") { v2Reused.count() }
    timed("parquet REUSED-DF filter") { pqReused.count() }
    // task accounting: where does the v2 gap live?
    val tally = new org.apache.spark.scheduler.SparkListener {
      val n = new java.util.concurrent.atomic.AtomicLong
      val ms = new java.util.concurrent.atomic.AtomicLong
      val deser = new java.util.concurrent.atomic.AtomicLong
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        n.incrementAndGet(); ms.addAndGet(t.taskInfo.duration)
        if (t.taskMetrics != null)
          deser.addAndGet(t.taskMetrics.executorDeserializeTime)
      }
    }
    spark.sparkContext.addSparkListener(tally)
    def acct(label: String)(f: => Long): Unit = {
      tally.n.set(0); tally.ms.set(0); tally.deser.set(0)
      f
      Thread.sleep(400) // listener delivery is async
      println(s"[lane] $label tasks=${tally.n.get} taskMs=${tally.ms.get} deserMs=${tally.deser.get}")
    }
    acct("v2 tasks") { v2Reused.count() }
    acct("parquet tasks") { pqReused.count() }
    // flat (unpartitioned) table: graph-index vecs, decode-dominated
    val gdir = java.nio.file.Files.createTempDirectory("lane_g").toString
    graft.operators.Similarity.writeGraphIndex(
      Tables.embeddings(spark, sfDir), "vec_id", "embedding", 25, 8, gdir)
    val vecsRaw = spark.read.parquet(s"$gdir/vecs")
    def vecsV2 = spark.read.format("graft-index").load(s"$gdir/vecs")
    val vmid = vecsRaw.select(avg(col("vid"))).collect().head.getDouble(0).toLong
    timed("parquet vecs filter") {
      vecsRaw.where(col("vid") > vmid).select("vid", "vec").count()
    }
    timed("v2 vecs filter") {
      vecsV2.where(col("vid") > vmid).select("vid", "vec").count()
    }
    // in-process reader cost, no Spark job: one tiny cell file
    val hconf = spark.sparkContext.hadoopConfiguration
    val cellFiles = graft.sources.GraftIndexTable.listFiles(s"$dir/cells")
      .map(_._1).sorted
    val schema = raw.schema
    val dataF = schema.fields.filter(f => f.name != "cell")
    def readOne(f: String): Long = {
      val r = new graft.sources.GraftIndexColumnarReader(
        Seq((f, 0L, graft.sources.GraftIndexRange.Whole, Array[Any](null))),
        org.apache.spark.sql.types.StructType(dataF), Array(false, false, false),
        dataF, Array.empty, schema, None, hconf)
      var rows = 0L
      while (r.next()) rows += r.get().numRows()
      r.close(); rows
    }
    readOne(cellFiles.head)
    val t0 = System.nanoTime()
    cellFiles.take(40).foreach(readOne)
    println(f"[lane] direct 40-file columnar read ${(System.nanoTime() - t0) / 1e9}%.3f s (${(System.nanoTime() - t0) / 40e6}%.2f ms/file)")
    // cost breakdown: footer open alone, then open + one row group bind
    val t1 = System.nanoTime()
    cellFiles.take(40).foreach { f =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f), hconf))
      r.getRecordCount; r.close()
    }
    println(f"[lane] direct 40-file footer open ${(System.nanoTime() - t1) / 40e6}%.2f ms/file")
    val t2 = System.nanoTime()
    cellFiles.take(40).foreach { f =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f), hconf))
      val pages = r.readNextRowGroup(); pages.getRowCount; r.close()
    }
    println(f"[lane] direct 40-file open+rowgroup ${(System.nanoTime() - t2) / 40e6}%.2f ms/file")
    // BIG-FILE decode — the 100 TB-relevant shape (row groups in the
    // tens of MB, not index-cell KBs): bulk page decode (delegated
    // lane) vs the in-house per-value ColumnReader twin. sum() is not
    // a pushable aggregate on either engine, so every shape below
    // decodes all four columns end-to-end.
    val bdir = java.nio.file.Files.createTempDirectory("lane_big").toString + "/t"
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "n_chars")
      .coalesce(2).write.parquet(bdir)
    val bigRaw = spark.read.parquet(bdir)
    def bigDecode(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("doc_id")), sum(length(col("text"))),
        sum(col("n_chars"))).collect().length.toLong
    timed("parquet BIG decode") { bigDecode(bigRaw) }
    timed("v2 DELEGATED BIG decode") {
      bigDecode(spark.read.format("graft-index").load(bdir))
    }
    timed("v2 graftlane BIG decode") {
      bigDecode(spark.read.format("graft-index").option("graftlane", "true")
        .load(bdir))
    }
    // ONE-FILE slicing (round-12): a single big file used to plan ONE
    // whole-file task through the connector; with range splits both
    // engines tile it at maxPartitionBytes. Cap at 4 MB so local[32]
    // actually fans out on the ~tens-of-MB fixture file.
    val b1 = java.nio.file.Files.createTempDirectory("lane_big1").toString + "/t"
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .coalesce(1).write.parquet(b1)
    def l1Decode(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("l_orderkey")), sum(col("l_quantity")),
        sum(col("l_extendedprice")), sum(length(col("l_returnflag"))))
        .collect().length.toLong
    spark.conf.set("spark.sql.files.maxPartitionBytes", (1L * 1024 * 1024).toString)
    try {
      def nParts(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.executedPlan.collectFirst {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
        }.map(_.inputRDD.getNumPartitions).getOrElse(-1)
      println(s"[lane] v2 1-file sliced tasks=" +
        nParts(spark.read.format("graft-index").load(b1)
          .select("l_orderkey", "l_quantity")))
      timed("parquet 1-file sliced") { l1Decode(spark.read.parquet(b1)) }
      timed("v2 DELEGATED 1-file sliced") {
        l1Decode(spark.read.format("graft-index").load(b1))
      }
    } finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
    // the pre-feature shape for contrast: whole-file task (cap above file size)
    timed("v2 1-file UNSLICED") {
      spark.conf.set("spark.sql.files.maxPartitionBytes", (512L * 1024 * 1024).toString)
      try l1Decode(spark.read.format("graft-index").load(b1))
      finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
    }
    // PAGE-level pruning (round-13): a narrow range probe over a SORTED
    // column in one big row group — group-level stats keep the group,
    // the column index sheds everything but the matching pages. Small
    // pages so the index has granularity to work with; the wide payload
    // column is what pruning saves decoding.
    val pdir = java.nio.file.Files.createTempDirectory("lane_page").toString + "/t"
    spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("event_id", "user_id",
        "concat(event_type, '-', repeat(props, 2)) AS payload")
      .orderBy("event_id").coalesce(1)
      .write.option("parquet.page.row.count.limit", "5000").parquet(pdir)
    val pRaw = spark.read.parquet(pdir)
    val pMax = pRaw.agg(max("event_id")).collect().head.getLong(0)
    val (pLo, pHi) = (pMax / 2, pMax / 2 + pMax / 100)
    def pageProbe(df: org.apache.spark.sql.DataFrame): Long =
      df.where(col("event_id") >= pLo && col("event_id") < pHi)
        .agg(sum(col("user_id")), sum(length(col("payload"))))
        .collect().length.toLong
    timed("parquet sorted-range probe") { pageProbe(pRaw) }
    timed("v2 sorted-range probe") {
      pageProbe(spark.read.format("graft-index").load(pdir))
    }
    spark.stop()
  }
}
