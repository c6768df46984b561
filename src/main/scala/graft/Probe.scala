package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch A/B harness (not part of the driver contract): point it at
  * whatever needs measuring this round; always compare min-of-warm
  * within ONE session (cross-run numbers carry ±15-30% machine noise).
  */
object Probe {
  /** Counts jobs and sums task time so a phase's cost splits into
    * "how many scheduler round-trips" vs "how much task compute". */
  private final class JobTally extends org.apache.spark.scheduler.SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
    }
    def snap: (Long, Long, Long) = (jobs.get, tasks.get, taskMs.get)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().withExtensions(new graft.plans.GraftExtensions)
      .master("local[32]").config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tally = new JobTally
    spark.sparkContext.addSparkListener(tally)
    def phase[T](tag: String)(f: => T): T = {
      System.gc()
      val j0 = tally.snap; val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // listener drain
      val j1 = tally.snap
      println(f"[probe] $tag%-28s ${dt}%7.3f s  jobs=${j1._1 - j0._1}%3d tasks=${j1._2 - j0._2}%5d taskMs=${j1._3 - j0._3}%7d")
      r
    }
    // r13: shingle edge-list plan, old shape (multiset generator +
    // corpus-wide distinct) vs current (distinct-in-generator)
    if (args.headOption.contains("shingleplan")) {
      graft.functions.GraftFunctions.register(spark)
      val docs = Tables.documents(spark, d)
        .select(col("doc_id"), col("text").as("__t"))
      println("========== shingle_edges_before (generator + corpus-wide distinct) ==========")
      docs.selectExpr("doc_id",
          s"${graft.functions.GraftFunctions.ShinglesName}(__t) AS shingle")
        .distinct().explain("formatted")
      println("========== shingle_edges_after (distinct inside the generator) ==========")
      graft.operators.Dedup.shingleEdges(
        Tables.documents(spark, d), "doc_id", "text").explain("formatted")
      spark.stop(); return
    }
    // r13: executed plan of dupShingleCoverage (ReusedExchange check)
    if (args.headOption.contains("covplan")) {
      val df = graft.operators.Dedup.dupShingleCoverage(
        Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text", 2)
      df.collect()
      println(df.queryExecution.executedPlan.toString)
      spark.stop(); return
    }
    // r13: dump the graph-ANN edge-build plan, old shape (distinct →
    // row_number) vs current (dense_rank → distinct), for plans/r13
    if (args.headOption.contains("edgeplan")) {
      import graft.operators.Similarity
      val emb = Tables.embeddings(spark, d)
      graft.functions.GraftFunctions.register(spark)
      val cents = emb.where(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"),
          graft.functions.VectorOps.normSq(col("embedding")).as("cn"))
      val base = emb.select(col("vec_id").as("vid"), col("embedding").as("vec"),
        graft.functions.VectorOps.normSq(col("embedding")).as("nsq"))
      val ranked2 = Similarity.cellAssignment(base, cents, 2)
      val aSide = ranked2.select(col("vid").as("src"), col("vec").as("sv"),
        col("nsq").as("sn"), col("cell"))
      val bSide = ranked2.select(col("vid").as("dst"), col("vec").as("dv"),
        col("nsq").as("dn"), col("cell"))
      val ew = Window.partitionBy("src").orderBy(col("ecos").desc, col("dst").asc)
      val oldShape = aSide.join(bSide, Seq("cell"))
        .where(col("src") =!= col("dst"))
        .select(col("src"), col("dst"),
          graft.functions.VectorOps.cosine(col("sv"), col("dv"), col("sn"), col("dn")).as("ecos"))
        .distinct()
        .withColumn("ern", row_number().over(ew))
        .where(col("ern") <= 8)
        .select("src", "dst")
      println("========== edge_build_before (distinct -> row_number) ==========")
      oldShape.explain("formatted")
      println("========== edge_build_after (dense_rank -> distinct) ==========")
      Similarity.edgeList(ranked2, 8).explain("formatted")
      spark.stop(); return
    }
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_probe_hnsw"
    // what ext_ann_hnsw_persist does, split into phases, 3 reps
    for (rep <- 1 to 3) {
      println(s"== rep $rep ==")
      val emb = Tables.embeddings(spark, d)
      phase("writeGraphIndex")(graft.operators.Similarity.writeGraphIndex(
        emb, "vec_id", "embedding", 25, 8, tmp))
      val q = emb.where(col("vec_id") % 50 === 0)
      phase("probeGraphIndex.count")(graft.operators.Similarity.probeGraphIndex(
        tmp, q, "vec_id", "embedding", 5, 8, 8, 3).count())
    }
    spark.stop()
  }
}
