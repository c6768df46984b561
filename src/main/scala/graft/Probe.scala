package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B harness (not part of the driver contract): point it at
  * whatever needs measuring this round; always compare min-of-warm
  * within ONE session (cross-run numbers carry ±15-30% machine noise).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().withExtensions(new graft.plans.GraftExtensions)
      .master("local[32]").config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").config("spark.sql.session.timeZone","UTC")
      // dormant compat for TIMESTAMP(NANOS) fixture vintages (see Verify)
      .config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // round-10 q: does XxHash-mode LSH reach EXACT recall at the fixture
    // operating point (16 perms, r=2, tau=0.8)? If yes at every SF, the
    // exact-pair oracle can gate ext_dedup_minhash_fast.
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = Tables.documents(spark, d)
      val fast = graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text",
        16, 2, 0.8, graft.operators.Dedup.XxHash)
      val exact = graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text", 0.8)
      println(s"PROBE $d FAST ${fast.count()} EXACT ${exact.count()} " +
        s"F-E ${fast.exceptAll(exact).count()} E-F ${exact.exceptAll(fast).count()}")
    }
    spark.stop()
  }
}
