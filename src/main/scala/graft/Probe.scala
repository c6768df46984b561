package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().withExtensions(new graft.plans.GraftExtensions)
      .master("local[32]").config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    import graft.operators.Dedup
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime()-t0)/1e9}%.3f"); r
    }
    for (round <- 1 to 2) {
      println(s"PROBE --- round $round")
      val docs = Tables.documents(spark, d)
      val edges = t("edges_distinct_count") { val e = Dedup.shingleEdges(docs, "doc_id", "text").persist(); e.count(); e }
      t("sig16") { Dedup.minhashSignatures(edges, 16, Dedup.DenseId).count() }
      t("sig16_xx") { Dedup.minhashSignatures(edges, 16, Dedup.XxHash).count() }
      t("full_minhash_dense") { Dedup.minhashLshPairs(docs, "doc_id", "text", 16, 2, 0.8, Dedup.DenseId).count() }
      t("full_minhash_xx") { Dedup.minhashLshPairs(docs, "doc_id", "text", 16, 2, 0.8, Dedup.XxHash).count() }
      t("jaccard") { Dedup.jaccardPairs(docs, "doc_id", "text", 0.5).count() }
      edges.unpersist()
    }
    spark.stop()
  }
}
